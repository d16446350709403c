package graft.sql

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

import graft.operators.TxTable

/** A Delta-style SQL command surface over [[TxTable]] — the last mile
  * that lets a SQL-first user drive the ACID table without touching the
  * Scala API: DDL/DML statements parse here and delegate to the
  * transactional operator layer; SELECT statements rewrite table
  * references (with optional `VERSION AS OF` time travel) to snapshot
  * views and run through the ordinary `spark.sql` path, so the full
  * parser → analyzer → Catalyst pipeline plans them.
  *
  * Grammar (one statement per call; `;` optional; keywords
  * case-insensitive; table names `[A-Za-z_][A-Za-z0-9_]*`):
  *
  *   CREATE TABLE t LOCATION '<root>' [STATS KEY k1[, k2...]] AS <select>
  *   CREATE TABLE b SHALLOW CLONE t LOCATION '<root>'  -- zero-copy branch
  *   PUBLISH t FROM b [TAG '<tag>']   -- write-audit-publish: adopt the
  *                                    -- branch's post-clone adds back
  *                                    -- (zero-copy, audited, idempotent)
  *   INSERT INTO t <select>                        -- append commit
  *   MERGE INTO t USING (<select>) ON (k1[, ...]) [MODE MOR]
  *   UPDATE t SET c1 = e1[, c2 = e2] WHERE <pred> [MODE MOR]
  *   DELETE FROM t WHERE <predicate> [MODE MOR]    -- keys via stats key
  *   ALTER TABLE t RENAME COLUMN a TO b            -- metadata-only commit
  *   ALTER TABLE t ALTER COLUMN c TYPE BIGINT      -- widen, metadata-only
  *   INSERT OVERWRITE t WHERE k BETWEEN <lo> AND <hi> <select>
  *                                  -- atomic range backfill (replaceWhere)
  *   OPTIMIZE t [ZORDER BY (x, y)] [INTO <n> FILES]
  *   OPTIMIZE t PACK UNDER <bytes> BYTES [INTO <n> FILES]
  *                                  -- size-aware auto-compaction (binPack)
  *   EXPIRE HISTORY t BEFORE <millis>|'<iso-instant>'  -- wall-clock retention
  *   VACUUM t                                      -- orphaned files
  *   RESTORE t TO VERSION <v>
  *   DESCRIBE HISTORY t
  *   SELECT ... FROM/JOIN t [VERSION AS OF <v>
  *                          |TIMESTAMP AS OF <millis>|'<iso-instant>'] ...
  *
  * `SELECT count(*) FROM t` (exactly that shape) is served from
  * [[TxTable.metaAggregate]] — the commit log's row counts — with zero
  * data I/O when no merge-on-read ledger is live; the result is
  * identical to the scan by [[TxTable.metaAggregate]]'s contract
  * (spec-pinned). Every DML statement returns a one-row DataFrame
  * (table, op, version, skipped) so scripts can chain on the outcome.
  *
  * Scale posture: parsing is driver-side string work on statements, the
  * data path is exactly the operator layer's (same commits, same
  * pruning, same snapshot isolation); a SELECT's rewritten views are
  * per-(table, version) snapshot reads, so concurrent writers never
  * shift a running query's file list. Non-goals, stated: this is a
  * COMMAND surface, not a dialect — nested statements, DML subqueries,
  * and quoted identifiers are out of scope (the operator API covers
  * them); table names inside string literals of a SELECT would be
  * rewritten too, so don't name tables after data values.
  */
final class TableSql(spark: SparkSession) {

  private val tables = TrieMap.empty[String, String] // lower(name) -> root

  /** Attach an existing TxTable root under a SQL name. */
  def register(name: String, root: String): Unit = {
    require(TableSql.ident.matches(name), s"invalid table name '$name'")
    tables(name.toLowerCase) = root
  }

  def rootOf(name: String): String =
    tables.getOrElse(name.toLowerCase,
      throw new IllegalArgumentException(s"unknown table '$name' — " +
        s"registered: ${tables.keys.toSeq.sorted.mkString(", ")}"))

  private def result(table: String, op: String,
                     r: TxTable.CommitResult): DataFrame =
    spark.range(1).select(lit(table).as("table"), lit(op).as("op"),
      lit(r.version).as("version"), lit(r.skipped).as("skipped"))

  def exec(sql: String): DataFrame = {
    val s = sql.trim.stripSuffix(";").trim
    s match {
      case TableSql.createRe(name, root, statsKeys, select) =>
        val cols = Option(statsKeys).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val df = spark.sql(select)
        val r = TxTable.create(df, root, cols.headOption, None, cols.drop(1))
        register(name, root)
        result(name, "create", r)

      case TableSql.cloneRe(name, srcName, root) =>
        val r = TxTable.cloneShallow(rootOf(srcName), root)
        register(name, root)
        result(name, "clone", r)

      case TableSql.adoptRe(name, branchName, tag) =>
        result(name, "adopt",
          TxTable.adoptFrom(spark, rootOf(name), rootOf(branchName),
            Option(tag)))

      case TableSql.insertOverwriteRe(name, k, lo, hi, select) =>
        val root = rootOf(name)
        val sk = TxTable.snapshot(root).statsKey
        require(sk.contains(k),
          s"INSERT OVERWRITE range column '$k' must be the stats key " +
            s"(${sk.getOrElse("-")})")
        result(name, "replace-where",
          TxTable.replaceWhere(spark, root, lo.toLong, hi.toLong,
            spark.sql(select)))

      case TableSql.insertRe(name, select) =>
        result(name, "append",
          TxTable.append(spark, rootOf(name), spark.sql(select)))

      case TableSql.mergeRe(name, select, keys, mor) =>
        val root = rootOf(name)
        val ks = keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val changes = spark.sql(select)
        val r =
          if (mor != null) TxTable.mergeMorKeys(spark, root, changes, ks)
          else {
            // CoW file selection wants the stats key when it's a merge key
            val sel = TxTable.snapshot(root).statsKey
              .filter(ks.contains).getOrElse(ks.head)
            TxTable.mergeCow(spark, root, changes, sel, mergeKeys = ks)
          }
        result(name, if (mor != null) "merge-mor" else "merge-cow", r)

      case TableSql.updateRe(name, sets, pred, mor) =>
        val root = rootOf(name)
        val key = TxTable.snapshot(root).statsKey.getOrElse(
          throw new IllegalArgumentException(
            s"UPDATE needs a stats key on '$name' (the row identity)"))
        val changed = TableSql.splitAssignments(sets)
          .foldLeft(TxTable.read(spark, root).where(pred)) {
            case (df, (c, e)) =>
              df.withColumn(c, org.apache.spark.sql.functions.expr(e))
          }
        // the changed rows re-enter as an upsert on the stats key: MoR
        // commits them in O(changed rows); CoW rewrites the touched files
        val r =
          if (mor != null) TxTable.mergeMorKeys(spark, root, changed, Seq(key))
          else TxTable.mergeCow(spark, root, changed, key)
        result(name, if (mor != null) "update-mor" else "update-cow", r)

      case TableSql.deleteRe(name, pred, mor) =>
        val root = rootOf(name)
        val key = TxTable.snapshot(root).statsKey.getOrElse(
          throw new IllegalArgumentException(
            s"DELETE needs a stats key on '$name' (the delete identity)"))
        val doomed = TxTable.read(spark, root).where(pred)
          .select(col(key)).distinct()
        val r =
          if (mor != null) TxTable.deleteMor(spark, root, doomed, key)
          else TxTable.deleteCow(spark, root, doomed, key)
        result(name, if (mor != null) "delete-mor" else "delete-cow", r)

      case TableSql.optimizeRe(name, zcols, n) =>
        val root = rootOf(name)
        val files = Option(n).map(_.toInt)
        val r =
          if (zcols != null) {
            val dims = zcols.split(",").map(_.trim).toSeq
            // 2 axes keep the 16-bit ladder interleave (and its oracle
            // parity); 3+ route through the n-dim chain
            if (dims.size == 2)
              TxTable.optimizeZ(spark, root, dims(0), dims(1),
                targetFiles = files.getOrElse(16))
            else
              TxTable.optimizeZN(spark, root, dims,
                targetFiles = files.getOrElse(16))
          } else TxTable.optimize(spark, root, files.getOrElse(4))
        result(name, if (zcols != null) "optimize-z" else "optimize", r)

      case TableSql.alterRenameRe(name, from, to) =>
        result(name, "rename-column",
          TxTable.renameColumn(spark, rootOf(name), from, to))

      case TableSql.alterTypeRe(name, c, tpe) =>
        result(name, "widen-column",
          TxTable.widenColumn(spark, rootOf(name), c, tpe.toLowerCase))

      case TableSql.packRe(name, bytes, n) =>
        val root = rootOf(name)
        TxTable.binPack(spark, root, bytes.toLong,
          Option(n).map(_.toInt).getOrElse(1)) match {
          case Some(r) => result(name, "bin-pack", r)
          case None => result(name, "bin-pack-noop",
            TxTable.CommitResult(TxTable.snapshot(root).version, 1,
              skipped = true))
        }

      case TableSql.expireRe(name, ms, iso) =>
        val millis =
          if (ms != null) ms.toLong
          else java.time.Instant.parse(iso).toEpochMilli
        val (dropped, archived) =
          TxTable.expireOlderThan(rootOf(name), millis)
        spark.range(1).select(lit(name).as("table"),
          lit("expire-history").as("op"),
          lit(dropped).as("files_deleted"),
          lit(archived).as("commits_archived"))

      case TableSql.vacuumRe(name) =>
        val n = TxTable.vacuumOrphans(rootOf(name))
        spark.range(1).select(lit(name).as("table"),
          lit("vacuum").as("op"), lit(n).as("files_deleted"))

      case TableSql.restoreRe(name, v) =>
        result(name, "restore",
          TxTable.restore(spark, rootOf(name), v.toLong))

      case TableSql.historyRe(name) =>
        import spark.implicits._
        TxTable.history(rootOf(name))
          .map { case (v, op, a, rm, dl, tag, ts) =>
            (v, op, a, rm, dl, tag.orNull, ts) }
          .toDF("version", "op", "n_adds", "n_removes", "n_ledger_adds",
            "tag", "ts")

      case TableSql.countStarRe(name) =>
        // metadata fast path: identical to the scan per metaAggregate's
        // contract; keep Spark's column name so callers can't tell
        val root = rootOf(name)
        val cnt = TxTable.snapshot(root).statsKey match {
          case Some(k) => TxTable.metaAggregate(spark, root, k).count
          case None => TxTable.read(spark, root).count() // no stats: scan
        }
        spark.range(1).select(lit(cnt).as("count(1)"))

      case sel if TableSql.selectRe.matches(sel) =>
        spark.sql(rewriteSelect(sel))

      case other =>
        throw new IllegalArgumentException(
          s"unrecognized statement: ${other.linesIterator.next()} …")
    }
  }

  /** Replace each registered-table reference (with optional `VERSION AS
    * OF n`) by a snapshot temp view pinned to that version. The view
    * takes the PLANNER-INTEGRATED relation whenever the snapshot is
    * eligible ([[graft.sources.GraftSource.read]]), so a Table-SQL
    * SELECT's predicates prune files from the log and the metadata-
    * aggregate rule can fold count/min/max — falling back to the exact
    * merge-on-read resolution otherwise, same rows either way. */
  private def rewriteSelect(sel: String): String = {
    if (tables.isEmpty) return sel
    val names = tables.keys.map(java.util.regex.Pattern.quote).mkString("|")
    val ref = ("(?i)\\b(" + names + ")\\b" +
      "(\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)" +
      "|\\s+TIMESTAMP\\s+AS\\s+OF\\s+(?:(\\d+)|'([^']+)'))?").r
    ref.replaceAllIn(sel, m => {
      val name = m.group(1).toLowerCase
      val ver = (Option(m.group(3)), Option(m.group(4)), Option(m.group(5))) match {
        case (Some(v), _, _) => v.toLong
        case (_, Some(ms), _) =>
          TxTable.versionAsOfTimestamp(rootOf(name), ms.toLong)
        case (_, _, Some(iso)) =>
          // quoted form: an ISO-8601 instant, e.g. '2026-08-14T12:00:00Z'
          TxTable.versionAsOfTimestamp(rootOf(name),
            java.time.Instant.parse(iso).toEpochMilli)
        case _ => Long.MaxValue
      }
      val view = s"graft_sql_${name}_" +
        (if (ver == Long.MaxValue) "head" else s"v$ver")
      graft.sources.GraftSource.read(spark, rootOf(name), ver)
        .createOrReplaceTempView(view)
      view
    })
  }
}

object TableSql {
  def apply(spark: SparkSession): TableSql = new TableSql(spark)

  private val ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  private val createRe =
    ("(?is)^CREATE\\s+TABLE\\s+(\\w+)\\s+LOCATION\\s+'([^']+)'" +
      "(?:\\s+STATS\\s+KEY\\s+([\\w\\s,]+?))?\\s+AS\\s+(SELECT\\b.+)$").r
  private val cloneRe =
    ("(?is)^CREATE\\s+TABLE\\s+(\\w+)\\s+SHALLOW\\s+CLONE\\s+(\\w+)" +
      "\\s+LOCATION\\s+'([^']+)'$").r
  private val adoptRe =
    "(?is)^PUBLISH\\s+(\\w+)\\s+FROM\\s+(\\w+)(?:\\s+TAG\\s+'([^']+)')?$".r
  private val insertRe =
    "(?is)^INSERT\\s+INTO\\s+(\\w+)\\s+(SELECT\\b.+)$".r
  private val mergeRe =
    ("(?is)^MERGE\\s+INTO\\s+(\\w+)\\s+USING\\s+\\((.+)\\)\\s+" +
      "ON\\s+\\(([\\w\\s,]+)\\)(\\s+MODE\\s+MOR)?$").r
  private val deleteRe =
    "(?is)^DELETE\\s+FROM\\s+(\\w+)\\s+WHERE\\s+(.+?)(\\s+MODE\\s+MOR)?$".r
  private val updateRe =
    ("(?is)^UPDATE\\s+(\\w+)\\s+SET\\s+(.+?)\\s+WHERE\\s+(.+?)" +
      "(\\s+MODE\\s+MOR)?$").r

  /** Split `a = e1, b = e2` on TOP-LEVEL commas only (commas inside
    * parentheses belong to function-call arguments in the expression). */
  private[sql] def splitAssignments(sets: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var start = 0
    sets.zipWithIndex.foreach {
      case ('(', _) => depth += 1
      case (')', _) => depth -= 1
      case (',', i) if depth == 0 => parts += sets.substring(start, i); start = i + 1
      case _ => ()
    }
    parts += sets.substring(start)
    parts.toSeq.map { a =>
      val eq = a.indexOf('=')
      require(eq > 0, s"malformed SET assignment: '$a'")
      (a.take(eq).trim, a.drop(eq + 1).trim)
    }
  }
  private val optimizeRe =
    ("(?is)^OPTIMIZE\\s+(\\w+)" +
      "(?:\\s+ZORDER\\s+BY\\s+\\((\\w+(?:\\s*,\\s*\\w+)+)\\))?" +
      "(?:\\s+INTO\\s+(\\d+)\\s+FILES)?$").r
  private val alterRenameRe =
    ("(?is)^ALTER\\s+TABLE\\s+(\\w+)\\s+RENAME\\s+COLUMN\\s+" +
      "(\\w+)\\s+TO\\s+(\\w+)$").r
  private val alterTypeRe =
    ("(?is)^ALTER\\s+TABLE\\s+(\\w+)\\s+ALTER\\s+COLUMN\\s+" +
      "(\\w+)\\s+TYPE\\s+(\\w+)$").r
  private val insertOverwriteRe =
    ("(?is)^INSERT\\s+OVERWRITE\\s+(\\w+)\\s+WHERE\\s+(\\w+)\\s+BETWEEN\\s+" +
      "(-?\\d+)\\s+AND\\s+(-?\\d+)\\s+((?:SELECT|WITH)\\b.*)$").r
  private val packRe =
    ("(?is)^OPTIMIZE\\s+(\\w+)\\s+PACK\\s+UNDER\\s+(\\d+)\\s+BYTES" +
      "(?:\\s+INTO\\s+(\\d+)\\s+FILES)?$").r
  private val expireRe =
    ("(?is)^EXPIRE\\s+HISTORY\\s+(\\w+)\\s+BEFORE\\s+" +
      "(?:(\\d+)|'([^']+)')$").r
  private val vacuumRe = "(?is)^VACUUM\\s+(\\w+)$".r
  private val restoreRe =
    "(?is)^RESTORE\\s+(\\w+)\\s+TO\\s+VERSION\\s+(\\d+)$".r
  private val historyRe = "(?is)^DESCRIBE\\s+HISTORY\\s+(\\w+)$".r
  private val countStarRe =
    "(?is)^SELECT\\s+COUNT\\s*\\(\\s*\\*\\s*\\)\\s+FROM\\s+(\\w+)$".r
  private val selectRe = "(?is)^(?:SELECT|WITH)\\b.*$".r
}
