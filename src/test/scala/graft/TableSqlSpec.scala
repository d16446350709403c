package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.EngineSession
import graft.operators.TxTable
import graft.sql.TableSql

/** The SQL command surface: every statement shape drives the ACID table
  * end-to-end, SELECTs (incl. time travel) plan through spark.sql over
  * snapshot views, and the count(*) fast path is indistinguishable from
  * the scan. */
class TableSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = EngineSession.getOrCreate("graft-test")

  private def fresh(): (TableSql, String) =
    (TableSql(spark), Files.createTempDirectory("graft_tsql").toString)

  private def seedView(): Unit = {
    import spark.implicits._
    (1L to 100L).map(k => (k, s"v$k", k % 10))
      .toDF("k", "v", "grp").createOrReplaceTempView("tsql_src")
  }

  test("create / insert / select round-trip with time travel") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE t LOCATION '$dir/t' STATS KEY k AS " +
      "SELECT * FROM tsql_src WHERE k <= 50")
    q.exec("INSERT INTO t SELECT * FROM tsql_src WHERE k > 50")
    assert(q.exec("SELECT count(*) FROM t").as[Long].head() == 100L)
    // time travel pins the pre-insert snapshot
    assert(q.exec("SELECT max(k) AS m FROM t VERSION AS OF 0")
      .as[Long].head() == 50L)
    // a join of two versions of the SAME table resolves independent views
    val both = q.exec(
      "SELECT count(*) AS n FROM t a JOIN t VERSION AS OF 0 b ON a.k = b.k")
    assert(both.as[Long].head() == 50L)
  }

  test("merge (CoW + MoR), delete (CoW + MoR), describe history") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE m LOCATION '$dir/m' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    q.exec("MERGE INTO m USING (SELECT k, 'UP' AS v, grp FROM tsql_src " +
      "WHERE k <= 5) ON (k)")
    q.exec("MERGE INTO m USING (SELECT k, 'MOR' AS v, grp FROM tsql_src " +
      "WHERE k > 95) ON (k) MODE MOR")
    q.exec("DELETE FROM m WHERE grp = 0")
    q.exec("DELETE FROM m WHERE grp = 1 MODE MOR")
    val left = q.exec("SELECT k, v FROM m ORDER BY k")
      .as[(Long, String)].collect()
    assert(left.length == 80)
    // k = 1 fell to the grp-1 delete, so the surviving UP rows are 2..5
    assert(left.take(4).map(_._1).toSeq == Seq(2L, 3L, 4L, 5L))
    assert(left.take(4).forall(_._2 == "UP"))
    assert(left.takeRight(4).forall(_._2 == "MOR"))
    assert(!left.exists(r => r._1 % 10 == 0 || r._1 % 10 == 1))
    val hist = q.exec("DESCRIBE HISTORY m")
      .select("version", "op").as[(Long, String)].collect().toMap
    assert(hist == Map(0L -> "create", 1L -> "merge-cow", 2L -> "merge-mor",
      3L -> "delete-cow", 4L -> "delete-mor"))
  }

  test("optimize (plain + zorder), vacuum, restore") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE o LOCATION '$dir/o' STATS KEY k, grp AS " +
      "SELECT * FROM tsql_src")
    q.exec("MERGE INTO o USING (SELECT k, 'BAD' AS v, grp FROM tsql_src) " +
      "ON (k)")
    q.exec("RESTORE o TO VERSION 0")
    assert(q.exec("SELECT v FROM o WHERE k = 1").as[String].head() == "v1")
    q.exec("OPTIMIZE o ZORDER BY (k, grp) INTO 8 FILES")
    assert(TxTable.snapshot(q.rootOf("o")).files.size == 8)
    assert(q.exec("SELECT count(*) FROM o").as[Long].head() == 100L)
    val vac = q.exec("VACUUM o").select("files_deleted").as[Long].head()
    assert(vac >= 0L)
    q.exec("OPTIMIZE o INTO 2 FILES")
    assert(q.exec("SELECT count(*) FROM o").as[Long].head() == 100L)
    // 3-dim ZORDER routes through optimizeZN; content and history intact
    q.exec(s"CREATE TABLE o3 LOCATION '$dir/o3' STATS KEY k, grp, j AS " +
      "SELECT k, v, grp, k * 7 % 50 AS j FROM tsql_src")
    q.exec("OPTIMIZE o3 ZORDER BY (k, grp, j) INTO 16 FILES")
    assert(q.exec("SELECT count(*) FROM o3").as[Long].head() == 100L)
    val ops3 = q.exec("DESCRIBE HISTORY o3")
      .select("version", "op").as[(Long, String)].collect().toMap
    assert(ops3 == Map(0L -> "create", 1L -> "optimize-z"))
    // an undeclared axis refuses (no prunable metadata would be logged)
    val refused = intercept[IllegalArgumentException](
      q.exec("OPTIMIZE o3 ZORDER BY (k, grp, v)"))
    assert(refused.getMessage.contains("declared for stats"))
  }

  test("update: CoW and MoR set-expressions apply to the predicate's rows only") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE u LOCATION '$dir/u' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    q.exec("UPDATE u SET v = concat(v, '!') WHERE k <= 3")
    q.exec("UPDATE u SET v = 'M', grp = grp + 100 WHERE k = 10 MODE MOR")
    val got = q.exec("SELECT k, v, grp FROM u WHERE k <= 10 ORDER BY k")
      .as[(Long, String, Long)].collect().toSeq
    assert(got.take(3).map(_._2) == Seq("v1!", "v2!", "v3!"))
    assert(got(3) == ((4L, "v4", 4L))) // untouched row
    assert(got.last == ((10L, "M", 100L)))
    assert(q.exec("SELECT count(*) FROM u").as[Long].head() == 100L)
    val ops = q.exec("DESCRIBE HISTORY u").orderBy("version")
      .select("op").as[String].collect().toSeq
    assert(ops == Seq("create", "merge-cow", "merge-mor"))
  }

  test("count(*) fast path equals the scan, including under a live ledger") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE c LOCATION '$dir/c' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    q.exec("DELETE FROM c WHERE k <= 7 MODE MOR") // ledger live
    val fast = q.exec("SELECT count(*) FROM c").as[Long].head()
    val scan = TxTable.read(spark, q.rootOf("c")).count()
    assert(fast == 93L && fast == scan)
    // schema parity with the ordinary SQL path
    assert(q.exec("SELECT count(*) FROM c").columns.toSeq ==
      spark.sql("SELECT count(*) FROM tsql_src").columns.toSeq)
  }

  test("ALTER TABLE: rename + widen are metadata-only, versions own schemas") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE ta LOCATION '$dir/ta' STATS KEY k AS " +
      "SELECT k, v, CAST(grp AS INT) AS grp FROM tsql_src WHERE k <= 50")
    val files0 = TxTable.snapshot(s"$dir/ta").files.toSet
    val r1 = q.exec("ALTER TABLE ta RENAME COLUMN v TO label")
    assert(r1.select("op").head().getString(0) == "rename-column")
    val r2 = q.exec("ALTER TABLE ta ALTER COLUMN grp TYPE BIGINT")
    assert(r2.select("op").head().getString(0) == "widen-column")
    // both are metadata-only commits
    assert(TxTable.snapshot(s"$dir/ta").files.toSet == files0)
    // new shape usable immediately; old era reconciles under it
    q.exec("INSERT INTO ta SELECT k, v AS label, CAST(grp AS BIGINT) " +
      "AS grp FROM tsql_src WHERE k > 50")
    val head = q.exec("SELECT label, sum(grp) AS g FROM ta " +
      "GROUP BY label ORDER BY label LIMIT 1")
    assert(head.columns.toSeq == Seq("label", "g"))
    assert(q.exec("SELECT count(*) FROM ta").as[Long].head() == 100L)
    // time travel to v0 shows the ORIGINAL column name and int type
    val v0 = q.exec("SELECT * FROM ta VERSION AS OF 0 LIMIT 1")
    assert(v0.columns.contains("v") && !v0.columns.contains("label"))
    // widening the stats key (or unknown columns) refuses loudly
    intercept[Exception] {
      q.exec("ALTER TABLE ta RENAME COLUMN k TO key2")
    }
  }

  test("CREATE TABLE ... SHALLOW CLONE branches at zero copy through SQL") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE orig LOCATION '$dir/orig' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    val r = q.exec(s"CREATE TABLE expmt SHALLOW CLONE orig " +
      s"LOCATION '$dir/expmt'")
    assert(r.select("op").head().getString(0) == "clone")
    // branch diverges; original untouched
    q.exec("DELETE FROM expmt WHERE k <= 90")
    assert(q.exec("SELECT count(*) FROM expmt").as[Long].head() == 10L)
    assert(q.exec("SELECT count(*) FROM orig").as[Long].head() == 100L)
  }

  test("PUBLISH ... FROM adopts a branch's staged adds back through SQL (WAP)") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE base LOCATION '$dir/base' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    q.exec(s"CREATE TABLE stage SHALLOW CLONE base LOCATION '$dir/stage'")
    (101L to 120L).map(k => (k, s"v$k", k % 10))
      .toDF("k", "v", "grp").createOrReplaceTempView("tsql_new")
    q.exec("INSERT INTO stage SELECT * FROM tsql_new")
    // staged rows invisible to base until published
    assert(q.exec("SELECT count(*) FROM base").as[Long].head() == 100L)
    val r = q.exec("PUBLISH base FROM stage TAG 'wap-sql-1'")
    assert(r.select("op").head().getString(0) == "adopt")
    assert(q.exec("SELECT count(*) FROM base").as[Long].head() == 120L)
    // replay is a no-op commit
    val v0 = q.exec("SELECT count(*) FROM base").as[Long].head()
    q.exec("PUBLISH base FROM stage TAG 'wap-sql-1'")
    assert(q.exec("SELECT count(*) FROM base").as[Long].head() == v0)
  }

  test("SELECT predicates prune files from the log through the SQL surface") {
    import spark.implicits._
    import graft.sources.GraftFileIndex
    seedView()
    val (q, dir) = fresh()
    val root = s"$dir/pr"
    q.exec(s"CREATE TABLE pr LOCATION '$root' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    q.exec("OPTIMIZE pr INTO 4 FILES")
    GraftFileIndex.resetListing(root)
    assert(q.exec("SELECT count(*) AS n FROM pr WHERE k > 90")
      .as[Long].head() == 10L)
    val (total, kept) = GraftFileIndex.lastListing(root).get
    assert(total == 4 && kept <= 2,
      s"SQL predicate should prune from the log: listed $kept/$total")
    // and the metadata-aggregate rule reaches SQL text too
    val agg = q.exec("SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM pr")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("FileScan"),
      s"SQL count/min/max should fold from the log:\n$plan")
    assert(agg.as[(Long, Long, Long)].head() == ((100L, 1L, 100L)))
  }

  test("errors are loud: unknown table, bad syntax, delete without stats key") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    intercept[IllegalArgumentException](q.exec("INSERT INTO nope SELECT 1"))
    intercept[IllegalArgumentException](q.exec("FROBNICATE the table"))
    q.exec(s"CREATE TABLE nk LOCATION '$dir/nk' AS SELECT * FROM tsql_src")
    intercept[IllegalArgumentException](
      q.exec("DELETE FROM nk WHERE grp = 0"))
  }

  test("negative paths: malformed DDL, mismatched MERGE, bad RESTORE/EXPIRE refuse atomically") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE neg LOCATION '$dir/neg' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    val root = q.rootOf("neg")
    def version: Long = TxTable.snapshot(root).version
    val v0 = version

    // malformed DDL: CREATE without LOCATION never reaches the table layer
    intercept[IllegalArgumentException](
      q.exec("CREATE TABLE nl AS SELECT 1 AS k"))
    // evolution is widen-only: a narrowing ALTER refuses
    intercept[Exception](q.exec("ALTER TABLE neg ALTER COLUMN k TYPE int"))
    // rename onto an existing column / of a missing column
    intercept[Exception](q.exec("ALTER TABLE neg RENAME COLUMN v TO grp"))
    intercept[Exception](q.exec("ALTER TABLE neg RENAME COLUMN nope TO x"))
    // type-mismatched MERGE batch: the string column arrives as INT
    intercept[Exception](q.exec(
      "MERGE INTO neg USING (SELECT 1 AS k, 2 AS v, 3 AS grp) ON (k)"))
    intercept[Exception](q.exec(
      "MERGE INTO neg USING (SELECT 1 AS k, 2 AS v, 3 AS grp) ON (k) MODE MOR"))
    // MERGE on a key the table does not have
    intercept[Exception](q.exec(
      "MERGE INTO neg USING (SELECT 1 AS k, 'x' AS v, 0 AS grp) ON (zz)"))
    // UPDATE with a malformed SET expression / unknown predicate column
    intercept[Exception](
      q.exec("UPDATE neg SET v = not_a_fn(v) WHERE k = 1"))
    intercept[Exception](q.exec("UPDATE neg SET v = 'x' WHERE zz = 1"))
    // RESTORE to a version that never existed
    intercept[Exception](q.exec("RESTORE neg TO VERSION 99"))
    // EXPIRE HISTORY with an unparseable timestamp
    intercept[Exception](q.exec("EXPIRE HISTORY neg BEFORE 'not-a-time'"))

    // every refusal above left the log untouched — and the table still
    // takes valid commits afterwards (no latched state)
    assert(version == v0, "a refused statement committed something")
    q.exec("INSERT INTO neg SELECT k + 1000 AS k, v, grp FROM tsql_src LIMIT 1")
    assert(version == v0 + 1)
    assert(q.exec("SELECT count(*) FROM neg").as[Long].head() == 101L)
  }

  test("INSERT OVERWRITE: atomic range backfill through SQL; scope violations refused") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE bw LOCATION '$dir/bw' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    q.exec("INSERT OVERWRITE bw WHERE k BETWEEN 20 AND 29 " +
      "SELECT k, 'fixed' AS v, grp FROM tsql_src WHERE k BETWEEN 20 AND 29")
    val vs = q.exec("SELECT k, v FROM bw ORDER BY k")
      .as[(Long, String)].collect()
    assert(vs.count(_._2 == "fixed") == 10)
    assert(vs.filter(r => r._1 < 20 || r._1 > 29).forall(_._2 != "fixed"))
    assert(vs.length == 100)
    // a batch that writes beyond its declared range is refused atomically
    val vBefore = TxTable.snapshot(q.rootOf("bw")).version
    intercept[IllegalArgumentException](
      q.exec("INSERT OVERWRITE bw WHERE k BETWEEN 20 AND 29 " +
        "SELECT k, 'leak' AS v, grp FROM tsql_src WHERE k BETWEEN 20 AND 35"))
    assert(TxTable.snapshot(q.rootOf("bw")).version == vBefore)
    // the range column must be the stats key
    intercept[IllegalArgumentException](
      q.exec("INSERT OVERWRITE bw WHERE grp BETWEEN 0 AND 1 " +
        "SELECT * FROM tsql_src WHERE grp BETWEEN 0 AND 1"))
  }

  test("OPTIMIZE PACK and EXPIRE HISTORY drive the maintenance policies via SQL") {
    import spark.implicits._
    seedView()
    val (q, dir) = fresh()
    q.exec(s"CREATE TABLE mp LOCATION '$dir/mp' STATS KEY k AS " +
      "SELECT * FROM tsql_src")
    (0 until 4).foreach(e => q.exec(
      s"INSERT INTO mp SELECT k + ${1000 * (e + 1)} AS k, v, grp FROM tsql_src"))
    val before = q.exec("SELECT count(*) FROM mp").as[Long].head()
    val packed = q.exec("OPTIMIZE mp PACK UNDER 10000000 BYTES INTO 1 FILES")
      .collect().head
    assert(packed.getAs[String]("op") == "bin-pack" &&
      !packed.getAs[Boolean]("skipped"))
    assert(TxTable.snapshot(q.rootOf("mp")).files.size == 1)
    assert(q.exec("SELECT count(*) FROM mp").as[Long].head() == before)
    // nothing small left: the policy reports a no-op, not an error
    assert(q.exec("OPTIMIZE mp PACK UNDER 10000000 BYTES")
      .collect().head.getAs[String]("op") == "bin-pack-noop")
    // wall-clock retention through SQL: build enough history for a
    // checkpoint, then expire before the head commit's stamp
    (0 until 7).foreach(e => q.exec(
      s"INSERT INTO mp SELECT k + ${10000 * (e + 1)} AS k, v, grp FROM tsql_src"))
    val root = q.rootOf("mp")
    val head = TxTable.snapshot(root).version
    val ts = TxTable.commitTs(root, head).get
    val r = q.exec(s"EXPIRE HISTORY mp BEFORE $ts").collect().head
    assert(r.getAs[String]("op") == "expire-history" &&
      r.getAs[Long]("commits_archived") > 0L)
    // current state unaffected; an expired version fails loudly
    assert(q.exec("SELECT count(*) FROM mp").as[Long].head() ==
      before + 7 * 100L)
    intercept[Exception](TxTable.snapshot(root, 1L))
  }
}
