package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout.
  *
  * At 100 TB the scan cost of a 2-D box query is decided by LAYOUT, not
  * compute: parquet keeps per-row-group min/max stats, and a pushed filter
  * skips any row group whose stats exclude it. A table sorted by one key
  * serves only that key's predicates; sorted by the interleaved bits of
  * two keys, row groups become axis-aligned tiles in (x, y) space and
  * predicates on EITHER dimension skip most of the file (measured in
  * ZOrderSpec: a second-dimension predicate scans 3.75x fewer rows than
  * the single-key layout — 1600 vs 6000 — and the gap widens with more
  * row groups per file).
  *
  * The z-value is pure bit algebra over Spark built-ins (shifts/and/or) —
  * whole-stage-codegen'd, no UDF, and replicated exactly by the DuckDB
  * oracle (Q-scan-08). 16 bits per dimension; callers bucket wider
  * domains down (`& 0xFFFF`) first.
  */
object ZOrderLayout {

  /** (shift, mask) ladder of the classic bit-spread: x -> put each of the
    * low 16 bits of x at even positions of a 32-bit word. */
  private val steps = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  private def spread(c: Column): Column =
    steps.foldLeft(c.cast("bigint").bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** Morton interleave of two 16-bit dimensions: z = spread(x) | spread(y)<<1. */
  def zvalue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** The identical algebra as SQL text (for the DuckDB oracle). */
  private def spreadSql(e: String): String =
    steps.foldLeft(s"(($e) & 65535)") { case (x, (s, m)) =>
      s"((($x) | (($x) << $s)) & $m)"
    }

  def zvalueSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"

  /** Run `body` with the parquet row-group target set to `bytes`.
    * (`parquet.block.size` is a Hadoop conf, not a DataFrameWriter option —
    * the writer option would be silently ignored.) */
  def withBlockSize[T](df: DataFrame, bytes: Int)(body: => T): T = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val prev = Option(conf.get("parquet.block.size"))
    conf.setInt("parquet.block.size", bytes)
    try body
    finally prev.fold(conf.unset("parquet.block.size"))(conf.set("parquet.block.size", _))
  }

  /** Write `df` clustered by z(x, y): each dimension is first normalized
    * by bucketing (raw interleave wastes curve locality when one
    * dimension's domain is much wider than the other's — measured 2.1x
    * raw vs 3.75x bucketed row-group skipping on the spec fixture), then
    * the interleaved z-value drives a range partition + within-partition
    * sort, so each output file and row group covers a compact (x, y)
    * tile and its min/max stats are tight on both dimensions (see
    * [[clusterByZ]] for the bucketing); `numFiles`/`blockSize` size files
    * and row groups to the target (~1 GB files / 128 MB groups in
    * production, small here). */
  def writeClustered(df: DataFrame, x: Column, y: Column,
                     path: String, numFiles: Int = 1,
                     blockSize: Int = 128 * 1024 * 1024): Unit =
    withBlockSize(df, blockSize) {
      clusterByZ(df, x, y, numFiles)
        .write.mode("overwrite")
        .parquet(path)
    }

  /** N-dimensional Morton interleave: bit b of dimension d lands at
    * position b·n + d. 8 bits per dimension — matching the 0..255
    * quantile-bucket domain [[clusterByZN]] feeds it — so up to 7
    * dimensions stay inside a positive bigint. A per-bit OR chain of
    * constant shifts (~8·n ops, all whole-stage-codegen'd); the 2-dim
    * ladder form stays for the hot [[zvalue]] path and its Q-scan-08
    * oracle parity. */
  def zvalueN(dims: Seq[Column]): Column = {
    require(dims.size >= 2 && dims.size <= 7,
      s"zvalueN takes 2..7 dimensions, got ${dims.size}")
    val n = dims.size
    dims.zipWithIndex.map { case (c, d) =>
      val x = c.cast("bigint").bitwiseAND(lit(0xFFL))
      (0 until 8).map(b =>
        shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), b * n + d))
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** The identical N-dim algebra as SQL text (for a DuckDB oracle). */
  def zvalueNSql(dims: Seq[String]): String = {
    val n = dims.size
    dims.zipWithIndex.flatMap { case (e, d) =>
      (0 until 8).map(b =>
        s"((((($e) & 255) >> $b) & 1) << ${b * n + d})")
    }.mkString("(", " | ", ")")
  }

  /** The clustering rearrangement alone — `df` re-partitioned and sorted
    * so each of the `numFiles` output partitions covers a compact (x, y)
    * tile, for callers that own the write (e.g. a TxTable OPTIMIZE
    * commit, which stages files through its own transactional path).
    *
    * Dimensions normalize by EQUAL-FREQUENCY (quantile) bucketing, not
    * equal width: on a skewed column (docs per source, long-tail value
    * distributions) equal-width packs ~all rows into a few buckets and
    * the curve degenerates to a single-key sort on the other dimension —
    * quantile buckets keep every tile ~equal-row on BOTH axes no matter
    * the distribution (the Delta OPTIMIZE ZORDER design: per-column
    * range-partition ids). Cost: ONE shared approxQuantile pass for both
    * columns (Greenwald-Khanna sketch, distributed); the per-row bucket
    * is a codegen'd fold over the 255-cut literal array — no UDF. On
    * identical uniform data the cuts coincide with equal width, so
    * nothing is lost where equal width was already right. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
                 numFiles: Int): DataFrame = {
    val dims = df
      .withColumn("__zx", x.cast("double"))
      .withColumn("__zy", y.cast("double"))
    val probs = (1 to 255).map(_ / 256.0).toArray
    val cuts = dims.stat.approxQuantile(
      Array("__zx", "__zy"), probs, 0.001)
    // materialize the bucket ranks behind their OWN projection before
    // interleaving: the spread/interleave algebra references each
    // dimension several times, and inlining the bucket `when` tree at
    // every reference builds a projection too large for whole-stage
    // codegen (it falls back to interpreted rows — measured 10× slower
    // at the 5 M-row scale). CollapseProject keeps the split (the
    // referenced expression is non-cheap and multiply-used), so each
    // row pays ONE bucket evaluation per dimension.
    val bucketed = dims
      .withColumn("__zxb", bucket(col("__zx"), cuts(0)))
      .withColumn("__zyb", bucket(col("__zy"), cuts(1)))
    val z = zvalue(col("__zxb"), col("__zyb"))
    bucketed.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__zx", "__zy", "__zxb", "__zyb")
  }

  // rank = how many quantile cuts lie strictly below the value (ties
  // collapse into one rank — an unsplittable heavy value can't be tiled
  // finer than itself), then RESCALED to the full 0..255 range: a
  // low-cardinality dimension (few distinct cuts) would otherwise only
  // populate the low bits and the interleave would stop alternating —
  // its high bits constant, the curve degenerates to a sort on the other
  // dimensions' coarse bits
  private def bucket(c: Column, cs: Array[Double]): Column = {
    val d = cs.distinct.sorted
    if (d.isEmpty) lit(0L)
    else {
      // rank = |{i : c > d(i)}| via a BALANCED `when` TREE (depth
      // ⌈log2 |d|⌉ ≈ 8): each row pays ~8 codegen'd comparisons. The
      // previous form — aggregate() over a 255-element literal array —
      // evaluated an INTERPRETED lambda per element per row per
      // dimension (measured: a 3-dim optimize over 600 k rows spent
      // ~40 s in it; the tree form is ~30×). NULL input: every
      // comparison is null → the otherwise branch walks to rank 0,
      // same as the old per-element fold.
      def go(lo: Int, hi: Int): Column =
        if (lo >= hi) lit(lo.toLong)
        else {
          val mid = (lo + hi) / 2
          when(c > d(mid), go(mid + 1, hi)).otherwise(go(lo, mid))
        }
      go(0, d.length) * 255L / lit(d.length.toLong)
    }
  }

  /** [[clusterByZ]] on ANY number of dimensions (2..7): one shared
    * approxQuantile pass buckets every column to the equal-frequency
    * 0..255 domain, [[zvalueN]] interleaves bit b of dim d to position
    * b·n + d, and the range partition + within-partition sort tiles the
    * n-space — each output file covers a compact n-dimensional cell, so
    * its per-file [min, max] stats are tight on EVERY clustered axis and
    * a range/point predicate on any one of them prunes most files. The
    * Delta `OPTIMIZE ... ZORDER BY (c1, ..., cn)` semantic; the trade is
    * the usual curve dilution — each added dimension halves the per-axis
    * resolution of a fixed file budget, so cluster the 2-4 axes queries
    * actually filter on, not every column. */
  def clusterByZN(df: DataFrame, cols: Seq[Column],
                  numFiles: Int): DataFrame = {
    require(cols.size >= 2 && cols.size <= 7,
      s"clusterByZN takes 2..7 dimensions, got ${cols.size}")
    val names = cols.indices.map(i => s"__zd$i")
    val dims = cols.zip(names).foldLeft(df) {
      case (d, (c, nm)) => d.withColumn(nm, c.cast("double"))
    }
    val probs = (1 to 255).map(_ / 256.0).toArray
    val cuts = dims.stat.approxQuantile(names.toArray, probs, 0.001)
    // bucket ranks materialize behind their own projection — see
    // [[clusterByZ]]: zvalueN references each dimension 8× (once per
    // bit), and inlined bucket trees blow past the codegen method
    // budget (measured: the interpreted fallback turned a 3-dim
    // 5 M-row optimize super-linear)
    val bnames = names.map(_ + "r")
    val bucketed = names.zip(cuts.toSeq).zip(bnames).foldLeft(dims) {
      case (d, ((nm, cs), bn)) => d.withColumn(bn, bucket(col(nm), cs))
    }
    val z = zvalueN(bnames.map(col))
    // range-partition on the ALIGNED curve block first, z second: plain
    // equal-row splits on z put file boundaries at arbitrary curve
    // offsets, so a file straddles two aligned blocks and its per-axis
    // [min, max] span doubles (measured: a 3-dim quarter-range read kept
    // 35/64 files instead of ~20). With the block id leading, a split
    // landing mid-block divides that block into files that each stay
    // INSIDE it — per-file stats stay tight on every axis.
    val blockShift = {
      var b = 0
      while ((1 << (b + 1)) <= numFiles) b += 1
      (8 * cols.size - b).max(0)
    }
    bucketed.withColumn("__z", z)
      .withColumn("__zb", shiftright(col("__z"), blockShift))
      .repartitionByRange(numFiles, col("__zb"), col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__zb")
      .drop(names: _*)
      .drop(bnames: _*)
  }
}
