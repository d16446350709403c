package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded within-bucket pair generation — the HOT-BUCKET armor for every
  * blocked candidate join in the dedup family (MinHash-LSH band buckets,
  * prefix-filter token buckets, SemDeDup k-means cells).
  *
  * The naive blocked self-join `x.join(y, bucket && x.id < y.id)` emits
  * O(k²) rows from ONE join key when a bucket holds k members — on a real
  * web corpus a viral boilerplate cluster (10⁴–10⁶ near-identical pages)
  * lands k² pairs on a single task: a straggler-or-OOM no executor count
  * fixes (AQE splits a skewed partition, but a sort-merge group for a
  * single key is still consumed per-split-of-one-side only).
  *
  * Fix = [[TriangleCount]]'s high-degree vertex splitting applied to
  * buckets: rank each bucket's members (by the pair-ordering id), cut them
  * into ⌈k/cap⌉ chunks, and re-key the join by (bucket, leftChunk,
  * rightChunk) — the lower side replicates to its chunk pairs upward, the
  * higher side downward, so every join key emits ≤ cap² rows and a
  * mega-bucket's k² pairs spread over (k/cap)² keys. Replication overhead
  * is Σ k·⌈k/cap⌉ ≈ (Σ k²)/cap — 1/cap of the pair output itself, strictly
  * cheaper than the rows it load-balances. The emitted pair SET is exactly
  * the naive join's (chunk pairs partition the idx₁<idx₂ pairs), so every
  * consumer's result — and its DuckDB oracle — is unchanged.
  *
  * When no bucket exceeds `cap` (the common case), nc = 1 everywhere and
  * the plan degenerates to the plain bucket join with replication factor 1
  * — the armor costs one extra window pass over the bucket rows.
  */
object BucketJoin {

  /** All unordered pairs {x, y} of distinct rows sharing `bucketCols`,
    * output once each with `a_` = the lower-`idCol` side and `b_` = the
    * higher (every input column appears twice, prefixed). `idCol` must be
    * unique within a bucket (blocked dedup inputs are — one row per
    * (bucket, member)).
    *
    * @param cap max members per chunk: any single join key emits ≤ cap²
    *            rows, and a k-member bucket's work spreads over ⌈k/cap⌉²
    *            keys. */
  def selfPairs(df: DataFrame, bucketCols: Seq[String], idCol: String,
                cap: Int = 256): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val byB = Window.partitionBy(bucketCols.map(col): _*)
    // rank + bucket size from ONE window pass (same partitioning, same
    // exchange+sort — the unbounded count rides the row_number's Window
    // exec), so chunk counts need no extra aggregate+join
    val oi = df
      .withColumn("__idx",
        row_number().over(byB.orderBy(col(idCol))).cast("long") - 1)
      .withColumn("__nc",
        ((count(lit(1)).over(byB) - 1) / cap + 1).cast("int"))
      .withColumn("__c", (col("__idx") / cap).cast("int"))
    def side(p: String) = df.columns.foldLeft(oi)((d, c) =>
      d.withColumnRenamed(c, s"$p$c"))
    // chunks are id-ordered, so the lower-id side of any pair sits in the
    // ≤ chunk: the low role replicates upward (c..nc-1), the high role
    // downward (0..c); each unordered pair matches at exactly one
    // (bucket, cl, cr) key, with the id residual breaking same-chunk ties
    val lo = side("a_")
      .select((df.columns.map(c => col(s"a_$c")) :+
        col("__c").as("__cl") :+
        explode(sequence(col("__c"), col("__nc") - 1)).as("__cr")): _*)
    val hi = side("b_")
      .select((df.columns.map(c => col(s"b_$c")) :+
        explode(sequence(lit(0), col("__c"))).as("__cl") :+
        col("__c").as("__cr")): _*)
    val on = (bucketCols.map(c => col(s"a_$c") === col(s"b_$c")) ++
      Seq(lo("__cl") === hi("__cl"), lo("__cr") === hi("__cr")))
      .reduce(_ && _)
    lo.join(hi, on)
      .where(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(df.columns.map(c => col(s"a_$c")) ++
        df.columns.map(c => col(s"b_$c")): _*)
  }

  /** All pairs (x with `leftPred`, y without) sharing `bucketCols`, hot
    * buckets chunked on BOTH sides (each side's rows replicate across the
    * other side's chunk count, so any single join key emits ≲ cap² rows).
    * Output columns prefixed `a_` (left side) / `b_` (right side). The
    * pair SET equals the naive filtered bucket join — asymmetric
    * consumers (incremental dedup's new×corpus probe) keep their oracle
    * unchanged.
    *
    * Unlike [[selfPairs]] (whose triangular emission needs id-ORDERED
    * chunks), bipartite emission is exact under ANY chunk assignment —
    * every cross pair matches at exactly one (bucket, cl, cr) key — so
    * chunks are assigned by id hash and ONE window pass over the unsplit
    * input computes both sides' per-bucket chunk counts (no per-side
    * count aggregates or count-attach joins). */
  def bipartitePairs(df: DataFrame, leftPred: org.apache.spark.sql.Column,
                     bucketCols: Seq[String], idCol: String,
                     cap: Int = 256): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val byB = Window.partitionBy(bucketCols.map(col): _*)
    // ⌈k/cap⌉ chunks, floored at 1: Spark's `/` is double division, so
    // k = 0 would otherwise cast to 0 chunks and the OPPOSITE side's
    // explode(sequence(0, -1)) — Spark sequences descend — would
    // replicate every row of a one-sided bucket 2x into [0, -1] keys
    // that can never match (exact output, double shuffle volume)
    def nChunks(k: org.apache.spark.sql.Column) =
      greatest(((k - 1) / cap + 1).cast("int"), lit(1))
    val ann = df
      .withColumn("__isl", leftPred)
      .withColumn("__nl", nChunks(
        sum(when(col("__isl"), 1L).otherwise(0L)).over(byB)))
      .withColumn("__nr", nChunks(
        sum(when(col("__isl"), 0L).otherwise(1L)).over(byB)))
    val l = ann.filter(col("__isl"))
      .select((df.columns.map(c => col(c).as(s"a_$c")) :+
        pmod(xxhash64(col(idCol)), col("__nl")).cast("int").as("__cl") :+
        explode(sequence(lit(0), col("__nr") - 1)).as("__cr")): _*)
    val r = ann.filter(!col("__isl"))
      .select((df.columns.map(c => col(c).as(s"b_$c")) :+
        explode(sequence(lit(0), col("__nl") - 1)).as("__cl") :+
        pmod(xxhash64(col(idCol)), col("__nr")).cast("int").as("__cr")): _*)
    val on = (bucketCols.map(c => col(s"a_$c") === col(s"b_$c")) ++
      Seq(l("__cl") === r("__cl"), l("__cr") === r("__cr")))
      .reduce(_ && _)
    l.join(r, on)
      .select(df.columns.map(c => col(s"a_$c")) ++
        df.columns.map(c => col(s"b_$c")): _*)
  }

  /** STAR edges per bucket — the O(k) alternative for consumers that only
    * need CONNECTIVITY (dedup clusters), not every pair: each bucket
    * member links to the bucket's minimum id. A k-member bucket emits
    * k − 1 edges instead of k(k−1)/2 pairs, and the union over buckets has
    * the same connected components as the all-pairs candidate graph
    * (within one bucket the star spans exactly the members the clique
    * did). Output: (a, b) with a = bucket min, b = member, a < b,
    * distinct across buckets. */
  def starEdges(bands: DataFrame, bucketCols: Seq[String],
                idCol: String): DataFrame = {
    val byB = Window.partitionBy(bucketCols.map(col): _*)
    bands
      .withColumn("__m", min(col(idCol)).over(byB))
      .where(col(idCol) =!= col("__m"))
      .select(col("__m").as("a"), col(idCol).as("b"))
      .distinct()
  }
}
