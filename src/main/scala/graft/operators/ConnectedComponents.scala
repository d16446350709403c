package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the clustering
  * step a dedup pipeline needs between "near-dup PAIRS" (Q-llm-02's output)
  * and a keep/drop decision: duplicates are transitive, so pairs must be
  * folded into components and one representative kept per component.
  *
  * Algorithm: every node starts labeled with its own id; each round, a node
  * takes the min of its label and its neighbors' labels, then jumps the
  * result one pointer hop (label-of-label); converged when no label
  * changes. The jump squares propagation, so rounds needed =
  * O(log diameter), not O(diameter). Each round is one shuffled
  * equi-join + groupBy plus one label self-join — the same
  * driver-coordinated iterative shape GraphX/Pregel use, every step fully
  * distributed; nothing driver-side but the convergence counter.
  *
  * Deterministic: min-label is order-independent, so the result is a pure
  * function of the edge set (no RNG, no partition sensitivity) — which is
  * what lets a DuckDB recursive-closure oracle hash-match it.
  */
object ConnectedComponents {

  /** @param nodes one column `id`; @param edges columns `a`, `b`
    * (undirected, any orientation). Returns (id, label) with label = min
    * node id of the component.
    *
    * Adaptive strategy (the broadcast-join principle applied to graphs):
    * a dedup pipeline's candidate-pair graph is TINY relative to its
    * corpus — LSH emits pairs, not rows, so even a 100 TB corpus yields
    * edge sets in the millions. When the materialized edge count is at
    * most `driverMaxEdges`, the components are solved with a driver-side
    * union-find in one pass — no per-round shuffles at all. Driver-heap
    * budget, honestly: collected Row objects plus the LongMap-backed
    * union-find cost on the order of 100-200 BYTES per edge transiently
    * (boxed fields, map overhead — not the 16 raw bytes of two longs), so
    * the 1M default budgets ~100-200 MB of transient heap against a
    * driver sized in GBs. Larger graphs fall through to the distributed
    * min-label loop below.
    *
    * Iteration hygiene for the distributed path (what makes a DataFrame
    * loop scale): every round is `localCheckpoint`ed so the logical plan
    * stays constant-size instead of growing per iteration (planning time
    * would otherwise dominate); propagation runs only over edge-CONNECTED
    * nodes (isolated nodes are their own singleton component by
    * definition and are unioned back at the end); and convergence
    * piggybacks on the same action that materializes the round (one job
    * per iteration, not three). */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25,
      driverMaxEdges: Long = 1000000L): DataFrame = {
    val sc = nodes.sparkSession.sparkContext
    // localCheckpoint blocks are only released by GC-driven cleanup, so an
    // iterative loop must free each round's intermediates itself — on a
    // long-running cluster app the accumulation (2 checkpoints x rounds x
    // runs) evicts useful cache and eventually spills every round.
    // Checkpoint via this helper to learn which persisted RDDs back each
    // DataFrame, and unpersist a round's intermediates as soon as the next
    // round's state is materialized.
    def ckpt(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint(true)
      val fresh = sc.getPersistentRDDs.collect {
        case (id, rdd) if !before(id) => rdd
      }.toSeq
      (out, fresh)
    }
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    val t0 = System.nanoTime()
    // materialize the edge list ONCE before symmetrizing: unioning two
    // selects of `edges` would otherwise evaluate the whole upstream edge
    // pipeline (e.g. the MinHash-LSH candidate+verify DAG) once per union
    // branch
    val (e1, e1Rdds) = ckpt(edges.select(col("a").as("x"), col("b").as("y")))
    if (e1.count() <= driverMaxEdges) {
      val out = driverPath(nodes, e1)
      e1Rdds.foreach(_.unpersist(blocking = false))
      if (debug) System.err.println(
        f"[cc] driver union-find: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      return out
    }
    val (sym, _) = ckpt(
      e1.unionAll(e1.select(col("y").as("x"), col("x").as("y"))))
    e1Rdds.foreach(_.unpersist(blocking = false))
    if (debug) System.err.println(
      f"[cc] sym ckpt: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    val t1 = System.nanoTime()
    val connected = sym.select(col("x").as("id")).distinct()
    var (labels, labelRdds) = ckpt(connected.select(col("id"), col("id").as("label")))
    if (debug) System.err.println(
      f"[cc] labels ckpt: ${(System.nanoTime() - t1) / 1e9}%.2fs")
    // convergence watches the label SUM: labels are ids and every move is
    // strictly downward (min over self+neighbors, then a downward jump),
    // so the decimal sum is strictly decreasing until the fixpoint and
    // equality between rounds ⟺ no label changed. That turns the old
    // "count rows where next < label" pass — which forced carrying the
    // previous label through both per-round joins — into a cheap
    // aggregate over the already-materialized round, and lets the message
    // pass drop a whole shuffle join (below).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(org.apache.spark.sql.functions.sum(
        col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val tRound = System.nanoTime()
      // ONE aggregation computes each node's candidate label: min over
      // its own label and all neighbor labels — the self-label rides the
      // same shuffle as the neighbor messages, where the previous form
      // aggregated neighbor minima and then JOINED labels back on id
      // (a second shuffle join per round). Every connected node emits a
      // self-message, so the aggregate is total over connected nodes.
      val (mid, midRdds) = ckpt(
        sym.join(labels.select(col("id").as("y"), col("label").as("ly")), "y")
          .select(col("x"), col("ly"))
          .unionAll(labels.select(col("id").as("x"), col("label").as("ly")))
          .groupBy("x").agg(min("ly").as("mid"))
          .select(col("x").as("id"), col("mid")))
      // pointer jumping: follow the label one hop (label := label-of-label).
      // Squaring the propagation each round turns the round count from
      // O(diameter) into O(log diameter) — a 1M-node chain converges in
      // ~20 rounds instead of 1M. Every label value is itself a connected
      // node id, so the self-join is total. `mid` is materialized above:
      // the two join sides shuffle on different keys, so an
      // un-checkpointed frame would run the whole message pass twice.
      val (step, stepRdds) = ckpt(
        mid
          .join(mid.select(col("id").as("mid"), col("mid").as("jumped")),
            Seq("mid"))
          .select(col("id"), least(col("mid"), col("jumped")).as("label")))
      val curSum = labelSum(step)
      changed = curSum.compareTo(prevSum) != 0
      prevSum = curSum
      // step is materialized: the previous labels and this round's
      // messages are dead weight from here on
      (labelRdds ++ midRdds).foreach(_.unpersist(blocking = false))
      labels = step
      labelRdds = stepRdds
      i += 1
      if (debug) System.err.println(
        f"[cc] round $i: ${(System.nanoTime() - tRound) / 1e9}%.2fs sum=$curSum")
    }
    // a silent non-converged result would diverge from the transitive
    // closure with no error — fail loudly instead
    if (changed)
      throw new IllegalStateException(
        s"connected components did not converge after $maxIter rounds " +
          "(label sum still decreasing); raise maxIter")
    val isolated = nodes.join(connected, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    labels.unionAll(isolated)
  }

  /** Small-graph fast path: one collect, classic union-find with the max
    * root always attached under the min root — so every root IS its
    * component's minimum id and the result is the same pure function of
    * the edge set as the distributed loop (equality pinned per-seed in
    * GraphLayoutPropertySpec). */
  private def driverPath(nodes: DataFrame, e1: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // getAs[Number]: edge ids may be int-typed (the distributed loop is
    // type-agnostic, so this path must not be the one that throws)
    val pairs = e1.collect().map(r =>
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    // LongMap: open-addressed primitive-long keys — no per-key boxing
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(v: Long): Long = {
      var r = v
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = v // path compression
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labels = parent.keys.toSeq.sorted.map(v => (v, find(v)))
    val connectedIds = labels.map(_._1).toDF("id")
    val isolated = nodes.join(broadcast(connectedIds), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    labels.toDF("id", "label").unionAll(isolated)
  }
}
