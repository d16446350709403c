package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.{shingleRows, words}

/** Corpus-mining operators: collocation discovery and (next) trained
  * tree models. These extend the LLM-pipeline surface (SURVEY §2B
  * "text analysis") with the phrase-detection pass word2vec-style
  * pipelines run before tokenizer/vocab decisions.
  *
  * Reference scope note: the reference (249 LoC Flink skeleton,
  * `WeatherProcessingJobPlan.java:9-15` empty) declares no mining
  * surface; these operators follow the BASELINE.json north star
  * ("beyond the reference's own surface, add the LLM-data-pipeline
  * operators").
  */
object Mining {

  val queries: Map[String, Q] = Map(
    // ---- Q-llm-45: PMI collocations (phrase mining). Adjacent word
    // pairs scored by a PMI-monotone integer: score_ppm =
    // floor(c_ab * N * 1e6 / (c_a * c_b)) — pure int64 algebra, so both
    // engines agree bit-for-bit with no log/float anywhere (the
    // SemDeDup rational-threshold discipline).
    //
    // Scale shape: bigrams are built INSIDE each doc's token array
    // (zip_with over two slices — a narrow map, no shuffle, no
    // posexplode+window); the corpus crosses the wire once as
    // (bigram, n) partial aggs and once as (word, n) partial aggs —
    // both vocabulary-scale after map-side combine. The c_a/c_b attach
    // joins are vocab × vocab equi-joins on the >=5-support candidate
    // set, and the final top-25 is TakeOrderedAndProject. Raw tokens
    // never cross an exchange.
    //
    // int64 headroom: c_ab * N * 1e6 needs c_ab * N < 9.2e12 — holds
    // through sf10 (N ~ 1e8, c_ab ~ 1e4); a 100 TB corpus runs the
    // identical plan with the three factors cast to DECIMAL(38,0).
    "Q-llm-45" -> { (s, d) =>
      val ws = words(col("text"))
      val n = size(ws)
      val bigrams = when(n >= 2,
        zip_with(slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
          (a, b) => concat(a, lit(" "), b))).otherwise(array())
      val docs = Tables.documents(s, d)
      val bc = docs.select(explode(bigrams).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      // N = total bigram occurrences; computed from the aggregated
      // counts (vocab-scale input), not a second corpus pass.
      val nBg = bc.agg(sum(col("c_ab"))).collect()(0).getLong(0)
      val wc = docs.select(explode(ws).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val cand = bc.filter(col("c_ab") >= 5)
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
      cand
        .join(wc.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(wc.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
        .select(col("w1"), col("w2"),
          col("c_ab").cast("bigint").as("c_ab"),
          col("c_a").cast("bigint").as("c_a"),
          col("c_b").cast("bigint").as("c_b"),
          expr(s"(c_ab * ${nBg}L * 1000000L) div (c_a * c_b)")
            .cast("bigint").as("score_ppm"))
        .orderBy(col("score_ppm").desc, col("w1"), col("w2"))
        .limit(25)
    },

    // ---- Q-llm-46: TRAINED depth-2 decision tree (model #4 after
    // NB/LR/k-means — the tree family): quality gating by recursive 0-1
    // loss split search over 16-level quantized document statistics.
    // The split criterion is INTEGER misclassification count
    // (min(posL,negL) + min(posR,negR)), argmin total-ordered by
    // (err, f, t) — no Gini fractions, no float comparisons, so the
    // learned tree and every prediction hash-match the DuckDB replay of
    // the identical search.
    //
    // Scale shape: the treeAggregate discipline — the corpus crosses
    // the wire only as |F|x16x2-bounded (f, q, y) count partial aggs
    // (one pass for the root, one sided pass for the leaves); the
    // candidate-split argmin runs driver-side on <=96 collected rows,
    // exactly like LR's gradient scalars. Features/labels never fan
    // out; final scoring is a narrow map with the tree as literals.
    "Q-llm-46" -> { (s, d) =>
      val ws = split(col("text"), " ")
      val stopF = "size(filter(split(text, ' '), " +
        "w -> array_contains(array('the','a','of','to','and'), w)))"
      val feats = Tables.documents(s, d).select(col("doc_id"),
          Portable.r(length(col("text")).cast("double") / size(ws), 6).as("x1"),
          Portable.r(expr(stopF).cast("double") / size(ws), 6).as("x2"),
          Portable.r(size(array_distinct(ws)).cast("double") / size(ws), 6).as("x3"))
        .select(col("doc_id"),
          least(lit(15), floor(col("x1"))).cast("int").as("q1"),
          least(lit(15), floor(col("x2") * lit(50.0))).cast("int").as("q2"),
          least(lit(15), floor(col("x3") * lit(16.0))).cast("int").as("q3"),
          when(col("x1") <= 6.0 && col("x2") >= 0.04, 1).otherwise(0).as("y"))
        .persist()
      def qcol(f: Int): Column = col(s"q$f")
      val longForm = feats.select(col("y"), explode(array(
          struct(lit(1).as("f"), col("q1").as("q")),
          struct(lit(2).as("f"), col("q2").as("q")),
          struct(lit(3).as("f"), col("q3").as("q")))).as("fq"))
        .select(col("fq.f"), col("fq.q"), col("y"))
      // (f, q) -> (pos, neg), collected: bounded by |F| x 16 levels x 2
      def collectCounts(df: DataFrame, keys: Seq[String]): Seq[(Seq[Int], Long, Long)] =
        df.groupBy(keys.map(col): _*)
          .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
          .collect().toSeq
          .map(r => (keys.indices.map(r.getInt), r.getLong(keys.size), r.getLong(keys.size + 1)))
      // argmin over (f, t) of integer 0-1 loss, total-ordered by (err, f, t)
      def bestSplit(cs: Seq[(Int, Int, Long, Long)]): (Int, Int, Long, Long, Long, Long) =
        (for { f <- 1 to 3; t <- 0 to 14 } yield {
          val (l, rgt) = cs.filter(_._1 == f).partition(_._2 <= t)
          val (posL, negL) = (l.map(_._3).sum, l.map(_._4).sum)
          val (posR, negR) = (rgt.map(_._3).sum, rgt.map(_._4).sum)
          val err = math.min(posL, negL) + math.min(posR, negR)
          ((err, f, t), (f, t, posL, negL, posR, negR))
        }).minBy(_._1)._2
      val root = bestSplit(collectCounts(longForm, Seq("f", "q"))
        .map { case (k, p, n) => (k(0), k(1), p, n) })
      val sided = feats.withColumn("side",
        when(qcol(root._1) <= root._2, 1).otherwise(0))
      val sidedLong = sided.select(col("side"), col("y"), explode(array(
          struct(lit(1).as("f"), col("q1").as("q")),
          struct(lit(2).as("f"), col("q2").as("q")),
          struct(lit(3).as("f"), col("q3").as("q")))).as("fq"))
        .select(col("side"), col("fq.f"), col("fq.q"), col("y"))
      val sideCounts = collectCounts(sidedLong, Seq("side", "f", "q"))
      // per side: best leaf split + majority label per leaf (pos >= neg -> 1)
      val leaves = Seq(1, 0).map { sd =>
        val cs = sideCounts.collect { case (k, p, n) if k(0) == sd => (k(1), k(2), p, n) }
        val b = bestSplit(cs)
        (sd, b._1, b._2,
          if (b._3 >= b._4) 1 else 0,  // left-leaf majority
          if (b._5 >= b._6) 1 else 0)  // right-leaf majority
      }
      val leafExpr = leaves.map { case (sd, f, t, _, _) =>
        (sd, when(qcol(f) <= t, 1).otherwise(0))
      }
      val predExpr = leaves.map { case (sd, f, t, pl, pr) =>
        (sd, when(qcol(f) <= t, lit(pl)).otherwise(lit(pr)))
      }
      def bySide(m: Seq[(Int, Column)]): Column =
        when(col("side") === 1, m.find(_._1 == 1).get._2)
          .otherwise(m.find(_._1 == 0).get._2)
      sided.select(col("doc_id"),
          col("y").cast("bigint").as("y"),
          col("side").cast("bigint").as("side"),
          bySide(leafExpr).cast("bigint").as("leaf"),
          bySide(predExpr).cast("bigint").as("pred"))
        .withColumn("correct", col("pred") === col("y"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-47: importance resampling (the DSIR-shaped selection
    // step): each doc accepted with probability proportional to an
    // importance weight, but the coin flip is a PURE KEY-HASH function
    // — accept iff (md5(doc_id) as int) mod 1e6 < w_ppm — so selection
    // is reproducible across runs, engines, and repartitioning (the
    // Q-scan-06 discipline, weight-dependent instead of fixed-rate).
    // The weight here is a target-affinity proxy in exact integer ppm
    // (stopword mass vs token count, saturated at 1); a production DSIR
    // run swaps in its target/source likelihood-ratio ppm and keeps the
    // identical plan. Scale shape: scan -> narrow map -> filter, fully
    // codegen, no shuffle but the output sort; nothing global, nothing
    // random.
    "Q-llm-47" -> { (s, d) =>
      val ws = words(col("text"))
      val nStop = size(org.apache.spark.sql.functions.filter(ws, w =>
        w.isin("the", "a", "of", "to", "and")))
      val wPpm = least(lit(1000000L),
        expr("4000000L * n_stop div n_tok"))
      val hPpm = expr("conv(substring(md5(cast(doc_id AS string)), 1, 13), 16, 10)")
        .cast("bigint") % 1000000L
      Tables.documents(s, d)
        .select(col("doc_id"), size(ws).cast("bigint").as("n_tok"),
          nStop.cast("bigint").as("n_stop"))
        .select(col("doc_id"), col("n_tok"), col("n_stop"),
          wPpm.cast("bigint").as("w_ppm"), hPpm.as("h_ppm"))
        .filter(col("h_ppm") < col("w_ppm"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-49: LATE-INTERACTION retrieval (the ColBERT scoring
    // shape): documents are SETS of vectors (multi-vector docs derived
    // by grouping the embedding table on vec_id % 100), queries are
    // 2-vector sets, and the score is MaxSim — for each query vector
    // take the max cosine over the doc's vectors, then sum over query
    // vectors. Plan shape: query-vector set broadcast (the brute-force
    // discipline), one codegen cosine per (qvec, docvec) pair, then the
    // max and sum collapse as PARTIAL AGGS keyed by (doc, qvec) and
    // (doc) — the pair scores never cross an exchange unreduced. Exact:
    // cosine is the sequential-double algebra, max is order-free, the
    // final sum is the 2-element addition both engines do identically.
    "Q-llm-49" -> { (s, d) =>
      graft.functions.CosineSim.register(s)
      val emb = Tables.embeddings(s, d)
        .select((col("vec_id") % 100).as("doc"), col("vec_id"), col("embedding"))
      val qv = emb.filter(col("vec_id") < 2)
        .select(col("vec_id").as("qvec"), col("embedding").as("q_emb"))
      val pair = emb.crossJoin(broadcast(qv))
        .withColumn("sim", expr("cosine_sim(q_emb, embedding)"))
      val perQvec = pair.groupBy("doc", "qvec")
        .agg(max(col("sim")).as("maxsim"))
      val w = Window.orderBy(col("score").desc, col("doc"))
      perQvec.groupBy("doc")
        .agg(sum(Portable.r(col("maxsim"), 9)).as("score"))
        .select(col("doc").cast("bigint").as("doc"),
          Portable.r(col("score"), 6).as("score"))
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 15)
        .orderBy("rk")
    },

    // ---- Q-llm-50: LEAVE-ONE-OUT target encoding — the
    // feature-engineering op for categorical columns (here: source →
    // smoothed quality-label mean), in the leakage-safe LOO form real
    // training pipelines use (a doc's own label never feeds its own
    // feature). The smoothed estimate ((s−y)·gn + m·gs) / (gn·(n−1+m))
    // is formed as an INTEGER ratio — one identical double division +
    // portable round at the end, so both engines agree bit-for-bit.
    // Plan: one |cat|-bounded partial agg + one global agg, both
    // broadcast back against the doc stream; no doc-side shuffle but
    // the output sort.
    "Q-llm-50" -> { (s, d) =>
      val m = 20
      val ws = split(col("text"), " ")
      val stopF = "size(filter(split(text, ' '), " +
        "w -> array_contains(array('the','a','of','to','and'), w)))"
      val base = Tables.documents(s, d).select(col("doc_id"), col("source"),
          Portable.r(length(col("text")).cast("double") / size(ws), 6).as("x1"),
          Portable.r(expr(stopF).cast("double") / size(ws), 6).as("x2"))
        .withColumn("y",
          when(col("x1") <= 6.0 && col("x2") >= 0.04, 1L).otherwise(0L))
      val cat = base.groupBy("source")
        .agg(sum(col("y")).as("cs"), count(lit(1)).as("cn"))
      val glob = base.agg(sum(col("y")).as("gs"), count(lit(1)).as("gn"))
      base.join(broadcast(cat), Seq("source"))
        .crossJoin(broadcast(glob))
        .select(col("doc_id"), col("source"), col("y").cast("bigint").as("y"),
          Portable.r(
            ((col("cs") - col("y")) * col("gn") + lit(m.toLong) * col("gs"))
              .cast("double") /
            (col("gn") * (col("cn") - 1 + m)).cast("double"), 6).as("enc"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-51: THE PIPELINE — the whole curation chain a training
    // run executes, composed as ONE declarative plan: clean → quality
    // gate (Gopher rules) → exact dedup (md5 group, min-id winner) →
    // decontaminate (5-gram overlap vs the held-out benchmark split) →
    // deterministic shuffle-shard. This is the capstone composability
    // claim: every stage is an operator proven elsewhere (Q-llm-18/34/
    // 01/30/19), and Catalyst fuses the chain — the narrow stages
    // (clean, gate, token stats, shard keys) collapse into the scans;
    // the only exchanges are the dedup hash, the shingle distinct, the
    // broadcast-bench hit join, and the final shard window. At 100 TB
    // every stage keeps its individual scale shape because composition
    // adds no new shuffle.
    "Q-llm-51" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val cleaned = docs.select(col("doc_id"), lower(trim(col("text"))).as("tc"))
      val ws = split(col("tc"), " ")
      val sumLen = aggregate(transform(ws, w => length(w)),
        lit(0), (acc, x) => acc + x)
      val meanLen = sumLen.cast("double") / size(ws)
      val nStop = size(array_intersect(array_distinct(ws),
        array(lit("the"), lit("a"), lit("of"), lit("to"), lit("and"))))
      val gated = cleaned
        .filter(col("doc_id") % 97 =!= 0) // benchmark split never trains
        .filter(nStop >= 2 && meanLen >= 3.0 && meanLen <= 10.0)
      val wD = Window.partitionBy(md5(col("tc"))).orderBy("doc_id")
      val deduped = gated.withColumn("rk", row_number().over(wD))
        .filter(col("rk") === 1).drop("rk")
      val bench = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"), lower(trim(col("text"))).as("tc"))
      val benchSh = shingleRows(bench, "doc_id", "tc", 5)
        .select(col("sh").as("bsh")).distinct()
      val hits = shingleRows(deduped, "doc_id", "tc", 5).distinct()
        .join(broadcast(benchSh), col("sh") === col("bsh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      val survivors = deduped.join(hits, Seq("doc_id"), "left")
        .filter(coalesce(col("n_hits"), lit(0L)) < 3)
      val keyed = survivors.select(col("doc_id"),
          size(split(col("tc"), " ")).cast("bigint").as("n_tokens"),
          md5(concat(lit("pipe42:"), col("doc_id"))).as("k"))
        .withColumn("shard", substring(col("k"), 1, 1))
      val wS = Window.partitionBy("shard").orderBy("k")
      keyed.withColumn("pos", row_number().over(wS).cast("bigint"))
        .select(col("shard"), col("pos"), col("doc_id"), col("n_tokens"))
        .orderBy("shard", "pos")
    },

    // ---- Q-llm-52: EMBEDDING-CENTROID drift — the vector-space member
    // of the drift family (Q-qual-12 histograms, Q-str-22 online): per
    // label, the centroid of period-A vectors (even vec_id) vs period-B
    // (odd), shift = ||c_A − c_B||. Detects representation drift no
    // scalar histogram can see. Scale shape: vectors collapse to
    // (label, period, dim) decimal partial sums — the ONLY exchange is
    // labels × 2 × dim cells; raw vectors never shuffle. Exactness:
    // per-dim means are decimal-exact then floor-rounded, squared
    // deltas re-enter the decimal sum (order-free), one sqrt at the
    // end — bit-identical cross-engine.
    "Q-llm-52" -> { (s, d) =>
      val cells = Tables.embeddings(s, d)
        .select(col("label"), (col("vec_id") % 2).as("period"),
          posexplode(col("embedding")))
        .groupBy("label", "period", "pos")
        .agg(Portable.r(Portable.dsum(col("col").cast("double")) /
          count(lit(1)), 9).as("m"),
          count(lit(1)).as("n"))
      val a = cells.filter(col("period") === 0)
        .select(col("label"), col("pos"), col("m").as("ma"), col("n").as("na"))
      val b = cells.filter(col("period") === 1)
        .select(col("label"), col("pos"), col("m").as("mb"), col("n").as("nb"))
      a.join(b, Seq("label", "pos"))
        .groupBy("label")
        .agg(max(col("na")).cast("bigint").as("n_a"),
          max(col("nb")).cast("bigint").as("n_b"),
          Portable.r(sqrt(Portable.dsum(Portable.r(
            (col("ma") - col("mb")) * (col("ma") - col("mb")), 9))), 6)
            .as("shift"))
        .select(col("label").cast("bigint").as("label"),
          col("n_a"), col("n_b"), col("shift"))
        .orderBy("label")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-llm-45" ->
      """WITH docs AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
         bgs AS (SELECT unnest(list_transform(range(2, len(ws) + 1),
                   i -> ws[i-1] || ' ' || ws[i])) AS bg FROM docs),
         bc AS (SELECT bg, count(*) AS c_ab FROM bgs GROUP BY bg),
         n AS (SELECT sum(c_ab) AS n_bg FROM bc),
         wc AS (SELECT w, count(*) AS c
                FROM (SELECT unnest(ws) AS w FROM docs) GROUP BY w),
         cand AS (SELECT bg, c_ab, str_split(bg, ' ')[1] AS w1,
                         str_split(bg, ' ')[2] AS w2
                  FROM bc WHERE c_ab >= 5)
         SELECT cand.w1, cand.w2,
                c_ab::BIGINT AS c_ab, a.c::BIGINT AS c_a, b.c::BIGINT AS c_b,
                ((c_ab * (SELECT n_bg FROM n) * 1000000) // (a.c * b.c))::BIGINT
                  AS score_ppm
         FROM cand JOIN wc a ON cand.w1 = a.w JOIN wc b ON cand.w2 = b.w
         ORDER BY score_ppm DESC, cand.w1, cand.w2 LIMIT 25""",

    "Q-llm-46" -> {
      // carried-columns discipline (the Q-llm-42 lesson): the learned
      // root/leaf splits ride CROSS JOINs as columns — a scalar subquery
      // per reference would re-bind (and re-scan) the whole upstream chain
      val stop = "len(list_filter(string_split(text, ' '), " +
        "w -> list_contains(['the','a','of','to','and'], w)))"
      s"""WITH f0 AS (
            SELECT doc_id,
                   ${Portable.rSql("strlen(text)::DOUBLE / len(string_split(text, ' '))", 6)} AS x1,
                   ${Portable.rSql(s"$stop::DOUBLE / len(string_split(text, ' '))", 6)} AS x2,
                   ${Portable.rSql("len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' '))", 6)} AS x3
            FROM documents),
          feats AS (
            SELECT doc_id,
                   least(15, floor(x1))::INT AS q1,
                   least(15, floor(x2 * 50.0))::INT AS q2,
                   least(15, floor(x3 * 16.0))::INT AS q3,
                   CASE WHEN x1 <= 6.0 AND x2 >= 0.04 THEN 1 ELSE 0 END AS y
            FROM f0),
          longf AS (
            SELECT 1 AS f, q1 AS q, y FROM feats
            UNION ALL SELECT 2, q2, y FROM feats
            UNION ALL SELECT 3, q3, y FROM feats),
          c0 AS (SELECT f, q, sum(y) AS pos, count(*) - sum(y) AS neg
                 FROM longf GROUP BY f, q),
          th AS (SELECT unnest(range(0, 15)) AS t),
          e0 AS (
            SELECT c.f, th.t,
                   sum(CASE WHEN c.q <= th.t THEN c.pos ELSE 0 END) AS posL,
                   sum(CASE WHEN c.q <= th.t THEN c.neg ELSE 0 END) AS negL,
                   sum(CASE WHEN c.q > th.t THEN c.pos ELSE 0 END) AS posR,
                   sum(CASE WHEN c.q > th.t THEN c.neg ELSE 0 END) AS negR
            FROM c0 c CROSS JOIN th GROUP BY c.f, th.t),
          root AS (
            SELECT f AS rf, t AS rt FROM e0
            ORDER BY least(posL, negL) + least(posR, negR), f, t LIMIT 1),
          sided AS (
            SELECT feats.*, r.rf, r.rt,
                   CASE WHEN (CASE r.rf WHEN 1 THEN q1 WHEN 2 THEN q2
                              ELSE q3 END) <= r.rt THEN 1 ELSE 0 END AS side
            FROM feats CROSS JOIN root r),
          longs AS (
            SELECT side, 1 AS f, q1 AS q, y FROM sided
            UNION ALL SELECT side, 2, q2, y FROM sided
            UNION ALL SELECT side, 3, q3, y FROM sided),
          c1 AS (SELECT side, f, q, sum(y) AS pos, count(*) - sum(y) AS neg
                 FROM longs GROUP BY side, f, q),
          e1 AS (
            SELECT c.side, c.f, th.t,
                   sum(CASE WHEN c.q <= th.t THEN c.pos ELSE 0 END) AS posL,
                   sum(CASE WHEN c.q <= th.t THEN c.neg ELSE 0 END) AS negL,
                   sum(CASE WHEN c.q > th.t THEN c.pos ELSE 0 END) AS posR,
                   sum(CASE WHEN c.q > th.t THEN c.neg ELSE 0 END) AS negR
            FROM c1 c CROSS JOIN th GROUP BY c.side, c.f, th.t),
          b AS (
            SELECT side, f, t,
                   CASE WHEN posL >= negL THEN 1 ELSE 0 END AS predL,
                   CASE WHEN posR >= negR THEN 1 ELSE 0 END AS predR,
                   row_number() OVER (PARTITION BY side
                     ORDER BY least(posL, negL) + least(posR, negR), f, t) AS rk
            FROM e1),
          model AS (SELECT side, f, t, predL, predR FROM b WHERE rk = 1)
          SELECT s.doc_id, s.y::BIGINT AS y, s.side::BIGINT AS side,
                 (CASE WHEN (CASE m.f WHEN 1 THEN s.q1 WHEN 2 THEN s.q2
                             ELSE s.q3 END) <= m.t THEN 1 ELSE 0 END)::BIGINT AS leaf,
                 (CASE WHEN (CASE m.f WHEN 1 THEN s.q1 WHEN 2 THEN s.q2
                             ELSE s.q3 END) <= m.t
                       THEN m.predL ELSE m.predR END)::BIGINT AS pred,
                 (CASE WHEN (CASE m.f WHEN 1 THEN s.q1 WHEN 2 THEN s.q2
                             ELSE s.q3 END) <= m.t
                       THEN m.predL ELSE m.predR END) = s.y AS correct
          FROM sided s JOIN model m ON s.side = m.side
          ORDER BY s.doc_id"""
    },

    "Q-llm-47" ->
      """WITH t AS (
           SELECT doc_id,
                  len(string_split(text, ' '))::BIGINT AS n_tok,
                  len(list_filter(string_split(text, ' '),
                    w -> list_contains(['the','a','of','to','and'], w)))::BIGINT AS n_stop
           FROM documents),
         w AS (
           SELECT doc_id, n_tok, n_stop,
                  least(1000000, (4000000 * n_stop) // n_tok)::BIGINT AS w_ppm,
                  (('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT % 1000000)::BIGINT AS h_ppm
           FROM t)
         SELECT doc_id, n_tok, n_stop, w_ppm, h_ppm
         FROM w WHERE h_ppm < w_ppm ORDER BY doc_id""",

    "Q-llm-49" -> {
      s"""WITH emb AS (
            SELECT vec_id % 100 AS doc, vec_id, embedding FROM embeddings),
          qv AS (
            SELECT vec_id AS qvec, embedding AS q_emb
            FROM embeddings WHERE vec_id < 2),
          pair AS (
            SELECT e.doc, e.vec_id, q.qvec,
                   ${Portable.cosSql("q.q_emb", "e.embedding")} AS sim
            FROM emb e CROSS JOIN qv q),
          m AS (SELECT doc, qvec, max(sim) AS maxsim
                FROM pair GROUP BY doc, qvec),
          sc AS (SELECT doc,
                        sum(${Portable.rSql("maxsim", 9)}) AS score
                 FROM m GROUP BY doc)
          SELECT doc::BIGINT AS doc, ${Portable.rSql("score", 6)} AS score, rk
          FROM (SELECT doc, score,
                       (row_number() OVER (ORDER BY score DESC, doc))::BIGINT AS rk
                FROM sc)
          WHERE rk <= 15 ORDER BY rk"""
    },

    "Q-llm-50" -> {
      val stop = "len(list_filter(string_split(text, ' '), " +
        "w -> list_contains(['the','a','of','to','and'], w)))"
      s"""WITH f0 AS (
            SELECT doc_id, source,
                   ${Portable.rSql("strlen(text)::DOUBLE / len(string_split(text, ' '))", 6)} AS x1,
                   ${Portable.rSql(s"$stop::DOUBLE / len(string_split(text, ' '))", 6)} AS x2
            FROM documents),
          base AS (
            SELECT doc_id, source,
                   CASE WHEN x1 <= 6.0 AND x2 >= 0.04 THEN 1 ELSE 0 END AS y
            FROM f0),
          cat AS (SELECT source, sum(y) AS cs, count(*) AS cn
                  FROM base GROUP BY source),
          g AS (SELECT sum(y) AS gs, count(*) AS gn FROM base)
          SELECT b.doc_id, b.source, b.y::BIGINT AS y,
                 ${Portable.rSql(
                   "((cs - b.y) * gn + 20 * gs)::DOUBLE / (gn * (cn - 1 + 20))::DOUBLE",
                   6)} AS enc
          FROM base b JOIN cat USING (source) CROSS JOIN g
          ORDER BY b.doc_id"""
    },

    "Q-llm-51" -> {
      val sh5 = """CASE WHEN len(ws) >= 5 THEN list_transform(
          generate_series(1, len(ws) - 4),
          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
               ws[i+3] || ' ' || ws[i+4])
        ELSE [] END"""
      s"""WITH c AS (
           SELECT doc_id, lower(trim(text)) AS tc FROM documents),
         t AS (SELECT doc_id, tc, str_split(tc, ' ') AS ws FROM c),
         gated AS (
           SELECT doc_id, tc, ws FROM t
           WHERE doc_id % 97 <> 0
             AND len(list_intersect(list_distinct(ws),
                   ['the','a','of','to','and'])) >= 2
             AND list_sum(list_transform(ws, w -> strlen(w)))::DOUBLE
                   / len(ws) >= 3.0
             AND list_sum(list_transform(ws, w -> strlen(w)))::DOUBLE
                   / len(ws) <= 10.0),
         dd AS (
           SELECT doc_id, tc, ws FROM (
             SELECT doc_id, tc, ws,
                    row_number() OVER (PARTITION BY md5(tc)
                      ORDER BY doc_id) AS rk
             FROM gated)
           WHERE rk = 1),
         bsh AS (
           SELECT DISTINCT sh AS bsh FROM (
             SELECT unnest($sh5) AS sh
             FROM t WHERE doc_id % 97 = 0)),
         tsh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest($sh5) AS sh FROM dd)),
         hits AS (
           SELECT doc_id, count(*) AS n_hits
           FROM tsh JOIN bsh ON sh = bsh GROUP BY doc_id),
         surv AS (
           SELECT d.doc_id, d.ws FROM dd d
           LEFT JOIN hits h ON d.doc_id = h.doc_id
           WHERE coalesce(h.n_hits, 0) < 3),
         keyed AS (
           SELECT doc_id, len(ws)::BIGINT AS n_tokens,
                  md5('pipe42:' || doc_id) AS k,
                  substr(md5('pipe42:' || doc_id), 1, 1) AS shard
           FROM surv)
         SELECT shard,
                (row_number() OVER (PARTITION BY shard ORDER BY k))::BIGINT
                  AS pos,
                doc_id, n_tokens
         FROM keyed ORDER BY shard, pos"""
    },

    "Q-llm-52" -> {
      s"""WITH cells AS (
           SELECT label, vec_id % 2 AS period, i.i AS pos,
                  ${Portable.rSql(
                    Portable.dsumSql("embedding[i.i + 1]::DOUBLE") +
                    " / count(*)", 9)} AS m,
                  count(*) AS n
           FROM embeddings,
                (SELECT unnest(generate_series(0, 63)) AS i) i
           GROUP BY label, vec_id % 2, i.i),
         a AS (SELECT label, pos, m AS ma, n AS na FROM cells WHERE period = 0),
         b AS (SELECT label, pos, m AS mb, n AS nb FROM cells WHERE period = 1)
         SELECT a.label::BIGINT AS label,
                max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
                ${Portable.rSql("sqrt(" + Portable.dsumSql(
                  Portable.rSql("(ma - mb) * (ma - mb)", 9)) + ")", 6)} AS shift
         FROM a JOIN b ON a.label = b.label AND a.pos = b.pos
         GROUP BY a.label ORDER BY label"""
    }
  )
}
