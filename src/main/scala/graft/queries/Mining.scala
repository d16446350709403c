package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions.words

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
         ORDER BY score_ppm DESC, cand.w1, cand.w2 LIMIT 25"""
  )
}
