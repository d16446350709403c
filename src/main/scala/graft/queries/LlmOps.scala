package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.functions.TextFunctions._
import graft.multimodal.Multimodal
import graft.operators.IvfIndex

/** Q-llm-* / Q-mm-*: LLM-data-pipeline operators (SURVEY.md §2B + north
  * star): dedup (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
  * search (brute-force in CustomOps, IVF-ANN here), text analysis (lang-id,
  * quality, token counting, fingerprinting), multimodal binary plumbing.
  *
  * Every hash is md5-based and every score is plain arithmetic, so the
  * DuckDB oracle replicates the exact algebra (deterministic seeds — see
  * SURVEY.md §2B Q-llm-02 note).
  */
object LlmOps {

  private val BANDS = 6      // MinHash-LSH band count (R=1 rows/band)
  private val LR_ITERS = 12  // Q-llm-42 full-batch GD rounds (shared w/ oracle;
                             // DuckDB plans the unrolled chain superlinearly,
                             // so rounds stay low and the learning rate high)
  private val LSH_BITS = 6   // hyperplane-LSH bucket bits (Q-llm-14)
  private val LSH_TABLES = 4 // hyperplane-LSH independent tables (Q-llm-14)
  // max bucket members per chunk in the blocked candidate joins — any
  // single join key emits ≤ CAP² rows no matter how hot the bucket
  // (graft.operators.BucketJoin; the TriangleCount vertex-split applied
  // to LSH band buckets / prefix tokens / SemDeDup cells)
  private val BUCKET_CAP = 256

  /** Shared MinHash-LSH front end (Q-llm-02/16/24/63): the distinct
    * shingle set (persisted + materialized — three consumers otherwise
    * race to recompute it), one-buffer K-band signatures with set sizes,
    * and the exploded (doc_id, band_id, key) band rows. */
  private def lshFront(s: org.apache.spark.sql.SparkSession, docs: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    // aggregating over the DISTINCT set (not the raw explode) keeps both
    // aggregates non-distinct, so Catalyst plans ONE hash aggregation
    // with no Expand-based distinct rewrite
    val sh = shingleRows(docs, "doc_id", "text", 3).distinct().persist()
    // eager: consumers otherwise race to compute uncached partitions in
    // parallel stages of one job, re-running the shingle pipeline ~3x.
    // On a cluster this intermediate would be checkpointed the same way.
    sh.count()
    graft.functions.MinHashSig.register(s)
    val sigs = sh.groupBy("doc_id").agg(
      expr(s"minhash_sig(sh, $BANDS)").as("sig"),
      count(lit(1)).as("n_sh"))
    val bands = sigs
      .select(col("doc_id"), posexplode(col("sig")))
      .select(col("doc_id"), col("pos").as("band_id"), col("col").as("key"))
    (sh, sigs, bands)
  }

  /** Exact shingle-set Jaccard attached to candidate pairs (a, b): one
    * intersection-count join over the distinct shingle set plus the two
    * size attaches. Linear in (candidates × shared shingles).
    *
    * JOIN ORDER IS THE SKEW ARMOR for star-edge consumers: every star
    * edge of a cluster shares the hub as `a`, so hopping through the
    * `a`-side shingles FIRST would land deg(a) x |sh(hub)| rows on the
    * single join key `a` — at a 10⁶-member boilerplate cluster that is
    * one straggler task holding ~10⁸ rows. Instead the first hop keys on
    * `b` (a member appears under ≤ BANDS hubs, so deg(b) is a small
    * constant), and the second on the COMPOSITE (a, sh): the hub's load
    * spreads over its |sh(hub)| distinct shingle keys with ≤ deg(a) rows
    * each — per-key load drops by the shingle-set size (~10²–10³x), and
    * what remains is AQE-skew-splittable SMJ input, not single-key
    * output. Total row volume is symmetric to the a-first order
    * (Σ_edges |sh(b)| vs Σ_edges |sh(a)|); only the distribution
    * changes, so every consumer's result — and its oracle — is
    * unchanged. Pinned by ScaleCurve `dedup-star` max-task balance at
    * 64x cluster size. */
  private[graft] def jaccardOn(cand: DataFrame, sh: DataFrame,
                               sigs: DataFrame): DataFrame = {
    val sizes = sigs.select(col("doc_id"), col("n_sh"))
    val inter = cand
      .join(sh.select(col("doc_id").as("b"), col("sh")), "b")
      .join(sh.select(col("doc_id").as("a"), col("sh")), Seq("a", "sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_inter"))
    cand
      .join(inter, Seq("a", "b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), "b")
      .select(col("a"), col("b"),
        Portable.r(col("n_inter") / (col("na") + col("nb") - col("n_inter")), 6)
          .as("jaccard"))
  }

  val queries: Map[String, Q] = Map(
    // ---- Q-llm-01: exact dedup by content hash, keep lowest doc_id
    "Q-llm-01" -> { (s, d) =>
      val w = Window.partitionBy("h").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("h")))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("h"), col("n_copies"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-02: MinHash-LSH near-dup candidates + exact Jaccard verify.
    // shingle -> seeded minhash per band -> CHUNKED band-bucket self-join
    // ([[graft.operators.BucketJoin.selfPairs]]) -> candidate pairs ->
    // exact shingle-set Jaccard. All stages are equi-joins/groupBys on
    // hash keys, and the hot-bucket armor bounds any single join key at
    // BUCKET_CAP² output rows: a viral boilerplate cluster (one page
    // duplicated 10⁴–10⁶× in a web corpus) spreads its k² pairs over
    // (k/cap)² keys instead of landing them on one straggler task. The
    // emitted pair SET is exactly the naive join's, so the oracle is
    // unchanged.
    "Q-llm-02" -> { (s, d) =>
      val (sh, sigs, bands) = lshFront(s, Tables.documents(s, d))
      val cand = graft.operators.BucketJoin
        .selfPairs(bands, Seq("band_id", "key"), "doc_id", BUCKET_CAP)
        .select(col("a_doc_id").as("a"), col("b_doc_id").as("b")).distinct()
      jaccardOn(cand, sh, sigs)
        .orderBy("a", "b")
    },

    // ---- Q-llm-04: text stats per language
    "Q-llm-04" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), size(words(col("text"))).cast("bigint").as("n_words"),
          col("n_chars"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          Portable.r(sum("n_words").cast("double") / count(lit(1)), 6).as("avg_words"),
          Portable.r(sum("n_chars").cast("double") / count(lit(1)), 6).as("avg_chars"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("lang")
    },

    // ---- Q-llm-04 (hist): document length histogram (100-char buckets)
    "Q-llm-04-hist" -> { (s, d) =>
      Tables.documents(s, d)
        .select(((col("n_chars") / 100).cast("bigint") * 100).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket")
    },

    // ---- Q-llm-05: UDTF shape — explode docs into (doc_id, idx, word)
    "Q-llm-05" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(words(col("text"))))
        .select(col("doc_id"), col("pos").cast("bigint").as("idx"),
          col("col").as("word"))
        .orderBy("doc_id", "idx")
    },

    // ---- Q-llm-06: 16-bit SimHash per document + collision count
    "Q-llm-06" -> { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
        .withColumn("h", md5(col("w")))
      val bits = tok
        .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(15))).as("j"))
        .withColumn("digit",
          expr("CAST(conv(substring(h, CAST(1 + j DIV 4 AS INT), 1), 16, 10) AS BIGINT)"))
        .withColumn("bit", expr("shiftright(digit, CAST(3 - j % 4 AS INT)) % 2"))
        .groupBy("doc_id", "j")
        .agg(sum(col("bit") * 2 - 1).as("balance"))
        .withColumn("bit_j", (col("balance") > 0).cast("bigint"))
      val sims = bits.groupBy("doc_id")
        .agg(sum(expr("bit_j * CAST(shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) AS BIGINT)"))
          .as("simhash"))
      sims
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy("simhash")).cast("bigint"))
        .select("doc_id", "simhash", "n_same")
        .orderBy("doc_id")
    },

    // ---- Q-llm-07: exact n-gram Jaccard for consecutive doc pairs
    "Q-llm-07" -> { (s, d) =>
      val sh = shingleRows(Tables.documents(s, d), "doc_id", "text", 3).distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("a"), col("sh"))
      val b = sh.select(col("doc_id").as("b"), col("sh"))
      val inter = a.join(b, a("a") + 1 === b("b") && a("sh") === b("sh"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_inter"))
      sizes.select(col("doc_id").as("a"), col("n_sh").as("na"))
        .join(sizes.select((col("doc_id") - 1).as("a"), col("n_sh").as("nb")), "a")
        .join(inter, Seq("a"), "left")
        .na.fill(0L, Seq("n_inter"))
        .select(col("a"), (col("a") + 1).as("b"),
          Portable.r(col("n_inter") / (col("na") + col("nb") - col("n_inter")), 6)
            .as("jaccard"))
        .orderBy("a")
    },

    // ---- Q-llm-08: IVF-Flat ANN, rendered hash-matchable: per query the
    // IVF top-10 intersects the exact cosine top-10 (the Q-llm-03
    // machinery — self excluded on both sides) and the index contract's
    // per-query recall@10 >= 0.4 is emitted as a MEASURED boolean; the
    // oracle lists the query ids with TRUE literals, so a hash mismatch
    // is a recall regression. The IVF path (centroid bucketing, nprobe
    // probing) is the scale plan; the exact side is the harness. Pooled
    // recall is additionally pinned quantitatively in LlmOpsSpec.
    "Q-llm-08" -> { (s, d) =>
      graft.functions.CosineSim.register(s)
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val ivf = IvfIndex.search(emb, qs, "vec_id", "embedding",
          "query_id", "q_emb", nlist = 16, nprobe = 8, k = 10)
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"))
      val scored = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          expr("cosine_sim(q_emb, embedding)").as("sim"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("vec_id"))
      val exact = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10).select(col("query_id"), col("vec_id"))
      val hits = exact.join(ivf, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      exact.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
        .join(hits, Seq("query_id"), "left")
        .na.fill(0L, Seq("n_hits"))
        .select(col("query_id"), col("n_exact"),
          (col("n_hits") >= col("n_exact") * lit(0.4)).as("recall_ge_04"))
        .orderBy("query_id")
    },

    // ---- Q-llm-14: random-hyperplane LSH ANN (second ANN scale path
    // beside IVF). Deterministic planes are literal constants in BOTH the
    // Spark plan and the oracle SQL, so even this approximate operator
    // hash-matches (the oracle replicates the same bucket algebra).
    "Q-llm-14" -> { (s, d) =>
      val ps = graft.operators.LshIndex.planes(
        dim = 64, nBits = LSH_BITS, nTables = LSH_TABLES)
      graft.operators.LshIndex
        .search(Tables.embeddings(s, d), "vec_id", "embedding",
          qPred = col("vec_id") < 5, ps, nBits = LSH_BITS, k = 10)
        .select(col("query_id"), col("vec_id"),
          Portable.r(col("sim"), 6).as("sim"), col("rk"))
        .orderBy("query_id", "rk")
    },

    // ---- Q-llm-16: dedup CLUSTERS — the step after near-dup candidates.
    // Duplicates are transitive, so verified near-dup edges (jaccard >=
    // 0.5) feed a graph whose connected components are the dup clusters;
    // each doc gets its component's min doc_id as cluster_id and is kept
    // iff it IS that representative.
    //
    // Candidate edges are STAR edges per band bucket (member → bucket
    // min, [[graft.operators.BucketJoin.starEdges]]), NOT all pairs: a
    // consumer that only needs CONNECTIVITY pays O(k) edges per bucket
    // where the pairwise join pays O(k²) — at 100 TB a 10⁶-dup
    // boilerplate cluster emits 10⁶ star edges instead of 10¹² pairs,
    // which no amount of chunking makes feasible. The candidate graph's
    // components are identical (within a bucket the star spans exactly
    // the members the clique did); only the VERIFIED graph can differ at
    // the margin — a bucket mixing true and false near-dups can drop a
    // member whose star edge fails Jaccard while some non-star pair
    // would have passed — and banding redundancy (6 independent buckets
    // per doc) is the standard mitigation. The oracle replays the same
    // star algebra, and LlmOpsSpec pins the planted mega-cluster
    // (Q-llm-63) resolving to ONE component under it. Components via
    // distributed min-label propagation (operators/ConnectedComponents);
    // the oracle computes the same components as a DuckDB recursive
    // closure.
    "Q-llm-16" -> { (s, d) =>
      val nodes = Tables.documents(s, d).select(col("doc_id").as("id"))
      val (sh, sigs, bands) = lshFront(s, Tables.documents(s, d))
      val star = graft.operators.BucketJoin
        .starEdges(bands, Seq("band_id", "key"), "doc_id")
      val edges = jaccardOn(star, sh, sigs)
        .filter(col("jaccard") >= 0.5).select(col("a"), col("b"))
      val labels = graft.operators.ConnectedComponents.minLabel(nodes, edges)
      // cluster size via a window count: one shuffle by label and ONE
      // evaluation of the labels plan (a groupBy+join would re-execute the
      // isolated-node anti-join union once per join side)
      labels
        .select(col("id").as("doc_id"), col("label").as("cluster_id"),
          count(lit(1)).over(Window.partitionBy("label")).as("cluster_size"),
          (col("id") === col("label")).as("is_kept"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-15: int8 quantization + exact re-rank. The index stores a
    // symmetric per-vector int8 quantization (scale = 127/max|x|, values in
    // [-127,127]) — 4x smaller than float32, the difference between an
    // in-memory and a spilled ANN index at 100 TB. Candidate top-50 is
    // ranked on QUANTIZED cosine (per-vector scales cancel in cosine, so
    // it's just cosine over the int arrays), then the top-10 re-rank uses
    // full-precision vectors. Quantization is floor(x*scale+0.5) — the
    // portable rounding from [[Portable]] — so the oracle replicates the
    // whole two-stage algebra bit-for-bit. (The higher-order transform is
    // interpreted; at scale the quantizer would be a codegen Expression
    // like CosineSim — fine here, it runs once per stored vector.)
    "Q-llm-15" -> { (s, d) =>
      graft.functions.CosineSim.register(s)
      val scale = lit(127.0) /
        greatest(array_max(transform(col("embedding"), x => abs(x))).cast("double"),
          lit(1e-30))
      val emb = Tables.embeddings(s, d).withColumn("qemb",
        transform(col("embedding"), x => floor(x.cast("double") * scale + lit(0.5)).cast("float")))
      val qs = emb.filter(col("vec_id") < 5).select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("qemb").as("q_qemb"))
      val w1 = Window.partitionBy("query_id").orderBy(col("qsim").desc, col("vec_id"))
      // broadcast the ≤5-row query side so it's pinned as the BNLJ build
      // side (no stats guess) — ExplainCheck asserts this
      val cand = broadcast(qs)
        .crossJoin(emb.select(col("vec_id"), col("embedding"), col("qemb")))
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("qsim", expr("cosine_sim(q_qemb, qemb)"))
        .withColumn("qrk", row_number().over(w1))
        .filter(col("qrk") <= 50)
      val w2 = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
      cand
        .withColumn("sim", expr("cosine_sim(q_emb, embedding)"))
        .withColumn("rk", row_number().over(w2).cast("bigint"))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("vec_id"),
          Portable.r(col("sim"), 6).as("sim"), col("rk"))
        .orderBy("query_id", "rk")
    },

    // ---- Q-llm-29: matryoshka truncated-dim retrieval + exact re-rank —
    // the dimension-reduction twin of Q-llm-15's precision reduction:
    // stage 1 ranks on cosine over only the FIRST 16 dims (a 4x smaller
    // working set — with MRL-trained embeddings the information-dense
    // prefix), stage 2 re-ranks the surviving top-50 with full vectors.
    // Both stages stay codegen (CosineSim over sliced arrays); the oracle
    // replicates the slice + two-stage ranking bit-for-bit.
    "Q-llm-29" -> { (s, d) =>
      graft.functions.CosineSim.register(s)
      val emb = Tables.embeddings(s, d)
        .withColumn("temb", slice(col("embedding"), 1, 16))
      val qs = emb.filter(col("vec_id") < 5).select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("temb").as("q_temb"))
      val w1 = Window.partitionBy("query_id").orderBy(col("tsim").desc, col("vec_id"))
      // broadcast the ≤5-row query side so it's pinned as the BNLJ build
      // side (no stats guess) — ExplainCheck asserts this
      val cand = broadcast(qs)
        .crossJoin(emb.select(col("vec_id"), col("embedding"), col("temb")))
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("tsim", expr("cosine_sim(q_temb, temb)"))
        .withColumn("trk", row_number().over(w1))
        .filter(col("trk") <= 50)
      val w2 = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
      cand
        .withColumn("sim", expr("cosine_sim(q_emb, embedding)"))
        .withColumn("rk", row_number().over(w2).cast("bigint"))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("vec_id"),
          Portable.r(col("sim"), 6).as("sim"), col("rk"))
        .orderBy("query_id", "rk")
    },

    // ---- Q-llm-09: language-ID via character-n-gram marker scoring
    "Q-llm-09" -> { (s, d) =>
      def occ(marker: String) =
        ((length(col("text")) - length(replace(col("text"), lit(marker), lit(""))))
          / marker.length).cast("bigint")
      Tables.documents(s, d)
        .withColumn("score_en", occ("the") + occ("and") + occ("ing"))
        .withColumn("score_de", occ("sch") + occ("der") + occ("ein"))
        .withColumn("score_fr", occ("le ") + occ("ent") + occ("eau"))
        .withColumn("score_es", occ("os ") + occ("ar ") + occ("el "))
        .withColumn("predicted",
          when(col("score_en") >= greatest(col("score_de"), col("score_fr"), col("score_es")), "en")
          .when(col("score_de") >= greatest(col("score_fr"), col("score_es")), "de")
          .when(col("score_fr") >= col("score_es"), "fr")
          .otherwise("es"))
        .select(col("doc_id"), col("score_en"), col("score_de"), col("score_fr"),
          col("score_es"), col("predicted"), col("lang"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-10: quality scoring (length/uniqueness/stopword ratios)
    "Q-llm-10" -> { (s, d) =>
      val ws = words(col("text"))
      val nw = size(ws).cast("double")
      val stopHits = size(filter(ws,
        w => w.isin("the", "a", "of", "to", "and"))).cast("double")
      val uniqRatio = size(array_distinct(ws)).cast("double") / nw
      val lenScore = least(nw / lit(100.0), lit(1.0))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(ws).cast("bigint").as("n_words"),
          Portable.r(stopHits / nw, 6).as("stopword_ratio"),
          Portable.r(uniqRatio, 6).as("unique_ratio"),
          Portable.r(lit(0.3) * lenScore + lit(0.4) * uniqRatio
            + lit(0.3) * (stopHits / nw), 6).as("quality"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-20: repetition quality filters (Gopher-style) — fraction
    // of bigrams occupied by the single most frequent bigram, and
    // fraction occupied by any repeated bigram; boilerplate/spam pages
    // score high on both and are dropped before training. One
    // shingle-explode + two partial-agg groupBys, keyed by doc — linear
    // shuffles at corpus scale. The keep flag compares the UNROUNDED
    // ratio (an IEEE-exact quotient of integers, so bit-identical across
    // engines); only the reported fractions are display-rounded.
    "Q-llm-20" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val counts = shingleRows(docs, "doc_id", "text", 2)
        .groupBy("doc_id", "sh").agg(count(lit(1)).as("c"))
      val per = counts.groupBy("doc_id").agg(
        sum("c").as("n_grams"),
        max("c").as("top_c"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_c"))
      val topFrac = coalesce(col("top_c").cast("double") / col("n_grams"), lit(0.0))
      val dupFrac = coalesce(col("dup_c").cast("double") / col("n_grams"), lit(0.0))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          Portable.r(topFrac, 6).as("top_bigram_frac"),
          Portable.r(dupFrac, 6).as("dup_bigram_frac"),
          (topFrac <= 0.2 && dupFrac <= 0.5).as("keep"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-21: per-language embedding centroids — cross-modal join
    // (documents metadata x embeddings vectors) + VECTOR aggregation in
    // the explode-to-rows layout: (key, dim, value) rows make the mean a
    // plain partial-agg groupBy — the scalable shape for wide vectors
    // (a collect-to-array centroid would serialize whole vectors through
    // one reducer per key). Decimal-exact sums keep the mean portable.
    "Q-llm-21" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val langs = Tables.documents(s, d)
        .select(col("doc_id").as("vec_id"), col("lang"))
      emb.join(langs, "vec_id")
        .select(col("lang"), posexplode(col("embedding")))
        .groupBy("lang", "pos")
        .agg(
          Portable.r(Portable.dsum(col("col").cast("double")) / count(lit(1)), 6)
            .as("mean"),
          count(lit(1)).as("n"))
        .select(col("lang"), col("pos").cast("bigint").as("dim"),
          col("mean"), col("n"))
        .orderBy("lang", "dim")
    },

    // ---- Q-llm-22: deterministic train/val/test split (~90/5/5) — split
    // assignment is a pure hash function of the KEY (Q-scan-06's
    // reproducible-sampling principle applied to dataset splits: the same
    // doc lands in the same split on any engine, run, or partitioning —
    // no leakage when the corpus is re-processed), audited per language.
    "Q-llm-22" -> { (s, d) =>
      val h = substring(md5(concat(lit("split42:"), col("doc_id"))), 1, 2)
      Tables.documents(s, d)
        .withColumn("split",
          when(h < "e6", "train").when(h < "f3", "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    },

    // ---- Q-llm-24: INCREMENTAL dedup — the continuous-ingest shape: a
    // batch of "new" docs (doc_id % 5 = 0, ~20%) is checked against the
    // existing corpus (the rest) instead of all-pairs self-joining. Same
    // MinHash-LSH algebra as Q-llm-02, but the band join is ASYMMETRIC
    // (new x corpus), so at 100 TB the per-batch cost scales with
    // |new| x collision-rate, not |corpus|^2 — and the bipartite
    // chunking ([[graft.operators.BucketJoin.bipartitePairs]]) bounds
    // any single join key at BUCKET_CAP² rows when a new doc lands in a
    // corpus mega-bucket. Each new doc gets its single best corpus match
    // (highest verified Jaccard >= 0.5, ties to the lowest corpus id).
    "Q-llm-24" -> { (s, d) =>
      val (sh, sigs, bands) = lshFront(s, Tables.documents(s, d))
      val cand = graft.operators.BucketJoin
        .bipartitePairs(bands, col("doc_id") % 5 === 0,
          Seq("band_id", "key"), "doc_id", BUCKET_CAP)
        .select(col("a_doc_id").as("a"), col("b_doc_id").as("b")).distinct()
      val verified = jaccardOn(cand, sh, sigs)
        .select(col("a").as("new_doc"), col("b").as("dup_of"), col("jaccard"))
        .filter(col("jaccard") >= 0.5)
      val w = Window.partitionBy("new_doc")
        .orderBy(col("jaccard").desc, col("dup_of"))
      verified.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("new_doc", "dup_of", "jaccard")
        .orderBy("new_doc")
    },

    // ---- Q-llm-25: training-mix sampling — down/up-weight languages to a
    // target mixture with the deterministic key-hash keep rule (Q-scan-06's
    // principle): en kept at ~50%, zh fully, everything else at ~25%. The
    // decision is a pure function of doc_id, so the same corpus yields the
    // same mix on any engine/run/partitioning — reprocessing never leaks
    // dropped docs back in.
    "Q-llm-25" -> { (s, d) =>
      val h = substring(md5(concat(lit("mix42:"), col("doc_id"))), 1, 2)
      Tables.documents(s, d)
        .filter(
          when(col("lang") === "en", h < "80")
            .when(col("lang") === "zh", lit(true))
            .otherwise(h < "40"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).as("chars_kept"))
        .orderBy("lang")
    },

    // ---- Q-llm-23: context-window chunking — split each document into
    // overlapping word windows (size 32, stride 24: an 8-word overlap so
    // no span is lost at a boundary), the text twin of Q-mm-04's binary
    // chunking and the standard pre-tokenization fan-out for LLM training.
    // Pure codegen: split + sequence + explode + slice; at 100 TB this is
    // a narrow map stage (no shuffle at all until a downstream groupBy).
    "Q-llm-23" -> { (s, d) =>
      val win = 32; val stride = 24
      Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .filter(size(col("ws")) > 0)
        .withColumn("i",
          explode(sequence(lit(0L), expr(s"CAST((size(ws) - 1) DIV $stride AS BIGINT)"))))
        .select(col("doc_id"), col("i").as("chunk_idx"),
          size(slice(col("ws"), (col("i") * stride + 1).cast("int"), lit(win)))
            .cast("bigint").as("n_words"),
          array_join(slice(col("ws"), (col("i") * stride + 1).cast("int"), lit(win)), " ")
            .as("chunk"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- Q-llm-11: token counting — whitespace, BPE-ish regex, chars/4
    "Q-llm-11" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("bigint").as("ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("bigint").as("re_tokens"),
          ceil(col("n_chars") / lit(4.0)).cast("bigint").as("est_bpe_tokens"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-12: winnowing-style document fingerprint — min rolling
    // 8-gram hash (docs shorter than 8 words -> null fingerprint)
    "Q-llm-12" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val fp = shingleRows(docs, "doc_id", "text", 8)
        .groupBy("doc_id").agg(min(md5(col("sh"))).as("fingerprint"))
      docs.select("doc_id").join(fp, Seq("doc_id"), "left")
        .orderBy("doc_id")
    },

    // ---- Q-llm-17: TF-IDF top-3 terms per doc — the canonical two-agg +
    // windowed-top-k text pipeline. Both aggregations are partial-agg
    // shuffles keyed by (doc, word) / word; the top-k is a per-group
    // window limit. Ranked by the ROUNDED score (unrounded last-ulp
    // differences between engines would reorder ties), word as tie-break.
    "Q-llm-17" -> { (s, d) =>
      val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
      val w = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
      val tf = w.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val df = w.groupBy("word").agg(countDistinct("doc_id").as("df"))
      val total = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "word")
        .crossJoin(broadcast(total))
        .withColumn("tfidf",
          Portable.r(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      val rk = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("word"))
      scored
        .withColumn("rank", row_number().over(rk).cast("bigint"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"), col("tfidf"))
        .orderBy("doc_id", "rank")
    },

    // ---- Q-llm-18: text normalization/cleaning — the pre-tokenization
    // scrub of a training pipeline: lowercase, digit-run masking,
    // punctuation strip, whitespace squeeze. Pure codegen'd regex
    // built-ins (patterns restricted to the Java∩RE2 common dialect so
    // the oracle replicates them byte-for-byte); output is the cleaned
    // text's hash + stats, so the compare covers the whole string.
    "Q-llm-18" -> { (s, d) =>
      val cleaned = trim(regexp_replace(regexp_replace(regexp_replace(
        lower(col("text")),
        "[0-9]+", "<num>"),
        "[^a-z<> ]", ""),
        "  +", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), cleaned.as("clean"))
        .select(col("doc_id"),
          md5(col("clean")).as("clean_hash"),
          length(col("clean")).cast("bigint").as("clean_len"),
          size(split(col("clean"), " ")).cast("bigint").as("n_tokens"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-19: deterministic training shuffle + sharding — a global
    // pseudo-random permutation as a pure hash function of the KEY
    // (reproducible across engines, runs, partition counts — never RNG
    // over partition order), sharded by the key's first hex nibble. At
    // 100 TB the ORDER BY is a range-partitioned sort on uniformly
    // distributed md5 keys — no skew by construction — and each shard's
    // sequence is a per-partition window, not a global bottleneck.
    "Q-llm-19" -> { (s, d) =>
      val keyed = Tables.documents(s, d).select(
        col("doc_id"),
        md5(concat(lit("seed42:"), col("doc_id"))).as("shuffle_key"))
        .withColumn("shard", substring(col("shuffle_key"), 1, 1))
      val w = Window.partitionBy("shard").orderBy("shuffle_key")
      keyed
        .withColumn("pos", row_number().over(w).cast("bigint"))
        .select(col("shard"), col("pos"), col("doc_id"), col("shuffle_key"))
        .orderBy("shard", "pos")
    },

    // ---- Q-llm-26: token-budget sequence packing — concat-then-chunk
    // assignment of shuffled docs into fixed 256-token training windows.
    // pack_id = the window the doc STARTS in, from a per-language running
    // token sum over the deterministic shuffle order (Q-llm-19's key
    // algebra). At 100 TB the running sum is a per-language window over a
    // range-partitioned sort on uniform md5 keys (skew-free), and the
    // final per-pack rollup is an ordinary partial-agg groupBy.
    "Q-llm-26" -> { (s, d) =>
      val budget = 256
      val toks = Tables.documents(s, d).select(
        col("lang"),
        md5(concat(lit("pack42:"), col("doc_id"))).as("shuffle_key"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      val w = Window.partitionBy("lang").orderBy("shuffle_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .withColumn("running", sum(col("n_tokens")).over(w))
        .withColumn("pack_id", ((col("running") - col("n_tokens")) / budget)
          .cast("bigint"))
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"))
        .orderBy("lang", "pack_id")
    },

    // ---- Q-llm-27: fuzzy near-dup via bounded edit distance — the 6th
    // dedup mode, for OCR-noise / single-edit duplicates that MinHash's
    // token shingles under-weight. The corpus has no natural near-dups
    // (min prefix distance 37 at sf0.01), so the query PLANTS them
    // deterministically: every 50th doc gets a variant with its 11th
    // char deleted, and the operator must find exactly the planted
    // pairs. Candidate space is controlled by BLOCKING, not
    // the quadratic metric: docs group by (lang, 16-char length band,
    // 8-char lowercase prefix), each doc emitted to its own and the next
    // band (near-boundary pairs keep a shared key), pairs form via
    // equi-join on the block key, and the O(len^2) levenshtein runs only
    // on candidates' 64-char prefixes. The prefix key is what makes the
    // block shatter (measured sf0.1: 193k pairs on length band alone vs
    // 819 with the prefix — a 236x cut); its recall contract is "edits at
    // char 9+", which the planted variants and OCR-noise dups satisfy.
    // At scale the same plan partitions by block key.
    "Q-llm-27" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      // variant = char 11 deleted; id offset keeps the pair orientation fixed
      val variants = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("lang"),
          concat(substring(col("text"), 1, 10), substring(col("text"), 12, 1 << 28))
            .as("text"))
        .withColumn("n_chars", length(col("text")).cast("bigint"))
      val corpus = docs.select("doc_id", "lang", "text", "n_chars")
        .unionByName(variants)
      val side = corpus
        .select(col("doc_id"), col("lang"), col("n_chars"),
          substring(lower(col("text")), 1, 64).as("sig"))
        .withColumn("pfx", substring(col("sig"), 1, 8))
        .withColumn("band0", (col("n_chars") / 16).cast("bigint"))
      val blocked = side.select(col("doc_id"), col("lang"), col("n_chars"),
        col("sig"), col("pfx"),
        explode(array(col("band0"), col("band0") + 1)).as("band"))
      // hot-block armor: an OCR-noise boilerplate cluster shares (band,
      // lang, prefix) — the chunked join bounds any key at BUCKET_CAP²
      // rows with the exact same candidate set (oracle unchanged)
      graft.operators.BucketJoin
        .selfPairs(blocked, Seq("band", "lang", "pfx"), "doc_id", BUCKET_CAP)
        .filter(abs(col("a_n_chars") - col("b_n_chars")) <= 8)
        // dedup the band-and-next double emission BEFORE the quadratic
        // metric so each candidate pays levenshtein once
        .select(col("a_doc_id").as("a"), col("b_doc_id").as("b"),
          col("a_sig").as("sa"), col("b_sig").as("sb"))
        .distinct()
        .select(col("a"), col("b"),
          levenshtein(col("sa"), col("sb")).cast("bigint").as("dist"))
        .filter(col("dist") <= 12)
        .orderBy("a", "b")
    },

    // ---- Q-llm-28: unigram-LM quality scoring — a cheap perplexity
    // proxy: corpus unigram distribution, then each doc's mean token
    // log-probability. Rare-token-heavy (low-quality / wrong-language)
    // docs score low.
    //
    // Scale shape: the raw token stream is the biggest intermediate in
    // the system at 100 TB, so it must never cross an exchange. The
    // stream is pre-aggregated to (doc_id, word, n) IN THE MAP STAGE
    // (partial agg before the first shuffle), and everything downstream —
    // the word-count groupBy, the count-attach join, the per-doc fold —
    // moves only distinct (doc, word) rows. Exactness is preserved by
    // weighting the decimal-rounded log term: n * round10(lp) ==
    // sum of n rounded copies, and DECIMAL(20,10) * DECIMAL(8,0) →
    // (29,10) multiplies without precision loss on either engine.
    "Q-llm-28" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val w = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      // token stream collapses to distinct (doc, word) before any shuffle
      val dw = w.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      val counts = dw.groupBy("word").agg(sum(col("n")).as("c"))
      val total = counts.agg(sum(col("c")).as("n_total"))
      val lpn = dw.join(counts, "word")
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("n"),
          (log(col("c").cast("double") / col("n_total").cast("double"))
            .cast(DecimalType(20, 10)) * col("n").cast(DecimalType(8, 0)))
            .as("lpn"))
      lpn.groupBy("doc_id")
        .agg(sum(col("n")).cast("bigint").as("n_tokens"),
          Portable.r(sum(col("lpn")).cast("double") / sum(col("n")), 6)
            .as("mean_logp"))
        .withColumn("keep", col("mean_logp") > -9.0)
        .orderBy("doc_id")
    },

    // ---- Q-llm-30: benchmark decontamination — flag training docs that
    // share word 5-grams with a held-out benchmark set (docs ending in a
    // 97-cycle stand in for the eval suite). The overlap test is an
    // equi-join on the shingle hash: benchmark shingles (small side)
    // broadcast against the corpus shingle stream, then one counting
    // groupBy — no pairwise comparison anywhere. The natural corpus has
    // almost no benchmark overlap (1 shared 5-gram at sf0.01), so
    // test-set leakage is PLANTED: each benchmark doc gets a quoting
    // corpus twin (id + 2000000) that the gate must flag — and does,
    // while clean docs stay below threshold. At 100 TB this is the
    // standard pre-training contamination gate.
    "Q-llm-30" -> { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val leaked = docs.filter(col("doc_id") % 97 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(lit("as seen in the eval suite: "), col("text")).as("text"))
      val corpus = docs.unionByName(leaked)
      val sh = shingleRows(corpus, "doc_id", "text", 5)
        .distinct()
      val bench = sh.filter(col("doc_id") % 97 === 0 && col("doc_id") < 2000000)
        .select(col("sh").as("bsh")).distinct()
      val isTrain = col("doc_id") % 97 =!= 0 || col("doc_id") >= 2000000
      val hits = sh.filter(isTrain)
        .join(broadcast(bench), col("sh") === col("bsh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      corpus.filter(isTrain)
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_overlap_5grams"),
          (coalesce(col("n_hits"), lit(0L)) >= 3).as("contaminated"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-31: PII redaction — emails and phone-shaped digit runs
    // replaced with type tags, with per-doc redaction accounting. PII is
    // PLANTED deterministically (the corpus has none): every 20th doc
    // gains an email, every 30th a phone. Patterns live in the Java∩RE2
    // regex dialect so the oracle replicates the scrub byte-for-byte;
    // the whole operator is one narrow codegen stage (no shuffle until
    // the determinism sort).
    "Q-llm-31" -> { (s, d) =>
      val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"
      val planted = when(col("doc_id") % 20 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com")))
        .when(col("doc_id") % 30 === 0,
          concat(col("text"), lit(" call +01-555-"),
            format_string("%04d", col("doc_id") % 10000)))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), planted.as("raw"))
        .select(col("doc_id"),
          regexp_replace(regexp_replace(col("raw"), emailRe, "<email>"),
            phoneRe, "<phone>").as("clean"),
          size(split(col("raw"), emailRe, -1)).cast("bigint").as("n_email_p1"),
          size(split(col("raw"), phoneRe, -1)).cast("bigint").as("n_phone_p1"))
        .select(col("doc_id"),
          md5(col("clean")).as("clean_hash"),
          (col("n_email_p1") - 1).as("n_emails"),
          (col("n_phone_p1") - 1).as("n_phones"))
        .orderBy("doc_id")
    },

    // ---- Q-mm-01: multimodal binary-column plumbing (stubbed decode)
    "Q-mm-01" -> { (s, d) =>
      Multimodal.featuresFromDocuments(s, Tables.documents(s, d))
        .orderBy("asset_id")
    },

    // ---- Q-llm-38: BPE tokenizer merge training — the tokenizer-BUILD
    // step of a training-data pipeline (Q-llm-11/33 consume a tokenizer;
    // this learns one). Classic byte-pair encoding: start from character
    // sequences, repeatedly (a) count adjacent symbol pairs weighted by
    // word frequency, (b) pick the most frequent pair (count desc, then
    // lexicographic — a total order), (c) merge it greedily
    // left-to-right everywhere. Output = the learned merge table.
    //
    // Scale shape: the CORPUS is touched exactly once — one partial-agg
    // word-frequency shuffle (the same shape as Q-llm-33's vocab build);
    // every training round then runs on the bounded top-V vocabulary
    // (2000 rows here), driver-coordinated like ConnectedComponents.
    // That is how production BPE trainers scale: count once, train on
    // the frequency table. Merge application is a greedy string fold —
    // Spark's aggregate() HOF and DuckDB's list_reduce() run the
    // IDENTICAL lambda, so the whole training loop hash-matches.
    "Q-llm-38" -> { (s, d) =>
      import s.implicits._
      bpeTrain(s, d).map { case (r, a, b, cnt) => (r, s"$a $b", cnt) }
        .toDF("round", "pair", "cnt").orderBy("round")
    },

    // ---- Q-llm-39: BPE tokenizer APPLICATION — the consume side of
    // Q-llm-38's merge table: tokenize the whole corpus with the learned
    // merges and report per-doc subword counts + compression ratio.
    //
    // Scale shape: the fold runs on the DISTINCT-WORD table (vocabulary-
    // scale, not token-scale — the same reason real tokenizers cache
    // word→pieces); docs then join the broadcast (word → piece count)
    // map, and per-doc counts come from the (doc, word, n) partial agg —
    // the raw token stream never crosses an exchange (the Q-llm-28
    // lesson, applied at birth).
    "Q-llm-39" -> { (s, d) =>
      val merges = bpeTrain(s, d)
      val w = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "[^a-z]+")).as("word"))
        .filter(length(col("word")).between(2, 12))
      val dw = w.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      var vocab = dw.select(col("word")).distinct()
        .withColumn("s", trim(regexp_replace(col("word"), "(.)", "$1 ")))
        .localCheckpoint(true)
      merges.foreach { case (_, a, b, _) =>
        vocab = vocab.select(col("word"), expr(bpeMergeExpr(a, b)).as("s"))
          .localCheckpoint(true)
      }
      val sub = vocab.select(col("word"),
        size(split(col("s"), " ")).cast("bigint").as("n_sub"))
      dw.join(broadcast(sub), "word")
        .groupBy("doc_id")
        .agg(sum(col("n")).cast("bigint").as("n_words"),
          sum(col("n") * col("n_sub")).cast("bigint").as("n_subtokens"))
        .withColumn("ratio",
          Portable.r(col("n_subtokens").cast("double") / col("n_words"), 6))
        .orderBy("doc_id")
    },

    // ---- Q-llm-40: exact substring-span dedup (the Lee et al. 2021
    // "Deduplicating Training Data" shape): find 10-token windows whose
    // exact text recurs in ANOTHER doc, and report per-doc how many
    // tokens sit inside such a duplicated span. Cross-doc duplication is
    // PLANTED (same device as Q-llm-30): every 97th doc gets a twin
    // quoting tokens 4..31 plus a unique tail, so the gate must flag
    // both members of each pair with a 28-token shared span.
    //
    // Scale shape: windows come from the posexplode+lead codegen path
    // (one doc-keyed exchange); duplicate detection is ONE fingerprint-
    // keyed partial-agg shuffle over distinct (fp, doc) pairs — the
    // inherent cost, same as a suffix-array sort's one global pass; span
    // coverage explodes only DUPLICATED windows (candidates x W, never
    // corpus tokens). No pairwise doc comparison anywhere.
    "Q-llm-40" -> { (s, d) =>
      val W = 10
      val docs = Tables.documents(s, d)
      val toks = split(col("text"), " ")
      val twins = docs
        .filter(col("doc_id") % 97 === 0 && size(toks) >= 31)
        .select((col("doc_id") + lit(3000000L)).as("doc_id"),
          concat(concat_ws(" ", slice(toks, 4, 28)),
            lit(" unique tail "), col("doc_id")).as("text"))
      val corpus = docs.select("doc_id", "text").unionAll(twins)
      val w = Window.partitionBy("doc_id").orderBy("__pos")
      val tok = corpus.select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__w0")
      val leads = (1 until W).map(k => lead("__w0", k).over(w).as(s"__w$k"))
      val wins = tok
        .select(Seq(col("doc_id"), col("__pos").as("pos"), col("__w0")) ++ leads: _*)
        .filter(col(s"__w${W - 1}").isNotNull)
        .select(col("doc_id"), col("pos"),
          md5(concat_ws(" ", (0 until W).map(k => col(s"__w$k")): _*)).as("fp"))
        .persist()
      val dup = wins.groupBy("fp").agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2).select("fp")
      val cov = wins.join(dup, "fp")
        .select(col("doc_id"),
          explode(sequence(col("pos"), col("pos") + lit(W - 1))).as("p"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
      val nt = corpus.select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      val ndup = coalesce(col("n_dup"), lit(0L))
      nt.join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          ndup.cast("bigint").as("n_dup_tokens"),
          Portable.r(ndup.cast("double") / col("n_tokens"), 9).as("dup_ratio"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-41: TRAINED Naive-Bayes language classifier — unlike
    // Q-llm-09's fixed n-gram heuristic, this one LEARNS char-bigram
    // class-conditionals from an 80% key-hash train split (Q-llm-22's
    // split device) and predicts on the held-out 20%. The synthetic
    // corpus's lang labels are uncorrelated with its text, so a
    // learnable signal is PLANTED (Q-llm-30's device): every doc carries
    // a repeated lang marker, and the gate proves the pipeline learns it
    // (spec pins held-out accuracy).
    //
    // Scale shape: bigrams are extracted NARROWLY (per-row transform, no
    // exchange at all — trading codegen for zero shuffle); training is
    // two partial-agg shuffles keyed by (lang, bigram); the model
    // (langs x vocab) broadcasts back, so scoring never shuffles test
    // text — only the (doc, lang) score rollup crosses the wire.
    // Numerics follow Q-llm-28: log-probs cast to DECIMAL(20,10), count
    // x decimal products summed exactly, so argmax is engine-portable.
    "Q-llm-41" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val docs = Tables.documents(s, d)
      val marked = concat(col("text"), lit(" "),
        repeat(concat(lit("xq"), col("lang"), lit(" ")), 3))
      val base = docs.select(col("doc_id"), col("lang"),
          regexp_replace(lower(marked), "[^a-z]+", " ").as("t"))
        .withColumn("is_train",
          substring(md5(concat(lit("nb42:"), col("doc_id"))), 1, 2) < "cc")
        .filter(length(col("t")) >= 2)
      val bg = base.select(col("doc_id"), col("lang"), col("is_train"),
        explode(expr("transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))"))
          .as("b"))
      val trainCounts = bg.filter(col("is_train"))
        .groupBy("lang", "b").agg(count(lit(1)).as("c"))
      val langTot = trainCounts.groupBy("lang").agg(sum(col("c")).as("tot"))
      val vocabN = trainCounts.select("b").distinct().count().toDouble
      val nTrainDocs = base.filter(col("is_train")).count().toDouble
      val langStats = langTot
        .join(base.filter(col("is_train")).groupBy("lang")
          .agg(count(lit(1)).as("n_docs")), "lang")
        .select(col("lang"),
          log(col("n_docs").cast("double") / lit(nTrainDocs))
            .cast(DecimalType(20, 10)).as("prior"),
          log(lit(1.0) / (col("tot").cast("double") + lit(vocabN)))
            .cast(DecimalType(20, 10)).as("lp_unseen"),
          (col("tot").cast("double") + lit(vocabN)).as("denom"))
      val model = trainCounts.join(langStats, "lang")
        .select(col("lang"), col("b"),
          log((col("c").cast("double") + lit(1.0)) / col("denom"))
            .cast(DecimalType(20, 10)).as("lp"))
      val testBG = bg.filter(!col("is_train"))
        .groupBy("doc_id", "b").agg(count(lit(1)).cast(DecimalType(8, 0)).as("n"))
      val scored = testBG
        .crossJoin(broadcast(langStats.select(col("lang").as("cl"),
          col("prior"), col("lp_unseen"))))
        .join(broadcast(model),
          col("cl") === model("lang") && testBG("b") === model("b"), "left")
        .groupBy(col("doc_id"), col("cl"))
        .agg((max(col("prior")) +
          sum(col("n") * coalesce(col("lp"), col("lp_unseen")))).as("score"))
      val wPred = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("cl"))
      val pred = scored
        .withColumn("rk", row_number().over(wPred))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("cl").as("pred"),
          Portable.r(col("score").cast("double"), 6).as("score"))
      base.filter(!col("is_train")).select(col("doc_id"), col("lang"))
        .join(pred, "doc_id")
        .select(col("doc_id"), col("lang"), col("pred"),
          (col("lang") === col("pred")).as("correct"), col("score"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-42: TRAINED logistic-regression quality classifier —
    // the fastText-style quality gate real pipelines train: 3 document
    // statistics (mean token length, stopword rate, distinct-token
    // ratio), portably standardized, then 12 rounds of full-batch
    // gradient descent. The supervision target is a deterministic rule
    // over two of the features, so the learner's job (recover a
    // separating plane through the standardized space) is honest and
    // the spec can pin accuracy.
    //
    // Scale shape: the driver loop is the treeAggregate pattern — each
    // round is ONE partial-agg scan of the persisted feature table
    // producing 4 scalar gradient sums (shuffle = 4 decimals x
    // partitions); features/weights never fan out. Cross-engine
    // exactness: every per-doc gradient contribution is floor-rounded
    // to 9 decimals before the exact decimal sum (the PageRank lesson),
    // so all 50 weight vectors — and therefore every prediction — are
    // bit-identical to the DuckDB unrolled-CTE oracle.
    "Q-llm-42" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val ws = split(col("text"), " ")
      val stopF = "size(filter(split(text, ' '), " +
        "w -> array_contains(array('the','a','of','to','and'), w)))"
      val feats = docs.select(col("doc_id"),
          Portable.r(length(col("text")).cast("double") / size(ws), 6).as("x1"),
          Portable.r(expr(stopF).cast("double") / size(ws), 6).as("x2"),
          Portable.r(size(array_distinct(ws)).cast("double") / size(ws), 6).as("x3"))
        .withColumn("y",
          when(col("x1") <= 6.0 && col("x2") >= 0.04, 1.0).otherwise(0.0))
        .persist()
      val n = feats.count().toDouble
      val muRow = feats.agg(
        Portable.r(Portable.dsum(col("x1")) / lit(n), 6),
        Portable.r(Portable.dsum(col("x2")) / lit(n), 6),
        Portable.r(Portable.dsum(col("x3")) / lit(n), 6)).collect()(0)
      val mu = (0 to 2).map(muRow.getDouble)
      val sdRow = feats.agg(
        Portable.r(sqrt(Portable.dsum((col("x1") - lit(mu(0))) * (col("x1") - lit(mu(0)))) / lit(n)), 6),
        Portable.r(sqrt(Portable.dsum((col("x2") - lit(mu(1))) * (col("x2") - lit(mu(1)))) / lit(n)), 6),
        Portable.r(sqrt(Portable.dsum((col("x3") - lit(mu(2))) * (col("x3") - lit(mu(2)))) / lit(n)), 6)).collect()(0)
      val sd = (0 to 2).map(sdRow.getDouble)
      val zf = feats.select(col("doc_id"), col("y"),
          Portable.r((col("x1") - lit(mu(0))) / lit(sd(0)), 6).as("z1"),
          Portable.r((col("x2") - lit(mu(1))) / lit(sd(1)), 6).as("z2"),
          Portable.r((col("x3") - lit(mu(2))) / lit(sd(2)), 6).as("z3"))
        .persist()
      zf.count()
      feats.unpersist()
      val ETA = 8.0
      var w = Array(0.0, 0.0, 0.0, 0.0)
      for (_ <- 1 to LR_ITERS) {
        val z = lit(w(0)) + lit(w(1)) * col("z1") +
          lit(w(2)) * col("z2") + lit(w(3)) * col("z3")
        val sig = lit(1.0) / (lit(1.0) + exp(-z))
        val g = zf.agg(
          Portable.dsum(Portable.r(sig - col("y"), 9)),
          Portable.dsum(Portable.r((sig - col("y")) * col("z1"), 9)),
          Portable.dsum(Portable.r((sig - col("y")) * col("z2"), 9)),
          Portable.dsum(Portable.r((sig - col("y")) * col("z3"), 9))).collect()(0)
        w = Array.tabulate(4)(j => w(j) - ETA * (g.getDouble(j) / n))
      }
      val zFin = lit(w(0)) + lit(w(1)) * col("z1") +
        lit(w(2)) * col("z2") + lit(w(3)) * col("z3")
      val p = Portable.r(lit(1.0) / (lit(1.0) + exp(-zFin)), 6)
      zf.select(col("doc_id"), col("y").cast("bigint").as("y"),
          p.as("p"), (p >= 0.5).as("pred"),
          ((p >= 0.5) === (col("y") === 1.0)).as("correct"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-32: per-domain cap (RefinedWeb-style source balancing) —
    // canonicalize each doc's origin to a domain, keep at most 15 docs
    // per domain chosen by the deterministic key-hash rank (never arrival
    // order: reprocessing keeps the identical subset). The cap plans as a
    // window rank over the domain shuffle; a crawl-scale corpus ranks
    // |docs-per-domain| within each group, nothing global.
    "Q-llm-32" -> { (s, d) =>
      val w = Window.partitionBy("domain").orderBy(col("rank_key"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("domain", concat(lower(col("source")), lit(".example.com")))
        .withColumn("rank_key", md5(concat(lit("cap42:"), col("doc_id"))))
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 15)
        .select(col("doc_id"), col("domain"), col("rk"))
        .orderBy("domain", "rk")
    },

    // ---- Q-llm-33: vocabulary build + OOV audit — corpus-frequency
    // top-V vocabulary (V=20, ranked by count DESC then word so the
    // boundary is total-ordered), then each doc scored by its
    // out-of-vocabulary token fraction — the tokenizer-coverage check run
    // before committing to a vocab. Word counts are |vocab|-bounded
    // partial aggs; the tiny vocab is broadcast back against the token
    // stream, so corpus-sized inputs never pairwise-join.
    "Q-llm-33" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
      val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(20)
        .select(col("w"), lit(1).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1).otherwise(0)).as("n_oov"))
        .select(col("doc_id"),
          col("n_tokens").cast("bigint").as("n_tokens"),
          col("n_oov").cast("bigint").as("n_oov"),
          Portable.r(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-34: stopword-PRESENCE quality gate (the Gopher rule
    // Q-llm-10's ratio doesn't cover: a document must contain ≥2 distinct
    // required stopwords) + mean word length bounds. Both signals are
    // exact integer algebra over the token array (aggregate/intersect
    // HOFs, codegen, no shuffle until the final sort); keep compares the
    // exact int-quotient doubles.
    "Q-llm-34" -> { (s, d) =>
      val ws = words(col("text"))
      val sumLen = aggregate(transform(ws, w => length(w)),
        lit(0), (acc, x) => acc + x)
      val meanLen = sumLen.cast("double") / size(ws)
      val nStop = size(array_intersect(array_distinct(ws),
        array(lit("the"), lit("a"), lit("of"), lit("to"), lit("and"))))
      Tables.documents(s, d).select(
          col("doc_id"),
          nStop.cast("bigint").as("n_stop_distinct"),
          Portable.r(meanLen, 6).as("mean_word_len"),
          (nStop >= 2 && meanLen >= 3.0 && meanLen <= 10.0).as("keep"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-53: BM25 RANKED RETRIEVAL — the lexical-search half of a
    // data-curation stack (Q-llm-17's TF-IDF scores terms per doc; this
    // ranks DOCS per query, the retrieval primitive behind hard-negative
    // mining and RAG corpus selection). Okapi BM25 (k1=1.2, b=0.75,
    // Lucene's always-positive idf = ln((N-df+0.5)/(df+0.5)+1)). Query
    // set = first-5-word bags of every doc_id % 37 == 5 document.
    // Scale shape: candidates come from the POSTINGS side — tf rows
    // equi-join the tiny broadcast query-term table first, so only
    // matched-term postings ever reach the df/doclen joins (word- and
    // doc-keyed equi-joins); per-(query,doc) scores are partial-agg
    // sums; top-10 is a per-query window. Nothing touches all (q,doc)
    // pairs. Exactness: idf and each term score round at 9 digits, the
    // per-doc sum is an order-free decimal, the final score rounds at 6
    // — ranks compare ROUNDED scores with doc_id tie-break, so both
    // engines order identically.
    "Q-llm-53" -> { (s, d) => bm25Top10(s, d) },

    // ---- Q-llm-54: HYBRID RETRIEVAL via RECIPROCAL RANK FUSION — the
    // standard way production search combines a lexical list (BM25,
    // Q-llm-53's pipeline reused verbatim) with a vector list (codegen
    // cosine top-10, Q-llm-03's envelope): RRF score = Σ 1/(60 + rank)
    // over the lists a doc appears in, rank-based so the two systems'
    // incomparable score scales never mix. Scale shape: both lists are
    // already top-10-per-query (tiny), the fusion is a full-outer join
    // on (query, doc) of two k·|Q|-row sides — the expensive parts are
    // the underlying retrievers, both shuffle-audited. Exactness: the
    // fused sum is two IEEE terms in fixed order, rounded at 9; ranks
    // compare the ROUNDED score with doc_id tie-break.
    "Q-llm-54" -> { (s, d) =>
      graft.functions.CosineSim.register(s)
      val bm = bm25Top10(s, d)
        .select(col("query_id"), col("doc_id"), col("rank").as("bm_rank"))
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") % 37 === 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val vw = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("doc_id"))
      val vec = emb.crossJoin(broadcast(qs))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          expr("cosine_sim(q_emb, embedding)").as("sim"))
        .withColumn("vec_rank", row_number().over(vw).cast("bigint"))
        .filter(col("vec_rank") <= 10)
        .select("query_id", "doc_id", "vec_rank")
      val fusedCol = Portable.r(
        coalesce(lit(1.0) / (lit(60.0) + col("bm_rank").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")),
          lit(0.0)), 9)
      val fw = Window.partitionBy("query_id")
        .orderBy(col("fused").desc, col("doc_id"))
      bm.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          coalesce(col("bm_rank"), lit(-1L)).as("bm_rank"),
          coalesce(col("vec_rank"), lit(-1L)).as("vec_rank"),
          fusedCol.as("fused"))
        .withColumn("rank", row_number().over(fw).cast("bigint"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("bm_rank"), col("vec_rank"), col("fused"))
        .orderBy("query_id", "rank")
    },

    // ---- Q-llm-57: HARD-NEGATIVE MINING — the retrieval-training data
    // generator: for each query, docs the LEXICAL retriever ranks top-10
    // (BM25, Q-llm-53's audited pipeline) that the SEMANTIC retriever
    // does NOT (cosine top-10, Q-llm-03's envelope) are exactly the
    // "lexically close, semantically far" examples a dual-encoder needs
    // as hard negatives (the query's own source doc excluded as the
    // trivial hit). Scale shape: both lists are top-10-per-query; the
    // mining step is a left-anti join of two k·|Q|-row sides — the
    // retrievers are the cost, both shuffle-audited.
    "Q-llm-57" -> { (s, d) =>
      graft.functions.CosineSim.register(s)
      val bm = bm25Top10(s, d)
        .select(col("query_id"), col("doc_id"), col("rank").as("bm_rank"))
      val emb = Tables.embeddings(s, d)
      val qs = emb.filter(col("vec_id") % 37 === 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val vw = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("doc_id"))
      val vec = emb.crossJoin(broadcast(qs))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          expr("cosine_sim(q_emb, embedding)").as("sim"))
        .withColumn("vec_rank", row_number().over(vw))
        .filter(col("vec_rank") <= 10)
        .select("query_id", "doc_id")
      bm.join(vec, Seq("query_id", "doc_id"), "left_anti")
        .filter(col("doc_id") =!= col("query_id"))
        .orderBy("query_id", "bm_rank")
    },

    // ---- Q-llm-55: token-budget MIXTURE PLANNER with upsampling — the
    // step that turns a curated corpus into a training mix: every
    // language is brought toward a target token budget (total/5 here) by
    // REPEATING its docs across epochs (capped at 8 — no source loops
    // forever), then the virtual stream is cut at the budget in the
    // deterministic (epoch, key-hash) order, so the same corpus always
    // yields the same mix. The budget cut needs a running token sum over
    // each language's virtual stream; a naive window puts a whole
    // language in ONE partition, so the prefix sum is TWO-PHASE: order-
    // aligned shards (first hex nibble of the hash follows the global
    // (epoch, md5) order), within-shard running sums in parallel, and a
    // tiny (lang × epoch × 16)-row shard-offset table broadcast back —
    // the 100 TB prefix-sum shape. Integer algebra end to end; the
    // oracle's single-window cum sum must agree exactly.
    "Q-llm-55" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val lt = docs.groupBy("lang").agg(sum("n_chars").as("lt"))
      val tot = docs.agg(sum("n_chars").as("total"))
      val plan = lt.crossJoin(broadcast(tot))
        .withColumn("target", expr("total DIV 5"))
        .withColumn("epochs", least(expr("(target + lt - 1) DIV lt"), lit(8L)))
        .select("lang", "target", "epochs")
      val virt = docs.join(broadcast(plan), "lang")
        .withColumn("epoch", explode(sequence(lit(1L), col("epochs"))))
        .withColumn("h", md5(col("doc_id").cast("string")))
        .withColumn("shard", substring(col("h"), 1, 1))
      val wIn = Window.partitionBy("lang", "epoch", "shard")
        .orderBy("h", "doc_id")
      val wOff = Window.partitionBy("lang").orderBy("epoch", "shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = virt.groupBy("lang", "epoch", "shard")
        .agg(sum("n_chars").as("st"))
        .withColumn("off", coalesce(sum("st").over(wOff), lit(0L)))
        .select("lang", "epoch", "shard", "off")
      virt.withColumn("cum_in", sum("n_chars").over(wIn))
        .join(broadcast(offsets), Seq("lang", "epoch", "shard"))
        .withColumn("cum", col("cum_in") + col("off"))
        .filter(col("cum") - col("n_chars") < col("target"))
        .groupBy("lang", "epoch")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_tokens"))
        .select(col("lang"), col("epoch").cast("bigint").as("epoch"),
          col("n_docs").cast("bigint").as("n_docs"),
          col("n_tokens").cast("bigint").as("n_tokens"))
        .orderBy("lang", "epoch")
    },

    // ---- Q-llm-58: PREFIX-FILTERING set-similarity self-join (the
    // PPJoin family's candidate generator) — the ninth dedup mode, and
    // the one with a COMPLETENESS THEOREM instead of a recall bound:
    // order every doc's shingles by ascending global document frequency
    // (rarest first; (df, sh) is the total order — no global rank
    // shuffle needed), keep only the first n - ceil(τ·n) + 1 as the
    // doc's PREFIX, and equi-join prefixes on the shingle. Any pair
    // with Jaccard ≥ τ MUST share a prefix token (dropping that many of
    // either side's rarest tokens already caps the overlap below τ), so
    // unlike MinHash-LSH (Q-llm-02) or SimHash (Q-llm-06) no true pair
    // can be missed — the oracle proves it by computing the join the
    // NAIVE way (all shared-token pairs, no prefix) and hash-matching.
    // At 100 TB: candidate volume is Σ prefix-df² over RARE tokens only
    // — the frequent shingles that make the naive join quadratic
    // ("the quick brown" in every doc) never enter a prefix, because
    // prefixes keep the RAREST fraction of each doc. All integer
    // algebra (τ = 0.8 as ceil((8n+9)/10); verify as 9·i ≥ 4·(na+nb)),
    // so both engines agree bit-for-bit. Candidate-count reduction vs
    // naive is pinned in LlmOpsSpec; equi-join-only shape in
    // ExplainCheck.
    "Q-llm-58" -> { (s, d) =>
      val sh = shingleRows(Tables.documents(s, d), "doc_id", "text", 3)
        .distinct().persist()
      sh.count() // eager: df table + prefix + both verify sides reuse it
      val dfTab = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      val prefix = sh.join(dfTab, "sh")
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
        .withColumn("pos", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
        .filter(expr("pos <= n - ((8 * n + 9) DIV 10) + 1"))
        .select("doc_id", "sh")
      // hot-token armor: a mega-cluster's shared rare shingle is a hot
      // prefix bucket; the chunked join bounds any key at BUCKET_CAP²
      // rows while emitting the exact same candidate set
      val cand = graft.operators.BucketJoin
        .selfPairs(prefix, Seq("sh"), "doc_id", BUCKET_CAP)
        .select(col("a_doc_id").as("a"), col("b_doc_id").as("b"))
        .distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inter = cand
        .join(sh.select(col("doc_id").as("a"), col("sh")), "a")
        .join(sh.select(col("doc_id").as("b"), col("sh")), Seq("b", "sh"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_inter"))
      inter
        .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), "b")
        .filter(col("n_inter") * 9 >= (col("na") + col("nb")) * 4)
        .select(col("a"), col("b"),
          Portable.r(col("n_inter") /
            (col("na") + col("nb") - col("n_inter")), 6).as("jaccard"))
        .orderBy("a", "b")
    },

    // ---- Q-llm-60: PII scan + redaction — the compliance pass every
    // training corpus runs before release. The synthetic documents
    // carry no PII, so deterministic PII is INJECTED from doc_id (the
    // Q-scan-04 poison-pill discipline): every 7th doc an email, every
    // 11th a NANP phone, every 13th an IPv4 — the oracle constructs the
    // identical augmented text, so detection (regexp_extract_all
    // counts), coverage (docs with any hit), and the redaction itself
    // (chained class regexp_replace; the summed length delta pins every
    // replacement byte) all hash-match. Scale shape: pure per-row
    // narrow map work — regexes run inside whole-stage codegen, the
    // only exchange is the per-source partial agg. Patterns stay in the
    // Java∩RE2 dialect (classes, bounded reps, \b) so both engines
    // match identically.
    "Q-llm-60" -> { (s, d) =>
      val email = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[a-z]{2,}"
      val phone = "\\d{3}-\\d{3}-\\d{4}"
      val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
      val aug = Tables.documents(s, d).withColumn("t", concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 415-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 200).cast("string"),
            lit(" logged"))).otherwise(lit(""))))
      val scanned = aug.select(col("source"),
        size(regexp_extract_all(col("t"), lit(email), lit(0))).as("ne"),
        size(regexp_extract_all(col("t"), lit(phone), lit(0))).as("np"),
        size(regexp_extract_all(col("t"), lit(ip), lit(0))).as("ni"),
        (length(col("t")) - length(
          regexp_replace(
            regexp_replace(
              regexp_replace(col("t"), email, "<EMAIL>"),
              phone, "<PHONE>"),
            ip, "<IP>"))).as("delta"))
      scanned.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("ne")).cast("bigint").as("n_email"),
          sum(col("np")).cast("bigint").as("n_phone"),
          sum(col("ni")).cast("bigint").as("n_ip"),
          sum(when(col("ne") + col("np") + col("ni") > 0, 1L)
            .otherwise(0L)).cast("bigint").as("docs_with_pii"),
          sum(col("delta")).cast("bigint").as("redact_len_delta"))
        .orderBy("source")
    },

    // ---- Q-llm-61: DATA-MIXTURE resampling with FRACTIONAL epochs —
    // the "mix web at 1×, books at 2.5×, code at 4×" op every training
    // run executes. Per-source target epochs come deterministically off
    // the source name (iw = ascii(last char) % 9 + 1 half-epochs, i.e.
    // 0.5×..4.5×); each doc materializes ⌊iw/2⌋ full copies plus — for
    // odd iw — one residual copy kept by a deterministic md5 coin
    // (first hex nibble 0-7 = exactly 1/2, the Q-graph-08/Q-scan-06
    // replayable-sampling discipline, so the oracle replays the very
    // same coin). Integer-only epoch algebra: no float compare decides
    // a row's fate. Scale shape: narrow map + bounded explode (≤ ⌈w⌉
    // copies/row) — upsampling happens at read time, nothing shuffles
    // until the per-source count partial agg; a 100 TB mixture never
    // materializes its repeats to storage.
    "Q-llm-61" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val mixed = docs
        .withColumn("iw",
          (ascii(substring(col("source"), length(col("source")), lit(1)))
            % 9 + 1).cast("long"))
        .withColumn("copies",
          expr("iw DIV 2") +
            when(col("iw") % 2 === 1 &&
              substring(md5(col("doc_id").cast("string")), 1, 1)
                .isin("0", "1", "2", "3", "4", "5", "6", "7"), 1L)
              .otherwise(0L))
      val out = mixed.where(col("copies") > 0)
        .select(col("source"), col("iw"),
          explode(sequence(lit(1L), col("copies"))).as("rep"))
      mixed.groupBy("source", "iw")
        .agg(count(lit(1)).as("n_docs"))
        .join(out.groupBy("source")
          .agg(count(lit(1)).cast("bigint").as("n_out")), Seq("source"))
        .select(col("source"), col("iw").as("half_epochs"),
          col("n_docs").cast("bigint").as("n_docs"), col("n_out"),
          Portable.r(col("n_out") / col("n_docs"), 6).as("realized_epochs"))
        .orderBy("source")
    },

    // ---- Q-llm-62: DSIR-style importance scoring (Xie et al. 2023,
    // "Data Selection for Language Models via Importance Resampling" —
    // public method): every document scored by its unigram
    // LOG-LIKELIHOOD RATIO between a TARGET distribution (a curated
    // seed set — the %19 cohort, same seeding discipline as
    // Q-graph-06) and the raw-corpus distribution, add-1 smoothed over
    // the corpus vocabulary — the importance weight that up-selects
    // "looks like my target domain" data from a 100 TB crawl. Scale
    // shape = Q-llm-28's ledger: token streams collapse map-side to
    // (doc, word, n) before any exchange; both distributions are
    // word-keyed partial aggs off that same collapsed stream; the
    // per-doc score is one more word-keyed join + decimal partial sum;
    // the global top-20 is TakeOrderedAndProject (20 rows per
    // partition cross the wire). Decimal log algebra mirrors Q-llm-28
    // so the ranking hash-matches bit-for-bit.
    "Q-llm-62" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val w = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      val dw = w.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      val cc = dw.groupBy("word").agg(sum(col("n")).as("cc"))
      val tc = dw.filter(col("doc_id") % 19 === 3)
        .groupBy("word").agg(sum(col("n")).as("tc"))
      val freq = cc.join(tc, Seq("word"), "left")
        .select(col("word"), col("cc"), coalesce(col("tc"), lit(0L)).as("tc"))
      val totals = freq.agg(sum(col("cc")).as("ctot"),
        sum(col("tc")).as("ttot"), count(lit(1)).as("v"))
      val term = dw.join(freq, "word")
        .crossJoin(broadcast(totals))
        .select(col("doc_id"), col("n"),
          ((log((col("tc") + 1).cast("double") /
              (col("ttot") + col("v")).cast("double")) -
            log((col("cc") + 1).cast("double") /
              (col("ctot") + col("v")).cast("double")))
            .cast(DecimalType(20, 10)) * col("n").cast(DecimalType(8, 0)))
            .as("llr"))
      term.groupBy("doc_id")
        .agg(sum(col("n")).cast("bigint").as("n_tokens"),
          Portable.r(sum(col("llr")).cast("double") / sum(col("n")), 6)
            .as("mean_llr"))
        .withColumn("is_seed", (col("doc_id") % 19 === 3).cast("boolean"))
        .orderBy(col("mean_llr").desc, col("doc_id"))
        .limit(20)
    },

    // ---- Q-llm-63: MEGA-CLUSTER dedup — the adversarial fixture the
    // dedup family's 100 TB claims are pinned on. Real web corpora have
    // boilerplate pages duplicated 10⁴–10⁶×; uniform synthetic documents
    // never produce that shape, so this query PLANTS it (the Q-scan-04
    // poison-pill discipline): 2048 near-identical variants of one base
    // doc (three appended words each → pairwise Jaccard ≈ n/(n+4) ≈ 1),
    // all landing in the same LSH band buckets. The star-edge cluster
    // path (Q-llm-16's algebra, shared oracle SQL) must resolve them as
    // ONE cluster while emitting O(k) candidate edges — the all-pairs
    // band join would emit k²/2 ≈ 2M pairs from single bucket keys
    // (LlmOpsSpec asserts the candidate-edge count stays linear).
    "Q-llm-63" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(graft.tools.SkewFixtures
        .megaDupVariants(docs.filter(col("doc_id") === 0), k = 2048L))
      val (sh, sigs, bands) = lshFront(s, corpus)
      val star = graft.operators.BucketJoin
        .starEdges(bands, Seq("band_id", "key"), "doc_id")
      val edges = jaccardOn(star, sh, sigs)
        .filter(col("jaccard") >= 0.5).select(col("a"), col("b"))
      val labels = graft.operators.ConnectedComponents
        .minLabel(corpus.select(col("doc_id").as("id")), edges)
      labels.groupBy(col("label").as("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"),
          sum(when(col("id") >= 9000000L, 1L).otherwise(0L)).as("n_planted"))
        .filter(col("cluster_size") > 1)
        .orderBy("cluster_id")
    },

    // ---- Q-llm-64: REPETITION quality rules (the Gopher/MassiveText
    // filter family) — the within-document twin of cross-document dedup:
    // machine-generated and boilerplate text repeats itself, so per doc
    // compute (a) top-word fraction, (b) modal-bigram token coverage,
    // (c) the fraction of 5-gram positions whose gram occurs more than
    // once, and keep docs under all three ceilings. The corpus has no
    // natural 5-gram repetition (measured: dup5 = 0 at every decile), so
    // every 40th doc PLANTS it — its first 10 words appended twice — and
    // the rule must drop exactly the planted docs plus natural top-heavy
    // outliers. All three keep gates are INTEGER algebra (top1·8 ≤ n,
    // top2·20 ≤ n, dup·10 ≤ n−4); the reported fractions are
    // Portable-rounded. Scale shape: the token/gram streams collapse
    // map-side to (doc, gram, count) before any exchange — the same
    // discipline as Q-llm-28's unigram LM; everything downstream is
    // per-doc-bounded.
    "Q-llm-64" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), words(col("text")).as("ws0"))
      val aug = docs
        .withColumn("ws", when(col("doc_id") % 40 === 0,
            concat(col("ws0"), slice(col("ws0"), 1, 10),
              slice(col("ws0"), 1, 10)))
          .otherwise(col("ws0")))
        .select(col("doc_id"), col("ws"),
          size(col("ws")).cast("bigint").as("n"))
      val top1 = aug
        .select(col("doc_id"), col("n"), explode(col("ws")).as("w"))
        .groupBy("doc_id", "n", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n").agg(max("c").as("top1"))
      // size(ws) < 2 would make sequence(1, size-1) DESCEND ([1, 0]) and
      // element_at(ws, 0) throw; the oracle's generate_series(1, 0) is
      // empty and drops the doc via the inner join below — the filter
      // mirrors that drop exactly (a <2-word doc has no bigram row)
      val top2 = aug.filter(size(col("ws")) >= 2)
        .select(col("doc_id"), col("n"), explode(expr(
          "transform(sequence(1, size(ws) - 1)," +
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
          .as("g"))
        .groupBy("doc_id", "n", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id", "n").agg(max("c").as("top2"))
      val dup5 = aug.filter(size(col("ws")) >= 5)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 4)," +
            " i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)," +
            " element_at(ws, i + 2), element_at(ws, i + 3)," +
            " element_at(ws, i + 4)))")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_pos"))
      top1.join(top2, Seq("doc_id", "n"))
        .join(dup5, Seq("doc_id"), "left")
        .na.fill(0L, Seq("dup_pos"))
        .select(col("doc_id"), col("n").as("n_tokens"),
          Portable.r(col("top1") / col("n"), 6).as("top_word_frac"),
          Portable.r(col("top2") * 2 / col("n"), 6).as("top_bigram_frac"),
          Portable.r(col("dup_pos") / greatest(col("n") - 4, lit(1L)), 6)
            .as("dup_5gram_frac"),
          (col("top1") * 8 <= col("n") && col("top2") * 20 <= col("n") &&
            col("dup_pos") * 10 <= col("n") - 4).as("keep"))
        .orderBy("doc_id")
    },

    // ---- Q-llm-65: DEDUP SAVINGS REPORT — the artifact a 100 TB dedup
    // run actually publishes before anyone deletes anything: per cluster
    // size, how many clusters exist, how many docs they hold, their
    // total bytes, and the bytes REMOVABLE by keeping one representative
    // per cluster. Built on the same verified star-edge clusters as
    // Q-llm-16 (shared algebra, shared oracle CTEs), so the report and
    // the dedup itself can never disagree. Scale shape: everything after
    // the cluster labels is two partial-agg groupBys over (doc → label)
    // rows — no join wider than the label attach.
    "Q-llm-65" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val (sh, sigs, bands) = lshFront(s, docs)
      val star = graft.operators.BucketJoin
        .starEdges(bands, Seq("band_id", "key"), "doc_id")
      val edges = jaccardOn(star, sh, sigs)
        .filter(col("jaccard") >= 0.5).select(col("a"), col("b"))
      val labels = graft.operators.ConnectedComponents
        .minLabel(docs.select(col("doc_id").as("id")), edges)
      labels
        .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("sz"),
          sum(col("n_chars")).as("chars"),
          sum(when(col("id") =!= col("label"), col("n_chars"))
            .otherwise(0L)).as("removable"))
        .groupBy(col("sz").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("sz")).as("n_docs"),
          sum(col("chars")).cast("bigint").as("n_chars"),
          sum(col("removable")).cast("bigint").as("chars_removable"))
        .orderBy("cluster_size")
    },

    // ---- Q-llm-66: incremental dedup against a PERSISTED signature
    // index — the production shape Q-llm-24 stops short of: Q-llm-24
    // re-shingles the whole corpus every batch, but a 100 TB pipeline
    // stores each document's band signatures ONCE (an ACID TxTable, one
    // commit per ingest batch) and every later batch probes the index —
    // per-batch cost = shingle the NEW docs + one bipartite band join
    // against the planner-integrated `format("graft")` read. Scoring is
    // index-resident too: candidate strength = number of agreeing bands
    // (≥ 2 of 6 here; P[band match] ≈ jaccard for 1-row bands), so the
    // probe never touches corpus text at all. The oracle replays the
    // identical signature algebra from the documents table — the index
    // is a deterministic function of the corpus, so storing it changes
    // nothing the hash can see. Hot-bucket armor rides along
    // (bipartitePairs, ≤ cap² per join key).
    "Q-llm-66" -> { (s, d) =>
      import graft.operators.TxTable
      val root = tempDir("graft_llm66").toString + "/sigidx"
      val docs = Tables.documents(s, d)
      // one-time ingest (the index build): ONLY corpus docs are shingled
      // here, and never again — signatures are per-doc, so the split
      // passes produce exactly the signatures one full pass would
      val (_, _, corpusBands) =
        lshFront(s, docs.filter(col("doc_id") % 5 =!= 0))
      TxTable.create(
        corpusBands
          .select(col("doc_id"), col("band_id").cast("long").as("band_id"),
            col("key"))
          .repartition(4),
        root, statsKey = Some("band_id"))
      // per-batch probe: ONLY the new batch is shingled; the corpus side
      // is the stored index through the planner-integrated graft read
      val (_, _, newBands) =
        lshFront(s, docs.filter(col("doc_id") % 5 === 0))
      probeSigIndex(s.read.format("graft").load(root),
        newBands.select(col("doc_id"),
          col("band_id").cast("long").as("band_id"), col("key")))
        .orderBy("new_doc")
    },

    // ---- Q-llm-67: the CLOSED index lifecycle — the loop a production
    // ingest pipeline actually runs: probe batch 1 against the stored
    // signature index, ADMIT its survivors (docs with no index match)
    // by appending their already-computed signatures in ONE TxTable
    // commit, then probe batch 2 against the UPDATED index — batch-2
    // dups of an admitted batch-1 doc resolve to that doc, proving the
    // admit landed. No document is ever shingled twice (corpus at
    // build, each batch at its probe; survivors re-use the probe's
    // signatures), and no intra-batch dedup happens at admit time (two
    // batch-1 near-dups of each other but not of the corpus BOTH enter
    // — the oracle replays exactly that). Scale shape: per-batch
    // exchange ∝ batch ([[probeSigIndex]]'s broadcast bucket
    // prefilter), admit cost = one append commit of |survivor
    // signatures| rows; the corpus contributes only the 2-column
    // columnar index scan — ScaleCurve `dedup-index-batch` pins the
    // flat-shuffle claim at corpus ×8.
    "Q-llm-67" -> { (s, d) =>
      import graft.operators.TxTable
      val root = tempDir("graft_llm67").toString + "/sigidx"
      val docs = Tables.documents(s, d)
      def bandsOf(pred: org.apache.spark.sql.Column) = {
        val (_, _, b) = lshFront(s, docs.filter(pred))
        b.select(col("doc_id"),
          col("band_id").cast("long").as("band_id"), col("key"))
      }
      // ingest: corpus = everything outside the two probe batches
      TxTable.create(
        bandsOf(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 3)
          .repartition(4),
        root, statsKey = Some("band_id"))
      // batch 1: probe, then admit the survivors' signatures (one commit)
      val b1 = bandsOf(col("doc_id") % 5 === 0).persist()
      // r1 stays cached for the LIFETIME of the returned DataFrame: the
      // count() below pins its contents from BEFORE the admit mutates
      // the index, and `out` re-reads it when the caller executes — an
      // in-query unpersist would let a recompute see the post-admit
      // index and change the answer. b1, by contrast, is fully consumed
      // inside this builder (probe + admit anti-join), so it IS dropped
      // below; r1 is reclaimed by the harness cache sweep (Bench/Verify/
      // ShuffleCheck) — the same documented reliance as hammingClusters'
      // fingerprint cache.
      val r1 = probeSigIndex(s.read.format("graft").load(root), b1)
        .persist()
      r1.count()  // materialize BEFORE the admit mutates the index
      TxTable.append(s, root,
        b1.join(r1.select(col("new_doc").as("doc_id")),
          Seq("doc_id"), "left_anti").repartition(2))
      // batch 2 probes the UPDATED index (corpus + admitted survivors)
      val r2 = probeSigIndex(s.read.format("graft").load(root),
        bandsOf(col("doc_id") % 5 === 3))
      val out = r1.withColumn("batch", lit(1L))
        .unionByName(r2.withColumn("batch", lit(2L)))
        .select(col("batch"), col("new_doc"), col("dup_of"), col("n_bands"))
        .orderBy("batch", "new_doc")
      b1.unpersist()
      out
    }
  )

  /** Probe a persisted band-signature index with a new batch's bands:
    * candidate strength = number of agreeing bands (≥ 2 of [[BANDS]]),
    * best match per new doc. PER-BATCH EXCHANGE ∝ BATCH: the index is
    * first reduced to the buckets the probe actually touches via a
    * broadcast semi-join on (band_id, key) — the corpus-sized index
    * side never shuffles (without this, bipartitePairs' bucket-count
    * window pass would re-shuffle the ENTIRE index every batch); only
    * the ∝-batch bucket hits enter the window + chunked join, and the
    * hot-bucket armor still bounds any single join key at cap² rows.
    * (If a batch ever outgrows the broadcast threshold, the same
    * prefilter is expressible as a runtime bloom filter on the scan —
    * the Q-join-13 machinery.) */
  private[graft] def probeSigIndex(index: DataFrame, probe: DataFrame)
      : DataFrame = {
    val hit = index.join(
      broadcast(probe.select("band_id", "key").distinct()),
      Seq("band_id", "key"), "leftsemi")
    val scored = graft.operators.BucketJoin
      .bipartitePairs(
        probe.withColumn("__new", lit(true))
          .unionByName(hit.withColumn("__new", lit(false))),
        col("__new"), Seq("band_id", "key"), "doc_id", BUCKET_CAP)
      .groupBy(col("a_doc_id").as("new_doc"), col("b_doc_id").as("dup_of"))
      .agg(count(lit(1)).as("n_bands"))
      .filter(col("n_bands") >= 2)
    val w = Window.partitionBy("new_doc")
      .orderBy(col("n_bands").desc, col("dup_of"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("new_doc"), col("dup_of"), col("n_bands"))
  }

  /** Okapi BM25 top-10 per query (shared by Q-llm-53 and the RRF hybrid
    * Q-llm-54) — see Q-llm-53's registry comment for the scale shape. */
  /** BM25 top-10, DOCUMENT-AT-A-TIME: the corpus never shuffles. Term
    * statistics (df → idf for the query vocabulary, the global avgdl,
    * the query list itself) are tiny aggregates broadcast back as 1-row
    * map/array columns; each doc row then scores every matching query
    * ENTIRELY map-side (tf from its own word array, O(1) map lookups per
    * query term), and the only corpus-scale exchange left is the partial
    * top-10 per query (WindowGroupLimit forwards ≤ 10 rows per query per
    * partition). The df count itself dedups per doc MAP-SIDE
    * (array_distinct before explode), so its partial agg ships ≤ |query
    * vocab| rows per partition — round-5's ledger admission (stopword
    * postings ≈ the stream crossing the wire) is gone: shuffle is now
    * k·|Q|·partitions, not Σ df(t). Arithmetic is bit-identical to the
    * previous posting-join form (same rounded idf, same nrm, same
    * decimal term-score sum), so the top-10 hash is unchanged. */
  private def bm25Top10(s: org.apache.spark.sql.SparkSession,
                        d: String): DataFrame = {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), words(col("text")).as("ws"))
      val dl = toks.select(size(col("ws")).cast("double").as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        Portable.davg(col("dl"), 6).as("avgdl"))
      val qt = toks.filter(col("doc_id") % 37 === 5)
        .select(col("doc_id").as("query_id"),
          explode(slice(col("ws"), 1, 5)).as("word"))
        .distinct()
      // corpus-wide df of the query vocabulary: per-doc dedup happens in
      // the map (array_distinct), the broadcast semi-join drops non-query
      // words before the agg, and the count's partial combine leaves an
      // exchange of ≤ |query vocab| rows per partition
      val dfc = toks
        .select(explode(array_distinct(col("ws"))).as("word"))
        .join(broadcast(qt.select("word").distinct()), "word")
        .groupBy("word").agg(count(lit(1)).as("df"))
      val idfc = dfc.crossJoin(broadcast(stats))
        .select(col("word"), Portable.r(
          log((col("n_docs") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0)), 9).as("idf"))
      // The scoring kernel is the Lucene-style inverted QUERY index probed
      // document-at-a-time — genuine per-partition imperative logic (the
      // declarative renderings tried first either shuffle Σ df(t) postings
      // [the round-5 ledger's admission] or burn |D|·|Q| interpreted
      // higher-order-function evaluations per row; HOFs never enter
      // whole-stage codegen), so this is the survey's sanctioned
      // mapPartitions case. The broadcast state is query-batch-bounded
      // (word → [(query, idf)], like the k-means centroid model), and the
      // arithmetic reuses Spark's own Decimal class so every rounding is
      // bit-identical to the posting-join form the oracle hash pinned.
      import org.apache.spark.sql.types.Decimal
      val w2qRows = qt.join(idfc, "word")
        .select(col("word"), col("query_id"), col("idf"))
        .collect() // bounded by the query batch (|Q| x <= 5 terms)
      val w2q: Map[String, Array[(Long, Double)]] = w2qRows
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (w, g) =>
          w -> g.map(t => (t._2, t._3)) }
      val avgdlVal = stats.collect()(0).getDouble(1)
      val bIdx = s.sparkContext.broadcast((w2q, avgdlVal))
      import s.implicits._
      val scored = toks.select(col("doc_id"), col("ws"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val (idx, avgdl) = bIdx.value
          it.flatMap { case (docId, ws) =>
            val dl = ws.size.toDouble
            // tf of query-vocabulary words only
            val tf = scala.collection.mutable.HashMap.empty[String, Int]
            ws.foreach { w =>
              if (idx.contains(w)) tf.update(w, tf.getOrElse(w, 0) + 1) }
            // per matching query: matched-term count + exact decimal sum
            // of the rounded term scores (same ops as the SQL rendering:
            // nrm in doubles, round-9, cast to DECIMAL(30,10), exact add)
            val acc = scala.collection.mutable
              .HashMap.empty[Long, (Long, java.math.BigDecimal)]
            tf.foreach { case (w, n) =>
              val nrm = (n.toDouble * 2.2) /
                (n.toDouble + 1.2 * (0.25 + 0.75 * dl / avgdl))
              idx(w).foreach { case (qid, idf) =>
                val ts = math.floor(idf * nrm * 1e9 + 0.5) / 1e9
                val d = Decimal(ts)
                d.changePrecision(30, 10) // = CAST(ts AS DECIMAL(30,10))
                val (cnt, sum) = acc.getOrElse(qid,
                  (0L, java.math.BigDecimal.ZERO))
                acc.update(qid, (cnt + 1, sum.add(d.toJavaBigDecimal)))
              }
            }
            acc.iterator.map { case (qid, (cnt, sum)) =>
              (qid, docId, cnt,
                math.floor(sum.doubleValue * 1e6 + 0.5) / 1e6)
            }
          }
        }
        .toDF("query_id", "doc_id", "n_terms", "score")
      val rk = Window.partitionBy("query_id")
        .orderBy(col("score").desc, col("doc_id"))
      scored.withColumn("rank", row_number().over(rk).cast("bigint"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          col("n_terms"), col("score"))
        .orderBy("query_id", "rank")
  }

  // shared SQL fragments (DuckDB dialect)
  private val wordsSql = "str_split(text, ' ')"
  private def shinglesSql(n: Int) =
    s"""CASE WHEN len(ws) >= $n THEN list_transform(
          generate_series(1, len(ws) - ${n - 1}),
          i -> ${(0 until n).map(k => s"ws[i + $k]").mkString(" || ' ' || ")})
        ELSE [] END"""

  // Q-llm-02's full oracle SQL, shared: Q-llm-16 embeds it as the edge
  // source so the cluster oracle is built on the exact pair algebra
  private lazy val llm02Sql: String =
    s"""WITH sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(${shinglesSql(3)}) AS sh
             FROM (SELECT doc_id, $wordsSql AS ws FROM documents))),
         sigs AS (
           SELECT doc_id, b, min(md5(b || ':' || sh)) AS key
           FROM sh, (SELECT unnest(generate_series(0, ${BANDS - 1})) AS b)
           GROUP BY doc_id, b),
         cand AS (
           SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM sigs x JOIN sigs y
             ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT c.a, c.b, count(*) AS n_inter
           FROM cand c
           JOIN sh sa ON sa.doc_id = c.a
           JOIN sh sb ON sb.doc_id = c.b AND sb.sh = sa.sh
           GROUP BY c.a, c.b)
         SELECT c.a, c.b,
                ${Portable.rSql(
                  "coalesce(i.n_inter, 0) / (za.n_sh + zb.n_sh - coalesce(i.n_inter, 0))", 6)}
                  AS jaccard
         FROM cand c
         LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
         JOIN sizes za ON za.doc_id = c.a
         JOIN sizes zb ON zb.doc_id = c.b"""

  /** Q-llm-16/63's star-edge dedup algebra, shared (DuckDB CTE chain,
    * caller supplies the corpus relation and closes the WITH): per
    * (band, key) bucket every member links to the bucket's min doc_id,
    * edges are verified by exact shingle-set Jaccard ≥ 0.5 — the O(k)
    * candidate graph the Spark side builds via BucketJoin.starEdges. */
  private def starEdgeSql(corpus: String): String =
    s"""sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(${shinglesSql(3)}) AS sh
             FROM (SELECT doc_id, $wordsSql AS ws FROM $corpus))),
         sigs AS (
           SELECT doc_id, b, min(md5(b || ':' || sh)) AS key
           FROM sh, (SELECT unnest(generate_series(0, ${BANDS - 1})) AS b)
           GROUP BY doc_id, b),
         star AS (
           SELECT DISTINCT m AS a, doc_id AS b FROM (
             SELECT doc_id, min(doc_id) OVER (PARTITION BY b, key) AS m
             FROM sigs) WHERE doc_id <> m),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT c.a, c.b, count(*) AS n_inter
           FROM star c
           JOIN sh sa ON sa.doc_id = c.a
           JOIN sh sb ON sb.doc_id = c.b AND sb.sh = sa.sh
           GROUP BY c.a, c.b),
         edges AS (
           SELECT c.a, c.b
           FROM star c
           LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
           JOIN sizes za ON za.doc_id = c.a
           JOIN sizes zb ON zb.doc_id = c.b
           WHERE ${Portable.rSql(
             "coalesce(i.n_inter, 0) / (za.n_sh + zb.n_sh - coalesce(i.n_inter, 0))",
             6)} >= 0.5),
         sym AS (SELECT a AS x, b AS y FROM edges
                 UNION ALL SELECT b, a FROM edges),
         reach(src, node) AS (
           SELECT doc_id, doc_id FROM $corpus
           UNION
           SELECT r.src, s.y FROM reach r JOIN sym s ON s.x = r.node),
         comp AS (SELECT src AS doc_id, min(node) AS cluster_id
                  FROM reach GROUP BY src),
         sz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                FROM comp GROUP BY cluster_id)"""

  /** The greedy left-to-right BPE merge fold over the space-separated
    * symbol string `s`, as a Spark SQL expression: glue x onto acc when
    * acc's LAST token is `a` and x is `b` (tokens are [a-z]+ only, so the
    * LIKE needs no escaping). DuckDB's list_reduce mirrors it exactly. */
  private def bpeMergeExpr(a: String, b: String): String =
    s"""aggregate(slice(split(s, ' '), 2, size(split(s, ' ')) - 1),
        split(s, ' ')[0],
        (acc, x) -> CASE WHEN x = '$b'
                          AND (acc = '$a' OR acc LIKE '% $a')
                    THEN concat(substr(acc, 1, length(acc) - ${a.length}), '$a$b')
                    ELSE concat(acc, ' ', x) END)"""

  /** BPE merge training (Q-llm-38's loop): one corpus-wide word-frequency
    * aggregation, then `rounds` driver-coordinated iterations over the
    * bounded top-2000 vocabulary. Returns (round, a, b, count). */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, d: String,
                       rounds: Int = 4): Seq[(Long, String, String, Long)] = {
    val words = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")).between(2, 12))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(2000)
    var cur = words.select(col("word"), col("freq"),
      trim(regexp_replace(col("word"), "(.)", "$1 ")).as("s"))
      .localCheckpoint(true) // rounds re-scan cur; never re-run the corpus agg
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val win = cur
        .select(col("freq"), split(col("s"), " ").as("t"))
        .select(col("freq"), expr(
          "explode(transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS a, t[i] AS b)))").as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()(0)
      val (a, b, cnt) = (win.getString(0), win.getString(1), win.getLong(2))
      merges += ((r.toLong, a, b, cnt))
      cur = cur.select(col("word"), col("freq"),
        expr(bpeMergeExpr(a, b)).as("s")).localCheckpoint(true)
    }
    merges.toSeq
  }

  // Q-llm-38's oracle: the same 4-round BPE training loop, each round a
  // chained CTE block — pair counting over the vocab seqs, total-ordered
  // winner, then the IDENTICAL greedy fold (list_reduce) the Spark side
  // runs through aggregate().
  private def bpeRoundSql(i: Int): String =
    s"""p$i AS (
         SELECT t[j] AS a, t[j+1] AS b, sum(freq)::BIGINT AS cnt
         FROM (SELECT freq, str_split(s, ' ') AS t FROM r${i - 1}),
              LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS j)
         GROUP BY 1, 2),
       w$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
       r$i AS (
         SELECT word, freq,
                list_reduce(str_split(s, ' '),
                  (acc, x) -> CASE WHEN x = w$i.b
                                    AND (acc = w$i.a OR ends_with(acc, ' ' || w$i.a))
                              THEN substr(acc, 1, len(acc) - len(w$i.a)) || w$i.a || w$i.b
                              ELSE acc || ' ' || x END) AS s
         FROM r${i - 1} CROSS JOIN w$i)"""

  private val bpeSql: String =
    s"""WITH words AS (
          SELECT w AS word, count(*)::BIGINT AS freq
          FROM (SELECT unnest(str_split_regex(lower(text), '[^a-z]+')) AS w
                FROM documents)
          WHERE len(w) BETWEEN 2 AND 12
          GROUP BY 1 ORDER BY freq DESC, word LIMIT 2000),
        r0 AS (SELECT word, freq,
                      trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s
               FROM words),
        ${(1 to 4).map(bpeRoundSql).mkString(",\n        ")}
        SELECT * FROM (
          ${(1 to 4).map(i =>
            s"SELECT ${i}::BIGINT AS round, a || ' ' || b AS pair, cnt FROM w$i")
            .mkString("\n          UNION ALL ")})
        ORDER BY round"""

  // Q-llm-39's oracle: train as in bpeSql (w1..w4), then APPLY the same
  // fold to the distinct corpus words and roll up per doc.
  private def bpeApplySql(i: Int): String =
    s"""a$i AS (
         SELECT word,
                list_reduce(str_split(s, ' '),
                  (acc, x) -> CASE WHEN x = w$i.b
                                    AND (acc = w$i.a OR ends_with(acc, ' ' || w$i.a))
                              THEN substr(acc, 1, len(acc) - len(w$i.a)) || w$i.a || w$i.b
                              ELSE acc || ' ' || x END) AS s
         FROM a${i - 1} CROSS JOIN w$i)"""

  private val bpeApplyFullSql: String =
    s"""WITH words AS (
          SELECT w AS word, count(*)::BIGINT AS freq
          FROM (SELECT unnest(str_split_regex(lower(text), '[^a-z]+')) AS w
                FROM documents)
          WHERE len(w) BETWEEN 2 AND 12
          GROUP BY 1 ORDER BY freq DESC, word LIMIT 2000),
        r0 AS (SELECT word, freq,
                      trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s
               FROM words),
        ${(1 to 4).map(bpeRoundSql).mkString(",\n        ")},
        dw AS (
          SELECT doc_id, w AS word, count(*)::BIGINT AS n
          FROM (SELECT doc_id,
                       unnest(str_split_regex(lower(text), '[^a-z]+')) AS w
                FROM documents)
          WHERE len(w) BETWEEN 2 AND 12
          GROUP BY 1, 2),
        a0 AS (SELECT word,
                      trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS s
               FROM (SELECT DISTINCT word FROM dw)),
        ${(1 to 4).map(bpeApplySql).mkString(",\n        ")},
        sub AS (SELECT word, len(str_split(s, ' '))::BIGINT AS n_sub FROM a4)
        SELECT doc_id,
               sum(n)::BIGINT AS n_words,
               sum(n * n_sub)::BIGINT AS n_subtokens,
               ${Portable.rSql("CAST(sum(n * n_sub) AS DOUBLE) / sum(n)", 6)}
                 AS ratio
        FROM dw JOIN sub USING (word)
        GROUP BY doc_id ORDER BY doc_id"""

  val oracle: Map[String, String] = Map(
    // the recall bound is a TRUE literal on the oracle side — the Spark
    // query MEASURES it, so a hash mismatch = an ANN recall regression
    "Q-llm-08" ->
      """SELECT DISTINCT vec_id::BIGINT AS query_id,
                CAST(10 AS BIGINT) AS n_exact, TRUE AS recall_ge_04
         FROM embeddings WHERE vec_id < 5 ORDER BY query_id""",
    "Q-llm-38" -> bpeSql,
    "Q-llm-39" -> bpeApplyFullSql,
    // lexical top-10 anti-joined with the semantic top-10, self-hit
    // excluded — the identical two retriever renderings as Q-llm-53/54
    "Q-llm-57" ->
      s"""WITH $bm25Ctes,
            bm AS (SELECT query_id, doc_id, rnk AS bm_rank
                   FROM rk WHERE rnk <= 10),
            vq AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id % 37 = 5),
            vs AS (SELECT vq.query_id, e.vec_id AS doc_id,
                          ${Portable.cosSql("e.embedding", "vq.qv")} AS sim
                   FROM embeddings e, vq),
            vrk AS (SELECT query_id, doc_id, row_number() OVER (
                      PARTITION BY query_id ORDER BY sim DESC, doc_id)
                      AS vec_rank
                    FROM vs),
            vec AS (SELECT query_id, doc_id FROM vrk WHERE vec_rank <= 10)
          SELECT bm.query_id, bm.doc_id, bm.bm_rank::BIGINT AS bm_rank
          FROM bm ANTI JOIN vec
            ON bm.query_id = vec.query_id AND bm.doc_id = vec.doc_id
          WHERE bm.doc_id <> bm.query_id
          ORDER BY query_id, bm_rank""",
    // single-window cumulative sum over the identical (epoch, md5, id)
    // order — must agree exactly with the engine's two-phase prefix sum
    "Q-llm-55" ->
      """WITH docs AS (SELECT doc_id, lang, n_chars FROM documents),
         lt AS (SELECT lang, sum(n_chars) AS lt FROM docs GROUP BY lang),
         tot AS (SELECT sum(n_chars) AS total FROM docs),
         plan AS (
           SELECT lang, total // 5 AS target,
                  least((total // 5 + lt - 1) // lt, 8) AS epochs
           FROM lt CROSS JOIN tot),
         virt AS (
           SELECT d.doc_id, d.lang, d.n_chars, p.target,
                  e.range + 1 AS epoch
           FROM docs d JOIN plan p ON d.lang = p.lang
           CROSS JOIN range(8) e WHERE e.range < p.epochs),
         cumd AS (
           SELECT *, sum(n_chars) OVER (PARTITION BY lang
                    ORDER BY epoch, md5(doc_id::VARCHAR), doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum
           FROM virt)
         SELECT lang, epoch::BIGINT AS epoch, count(*)::BIGINT AS n_docs,
                sum(n_chars)::BIGINT AS n_tokens
         FROM cumd WHERE cum - n_chars < target
         GROUP BY lang, epoch ORDER BY lang, epoch""",
    "Q-llm-42" -> {
      def dsum9(x: String) = Portable.dsumSql(s"floor(($x) * 1e9 + 0.5) / 1e9")
      // each CTE references its predecessor EXACTLY ONCE (weights carried
      // as columns through a cross join, re-read via max()) — a scalar
      // subquery per weight re-binds the whole upstream chain at every
      // reference, which DuckDB's binder expands exponentially
      val rounds = (1 to LR_ITERS).map { k =>
        val prev = s"w${k - 1}"
        s"""s$k AS (
              SELECT w.w0, w.w1, w.w2, w.w3, f.y, f.z1, f.z2, f.z3,
                     1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.z1 +
                                        w.w2 * f.z2 + w.w3 * f.z3))) AS sig
              FROM zf f CROSS JOIN $prev w),
            g$k AS (
              SELECT max(w0) AS w0, max(w1) AS w1,
                     max(w2) AS w2, max(w3) AS w3,
                     ${dsum9("sig - y")} AS g0,
                     ${dsum9("(sig - y) * z1")} AS g1,
                     ${dsum9("(sig - y) * z2")} AS g2,
                     ${dsum9("(sig - y) * z3")} AS g3,
                     count(*)::DOUBLE AS n
              FROM s$k),
            w$k AS (
              SELECT w0 - 8.0 * (g0 / n) AS w0,
                     w1 - 8.0 * (g1 / n) AS w1,
                     w2 - 8.0 * (g2 / n) AS w2,
                     w3 - 8.0 * (g3 / n) AS w3
              FROM g$k)"""
      }.mkString(",\n")
      val wf = s"w$LR_ITERS"
      val stop = "len(list_filter(string_split(text, ' '), " +
        "w -> list_contains(['the','a','of','to','and'], w)))"
      s"""WITH f0 AS (
            SELECT doc_id,
                   ${Portable.rSql("strlen(text)::DOUBLE / len(string_split(text, ' '))", 6)} AS x1,
                   ${Portable.rSql(s"$stop::DOUBLE / len(string_split(text, ' '))", 6)} AS x2,
                   ${Portable.rSql("len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' '))", 6)} AS x3
            FROM documents),
          f1 AS (
            SELECT *, CASE WHEN x1 <= 6.0 AND x2 >= 0.04
                           THEN 1.0 ELSE 0.0 END AS y FROM f0),
          mu AS (
            SELECT ${Portable.rSql(Portable.dsumSql("x1") + " / count(*)::DOUBLE", 6)} AS m1,
                   ${Portable.rSql(Portable.dsumSql("x2") + " / count(*)::DOUBLE", 6)} AS m2,
                   ${Portable.rSql(Portable.dsumSql("x3") + " / count(*)::DOUBLE", 6)} AS m3,
                   count(*)::DOUBLE AS n
            FROM f1),
          sd AS (
            SELECT ${Portable.rSql("sqrt(" + Portable.dsumSql("(x1 - (SELECT m1 FROM mu)) * (x1 - (SELECT m1 FROM mu))") + " / (SELECT n FROM mu))", 6)} AS s1,
                   ${Portable.rSql("sqrt(" + Portable.dsumSql("(x2 - (SELECT m2 FROM mu)) * (x2 - (SELECT m2 FROM mu))") + " / (SELECT n FROM mu))", 6)} AS s2,
                   ${Portable.rSql("sqrt(" + Portable.dsumSql("(x3 - (SELECT m3 FROM mu)) * (x3 - (SELECT m3 FROM mu))") + " / (SELECT n FROM mu))", 6)} AS s3
            FROM f1),
          zf AS (
            SELECT doc_id, y,
                   ${Portable.rSql("(x1 - (SELECT m1 FROM mu)) / (SELECT s1 FROM sd)", 6)} AS z1,
                   ${Portable.rSql("(x2 - (SELECT m2 FROM mu)) / (SELECT s2 FROM sd)", 6)} AS z2,
                   ${Portable.rSql("(x3 - (SELECT m3 FROM mu)) / (SELECT s3 FROM sd)", 6)} AS z3
            FROM f1),
          w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
          $rounds
          SELECT doc_id, y::BIGINT AS y,
                 p, p >= 0.5 AS pred,
                 (p >= 0.5) = (y = 1.0) AS correct
          FROM (SELECT f.doc_id, f.y,
                       ${Portable.rSql(
                         "1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.z1 + " +
                         "w.w2 * f.z2 + w.w3 * f.z3)))", 6)} AS p
                FROM zf f CROSS JOIN $wf w)
          ORDER BY doc_id"""
    },
    "Q-llm-41" ->
      s"""WITH base AS (
           SELECT doc_id, lang,
                  regexp_replace(lower(text || ' ' || repeat('xq' || lang || ' ', 3)),
                                 '[^a-z]+', ' ', 'g') AS t,
                  substr(md5('nb42:' || doc_id), 1, 2) < 'cc' AS is_train
           FROM documents),
         base2 AS (SELECT * FROM base WHERE strlen(t) >= 2),
         bg AS (
           SELECT doc_id, lang, is_train, substr(t, i, 2) AS b
           FROM base2, UNNEST(generate_series(1, strlen(t) - 1)) AS g(i)),
         tc AS (SELECT lang, b, count(*) AS c FROM bg WHERE is_train
                GROUP BY lang, b),
         lt AS (SELECT lang, sum(c) AS tot FROM tc GROUP BY lang),
         v AS (SELECT count(DISTINCT b)::DOUBLE AS vn FROM tc),
         nd AS (SELECT count(*)::DOUBLE AS n FROM base2 WHERE is_train),
         ld AS (SELECT lang, count(*) AS n_docs FROM base2 WHERE is_train
                GROUP BY lang),
         ls AS (
           SELECT l.lang,
                  CAST(ln(ld.n_docs::DOUBLE / (SELECT n FROM nd))
                       AS DECIMAL(20,10)) AS prior,
                  CAST(ln(1.0 / (l.tot::DOUBLE + (SELECT vn FROM v)))
                       AS DECIMAL(20,10)) AS lp_unseen,
                  l.tot::DOUBLE + (SELECT vn FROM v) AS denom
           FROM lt l JOIN ld USING (lang)),
         model AS (
           SELECT tc.lang, tc.b,
                  CAST(ln((tc.c::DOUBLE + 1.0) / ls.denom)
                       AS DECIMAL(20,10)) AS lp
           FROM tc JOIN ls USING (lang)),
         tbg AS (SELECT doc_id, b, count(*)::DECIMAL(8,0) AS n
                 FROM bg WHERE NOT is_train GROUP BY doc_id, b),
         scored AS (
           SELECT t.doc_id, ls.lang AS cl,
                  max(ls.prior) + sum(t.n * COALESCE(m.lp, ls.lp_unseen)) AS score
           FROM tbg t CROSS JOIN ls
                LEFT JOIN model m ON m.lang = ls.lang AND m.b = t.b
           GROUP BY t.doc_id, ls.lang),
         pred AS (
           SELECT doc_id, cl, score,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cl) AS rk
           FROM scored)
         SELECT b.doc_id, b.lang, p.cl AS pred, b.lang = p.cl AS correct,
                ${Portable.rSql("p.score::DOUBLE", 6)} AS score
         FROM (SELECT doc_id, lang FROM base2 WHERE NOT is_train) b
         JOIN pred p ON b.doc_id = p.doc_id AND p.rk = 1
         ORDER BY b.doc_id""",
    "Q-llm-40" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 3000000 AS doc_id,
                  array_to_string(list_slice(string_split(text, ' '), 4, 31), ' ')
                    || ' unique tail ' || doc_id AS text
           FROM documents
           WHERE doc_id % 97 = 0 AND len(string_split(text, ' ')) >= 31),
         toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
         wins AS (
           SELECT doc_id, i - 1 AS pos,
                  md5(array_to_string(list_slice(ws, i, i + 9), ' ')) AS fp
           FROM toks, UNNEST(generate_series(1, len(ws) - 9)) AS g(i)),
         dup AS (SELECT fp FROM wins GROUP BY fp
                 HAVING count(DISTINCT doc_id) >= 2),
         cov AS (SELECT DISTINCT w.doc_id, g.p
                 FROM wins w JOIN dup USING (fp),
                      UNNEST(generate_series(w.pos, w.pos + 9)) AS g(p)),
         nd AS (SELECT doc_id, count(*) AS n FROM cov GROUP BY doc_id)
         SELECT t.doc_id,
                len(t.ws)::BIGINT AS n_tokens,
                COALESCE(nd.n, 0)::BIGINT AS n_dup_tokens,
                ${Portable.rSql("COALESCE(nd.n, 0)::DOUBLE / len(t.ws)", 9)} AS dup_ratio
         FROM toks t LEFT JOIN nd USING (doc_id) ORDER BY t.doc_id""",
    "Q-llm-34" -> {
      val nStop = "len(list_intersect(list_distinct(ws), ['the','a','of','to','and']))"
      val meanLen = "CAST(list_sum(list_transform(ws, w -> strlen(w))) AS DOUBLE) / len(ws)"
      s"""SELECT doc_id,
                $nStop::BIGINT AS n_stop_distinct,
                ${Portable.rSql(meanLen, 6)} AS mean_word_len,
                ($nStop >= 2 AND $meanLen >= 3.0 AND $meanLen <= 10.0) AS keep
         FROM (SELECT doc_id, $wordsSql AS ws FROM documents)
         ORDER BY doc_id"""
    },
    "Q-llm-32" ->
      """WITH ranked AS (
           SELECT doc_id,
                  lower(source) || '.example.com' AS domain,
                  row_number() OVER (
                    PARTITION BY lower(source) || '.example.com'
                    ORDER BY md5('cap42:' || doc_id), doc_id) AS rk
           FROM documents)
         SELECT doc_id, domain, rk::BIGINT AS rk
         FROM ranked WHERE rk <= 15 ORDER BY domain, rk""",
    "Q-llm-33" ->
      s"""WITH toks AS (
           SELECT doc_id, unnest($wordsSql) AS w FROM documents),
         vocab AS (
           SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY w
                          ORDER BY c DESC, w LIMIT 20))
         SELECT t.doc_id,
                count(*)::BIGINT AS n_tokens,
                sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
                ${Portable.rSql(
                  "CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)" +
                  " / count(*)", 6)} AS oov_rate
         FROM toks t LEFT JOIN vocab v ON t.w = v.w
         GROUP BY t.doc_id ORDER BY t.doc_id""",
    "Q-llm-30" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 2000000, 'as seen in the eval suite: ' || text
           FROM documents WHERE doc_id % 97 = 0),
         sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(${shinglesSql(5)}) AS sh
             FROM (SELECT doc_id, $wordsSql AS ws FROM corpus))),
         bench AS (SELECT DISTINCT sh FROM sh
                   WHERE doc_id % 97 = 0 AND doc_id < 2000000),
         hits AS (
           SELECT doc_id, count(*)::BIGINT AS n_hits
           FROM sh JOIN bench USING (sh)
           WHERE doc_id % 97 <> 0 OR doc_id >= 2000000 GROUP BY doc_id)
         SELECT c.doc_id,
                coalesce(h.n_hits, 0)::BIGINT AS n_overlap_5grams,
                coalesce(h.n_hits, 0) >= 3 AS contaminated
         FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
         WHERE c.doc_id % 97 <> 0 OR c.doc_id >= 2000000
         ORDER BY c.doc_id""",
    "Q-llm-31" ->
      """WITH raw AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 20 = 0
                         THEN text || ' contact user' || doc_id || '@example.com'
                       WHEN doc_id % 30 = 0
                         THEN text || ' call +01-555-' || printf('%04d', (doc_id % 10000)::INT)
                       ELSE text END AS raw
           FROM documents)
         SELECT doc_id,
                md5(regexp_replace(
                      regexp_replace(raw,
                        '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '<email>', 'g'),
                      '\+[0-9]{2}-[0-9]{3}-[0-9]{4}', '<phone>', 'g')) AS clean_hash,
                (len(str_split_regex(raw, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) - 1)::BIGINT
                  AS n_emails,
                (len(str_split_regex(raw, '\+[0-9]{2}-[0-9]{3}-[0-9]{4}')) - 1)::BIGINT
                  AS n_phones
         FROM raw ORDER BY doc_id""",
    "Q-llm-26" ->
      """WITH toks AS (
           SELECT lang,
                  md5('pack42:' || doc_id) AS shuffle_key,
                  len(str_split(text, ' '))::BIGINT AS n_tokens
           FROM documents),
         runs AS (
           SELECT lang, n_tokens,
                  sum(n_tokens) OVER (PARTITION BY lang ORDER BY shuffle_key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
           FROM toks)
         SELECT lang, ((running - n_tokens) // 256)::BIGINT AS pack_id,
                count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS n_tokens
         FROM runs GROUP BY 1, 2 ORDER BY lang, pack_id""",
    "Q-llm-27" ->
      """WITH corpus AS (
           SELECT doc_id, lang, text, n_chars FROM documents
           UNION ALL
           SELECT doc_id + 1000000, lang,
                  substring(text, 1, 10) || substring(text, 12) AS text,
                  length(substring(text, 1, 10) || substring(text, 12))::BIGINT
           FROM documents WHERE doc_id % 50 = 0),
         side AS (
           SELECT doc_id, lang, n_chars,
                  substring(lower(text), 1, 64) AS sig,
                  substring(lower(text), 1, 8) AS pfx,
                  n_chars // 16 AS band0
           FROM corpus),
         blocked AS (
           SELECT doc_id, lang, n_chars, sig, pfx, band0 AS band FROM side
           UNION ALL
           SELECT doc_id, lang, n_chars, sig, pfx, band0 + 1 AS band FROM side)
         SELECT DISTINCT a.doc_id AS a, b.doc_id AS b,
                levenshtein(a.sig, b.sig)::BIGINT AS dist
         FROM blocked a JOIN blocked b
           ON a.band = b.band AND a.lang = b.lang AND a.pfx = b.pfx
          AND a.doc_id < b.doc_id
         WHERE abs(a.n_chars - b.n_chars) <= 8
           AND levenshtein(a.sig, b.sig) <= 12
         ORDER BY a, b""",
    "Q-llm-28" ->
      s"""WITH w AS (
           SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
         dw AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2),
         counts AS (SELECT word, sum(n) AS c FROM dw GROUP BY 1),
         total AS (SELECT sum(c) AS n_total FROM counts),
         logp AS (
           SELECT doc_id, n,
                  CAST(ln(c::DOUBLE / n_total::DOUBLE) AS DECIMAL(20,10))
                    * CAST(n AS DECIMAL(8,0)) AS lpn
           FROM dw JOIN counts USING (word) CROSS JOIN total)
         SELECT doc_id, sum(n)::BIGINT AS n_tokens,
                ${Portable.rSql("CAST(sum(lpn) AS DOUBLE) / sum(n)", 6)} AS mean_logp,
                (${Portable.rSql("CAST(sum(lpn) AS DOUBLE) / sum(n)", 6)}) > -9.0 AS keep
         FROM logp GROUP BY doc_id ORDER BY doc_id""",
    "Q-llm-24" ->
      s"""WITH sh AS (
             SELECT DISTINCT doc_id, sh FROM (
               SELECT doc_id, unnest(${shinglesSql(3)}) AS sh
               FROM (SELECT doc_id, $wordsSql AS ws FROM documents))),
           sigs AS (
             SELECT doc_id, b, min(md5(b || ':' || sh)) AS key
             FROM sh, (SELECT unnest(generate_series(0, ${BANDS - 1})) AS b)
             GROUP BY doc_id, b),
           cand AS (
             SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             FROM sigs x JOIN sigs y
               ON x.b = y.b AND x.key = y.key
              AND x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0),
           sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
           inter AS (
             SELECT c.a, c.b, count(*) AS n_inter
             FROM cand c
             JOIN sh sa ON sa.doc_id = c.a
             JOIN sh sb ON sb.doc_id = c.b AND sb.sh = sa.sh
             GROUP BY c.a, c.b),
           verified AS (
             SELECT c.a AS new_doc, c.b AS dup_of,
                    ${Portable.rSql(
                      "coalesce(i.n_inter, 0) / (za.n_sh + zb.n_sh - coalesce(i.n_inter, 0))", 6)}
                      AS jaccard
             FROM cand c
             LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
             JOIN sizes za ON za.doc_id = c.a
             JOIN sizes zb ON zb.doc_id = c.b)
         SELECT new_doc, dup_of, jaccard FROM (
           SELECT new_doc, dup_of, jaccard,
                  row_number() OVER (PARTITION BY new_doc
                                     ORDER BY jaccard DESC, dup_of) AS rn
           FROM verified WHERE jaccard >= 0.5)
         WHERE rn = 1 ORDER BY new_doc""",
    "Q-llm-25" ->
      """SELECT lang, count(*)::BIGINT AS n_kept, sum(n_chars)::BIGINT AS chars_kept
         FROM documents
         WHERE CASE WHEN lang = 'en' THEN substring(md5('mix42:' || doc_id), 1, 2) < '80'
                    WHEN lang = 'zh' THEN TRUE
                    ELSE substring(md5('mix42:' || doc_id), 1, 2) < '40' END
         GROUP BY lang ORDER BY lang""",
    "Q-llm-23" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents
                     WHERE len($wordsSql) > 0),
           x AS (SELECT doc_id, ws,
                        unnest(generate_series(0, (len(ws) - 1) // 24)) AS i
                 FROM w)
         SELECT doc_id, i AS chunk_idx,
                len(ws[(i * 24 + 1):(i * 24 + 32)])::BIGINT AS n_words,
                array_to_string(ws[(i * 24 + 1):(i * 24 + 32)], ' ') AS chunk
         FROM x ORDER BY doc_id, chunk_idx""",
    "Q-llm-22" ->
      """SELECT lang,
                CASE WHEN substring(md5('split42:' || doc_id), 1, 2) < 'e6' THEN 'train'
                     WHEN substring(md5('split42:' || doc_id), 1, 2) < 'f3' THEN 'val'
                     ELSE 'test' END AS split,
                count(*)::BIGINT AS n
         FROM documents GROUP BY 1, 2 ORDER BY lang, split""",
    "Q-llm-21" ->
      s"""WITH j AS (
           SELECT d.lang, e.embedding
           FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         x AS (
           SELECT lang,
                  unnest(generate_series(1, len(embedding))) - 1 AS dim,
                  unnest(list_transform(generate_series(1, len(embedding)),
                                        i -> embedding[i]::DOUBLE)) AS v
           FROM j)
         SELECT lang, dim::BIGINT AS dim,
                ${Portable.rSql(s"${Portable.dsumSql("v")} / count(*)", 6)} AS mean,
                count(*)::BIGINT AS n
         FROM x GROUP BY lang, dim
         ORDER BY lang, dim""",
    "Q-llm-20" ->
      s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
           g AS (SELECT doc_id, unnest(${shinglesSql(2)}) AS sh FROM w),
           c AS (SELECT doc_id, sh, count(*) AS c FROM g GROUP BY 1, 2),
           p AS (SELECT doc_id, sum(c) AS n_grams, max(c) AS top_c,
                        sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c
                 FROM c GROUP BY 1)
         SELECT d.doc_id,
                coalesce(n_grams, 0)::BIGINT AS n_grams,
                floor(coalesce(top_c::DOUBLE / n_grams, 0.0) * 1e6 + 0.5) / 1e6 AS top_bigram_frac,
                floor(coalesce(dup_c::DOUBLE / n_grams, 0.0) * 1e6 + 0.5) / 1e6 AS dup_bigram_frac,
                (coalesce(top_c::DOUBLE / n_grams, 0.0) <= 0.2
                 AND coalesce(dup_c::DOUBLE / n_grams, 0.0) <= 0.5) AS keep
         FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
         ORDER BY d.doc_id""",
    "Q-llm-17" ->
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 100),
           w AS (SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM d),
           tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM w GROUP BY 1, 2),
           df AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df FROM w GROUP BY 1),
           total AS (SELECT count(*)::BIGINT AS n_docs FROM d),
           scored AS (
             SELECT doc_id, word,
                    floor(tf * ln(n_docs::DOUBLE / df) * 1e6 + 0.5) / 1e6 AS tfidf
             FROM tf JOIN df USING (word) CROSS JOIN total),
           ranked AS (
             SELECT doc_id, word, tfidf,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, word) AS rnk
             FROM scored)
         SELECT doc_id, rnk::BIGINT AS "rank", word, tfidf
         FROM ranked WHERE rnk <= 3
         ORDER BY doc_id, rnk""",
    "Q-llm-18" ->
      """SELECT doc_id,
                md5(clean) AS clean_hash,
                length(clean)::BIGINT AS clean_len,
                len(str_split(clean, ' '))::BIGINT AS n_tokens
         FROM (SELECT doc_id,
                      trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
                           '[0-9]+', '<num>', 'g'),
                           '[^a-z<> ]', '', 'g'),
                           '  +', ' ', 'g')) AS clean
               FROM documents)
         ORDER BY doc_id""",
    "Q-llm-19" ->
      """WITH keyed AS (
           SELECT doc_id,
                  md5('seed42:' || doc_id) AS shuffle_key,
                  substring(md5('seed42:' || doc_id), 1, 1) AS shard
           FROM documents)
         SELECT shard,
                (row_number() OVER (PARTITION BY shard ORDER BY shuffle_key))::BIGINT AS pos,
                doc_id, shuffle_key
         FROM keyed
         ORDER BY shard, pos""",
    "Q-llm-16" ->
      s"""WITH RECURSIVE
           ${starEdgeSql("documents")}
         SELECT c.doc_id, c.cluster_id, z.cluster_size,
                (c.doc_id = c.cluster_id) AS is_kept
         FROM comp c JOIN sz z USING (cluster_id)
         ORDER BY c.doc_id""",
    "Q-llm-66" ->
      s"""WITH sh AS (
             SELECT DISTINCT doc_id, sh FROM (
               SELECT doc_id, unnest(${shinglesSql(3)}) AS sh
               FROM (SELECT doc_id, $wordsSql AS ws FROM documents))),
           sigs AS (
             SELECT doc_id, b, min(md5(b || ':' || sh)) AS key
             FROM sh, (SELECT unnest(generate_series(0, ${BANDS - 1})) AS b)
             GROUP BY doc_id, b),
           scored AS (
             SELECT x.doc_id AS new_doc, y.doc_id AS dup_of,
                    count(*)::BIGINT AS n_bands
             FROM sigs x JOIN sigs y
               ON x.b = y.b AND x.key = y.key
              AND x.doc_id % 5 = 0 AND y.doc_id % 5 <> 0
             GROUP BY 1, 2)
         SELECT new_doc, dup_of, n_bands FROM (
           SELECT new_doc, dup_of, n_bands,
                  row_number() OVER (PARTITION BY new_doc
                                     ORDER BY n_bands DESC, dup_of) AS rn
           FROM scored WHERE n_bands >= 2)
         WHERE rn = 1 ORDER BY new_doc""",
    // lifecycle replay: batch 1 (doc_id%5=0) scores against the corpus
    // (doc_id%5 ∉ {0,3}); its UNMATCHED docs are admitted; batch 2
    // (doc_id%5=3) scores against corpus + admitted batch-1 docs —
    // the same signature algebra both times, no intra-batch dedup
    "Q-llm-67" ->
      s"""WITH sh AS (
             SELECT DISTINCT doc_id, sh FROM (
               SELECT doc_id, unnest(${shinglesSql(3)}) AS sh
               FROM (SELECT doc_id, $wordsSql AS ws FROM documents))),
           sigs AS (
             SELECT doc_id, b, min(md5(b || ':' || sh)) AS key
             FROM sh, (SELECT unnest(generate_series(0, ${BANDS - 1})) AS b)
             GROUP BY doc_id, b),
           s1 AS (
             SELECT x.doc_id AS new_doc, y.doc_id AS dup_of,
                    count(*)::BIGINT AS n_bands
             FROM sigs x JOIN sigs y ON x.b = y.b AND x.key = y.key
             WHERE x.doc_id % 5 = 0 AND y.doc_id % 5 NOT IN (0, 3)
             GROUP BY 1, 2),
           r1 AS (
             SELECT new_doc, dup_of, n_bands FROM (
               SELECT new_doc, dup_of, n_bands,
                      row_number() OVER (PARTITION BY new_doc
                                         ORDER BY n_bands DESC, dup_of) AS rn
               FROM s1 WHERE n_bands >= 2)
             WHERE rn = 1),
           s2 AS (
             SELECT x.doc_id AS new_doc, y.doc_id AS dup_of,
                    count(*)::BIGINT AS n_bands
             FROM sigs x JOIN sigs y ON x.b = y.b AND x.key = y.key
             WHERE x.doc_id % 5 = 3
               AND (y.doc_id % 5 NOT IN (0, 3)
                    OR (y.doc_id % 5 = 0
                        AND y.doc_id NOT IN (SELECT new_doc FROM r1)))
             GROUP BY 1, 2),
           r2 AS (
             SELECT new_doc, dup_of, n_bands FROM (
               SELECT new_doc, dup_of, n_bands,
                      row_number() OVER (PARTITION BY new_doc
                                         ORDER BY n_bands DESC, dup_of) AS rn
               FROM s2 WHERE n_bands >= 2)
             WHERE rn = 1)
         SELECT 1::BIGINT AS batch, new_doc, dup_of, n_bands FROM r1
         UNION ALL
         SELECT 2::BIGINT AS batch, new_doc, dup_of, n_bands FROM r2
         ORDER BY batch, new_doc""",
    "Q-llm-65" ->
      s"""WITH RECURSIVE
           ${starEdgeSql("documents")},
           percl AS (
             SELECT c.cluster_id, count(*) AS sz,
                    sum(d.n_chars) AS chars,
                    sum(CASE WHEN c.doc_id <> c.cluster_id
                             THEN d.n_chars ELSE 0 END) AS removable
             FROM comp c JOIN documents d ON d.doc_id = c.doc_id
             GROUP BY c.cluster_id)
         SELECT sz::BIGINT AS cluster_size,
                count(*)::BIGINT AS n_clusters,
                sum(sz)::BIGINT AS n_docs,
                sum(chars)::BIGINT AS n_chars,
                sum(removable)::BIGINT AS chars_removable
         FROM percl GROUP BY sz ORDER BY cluster_size""",
    "Q-llm-64" ->
      s"""WITH t AS (SELECT doc_id, $wordsSql AS ws0 FROM documents),
           a AS (SELECT doc_id,
                        CASE WHEN doc_id % 40 = 0
                             THEN ws0 || ws0[1:10] || ws0[1:10]
                             ELSE ws0 END AS ws FROM t),
           b AS (SELECT doc_id, ws, len(ws)::BIGINT AS n FROM a),
           w AS (SELECT doc_id, n, unnest(ws) AS w FROM b),
           c1 AS (SELECT doc_id, n, w, count(*) AS c FROM w GROUP BY 1, 2, 3),
           top1 AS (SELECT doc_id, n, max(c) AS top1 FROM c1 GROUP BY 1, 2),
           p2 AS (SELECT doc_id, n,
                         unnest(list_transform(generate_series(1, len(ws) - 1),
                           i -> ws[i] || ' ' || ws[i + 1])) AS g FROM b),
           c2 AS (SELECT doc_id, n, g, count(*) AS c FROM p2 GROUP BY 1, 2, 3),
           top2 AS (SELECT doc_id, n, max(c) AS top2 FROM c2 GROUP BY 1, 2),
           p5 AS (SELECT doc_id, n,
                         unnest(list_transform(generate_series(1, len(ws) - 4),
                           i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                                || ' ' || ws[i + 3] || ' ' || ws[i + 4])) AS g
                  FROM b WHERE len(ws) >= 5),
           c5 AS (SELECT doc_id, n, g, count(*) AS c FROM p5 GROUP BY 1, 2, 3),
           dup5 AS (SELECT doc_id,
                           coalesce(sum(c) FILTER (c > 1), 0)::BIGINT AS dup_pos
                    FROM c5 GROUP BY 1)
         SELECT t1.doc_id, t1.n AS n_tokens,
                ${Portable.rSql("t1.top1 / t1.n", 6)} AS top_word_frac,
                ${Portable.rSql("t2.top2 * 2 / t1.n", 6)} AS top_bigram_frac,
                ${Portable.rSql(
                  "coalesce(d.dup_pos, 0) / greatest(t1.n - 4, 1)", 6)}
                  AS dup_5gram_frac,
                (t1.top1 * 8 <= t1.n AND t2.top2 * 20 <= t1.n AND
                 coalesce(d.dup_pos, 0) * 10 <= t1.n - 4) AS keep
         FROM top1 t1
         JOIN top2 t2 ON t2.doc_id = t1.doc_id
         LEFT JOIN dup5 d ON d.doc_id = t1.doc_id
         ORDER BY t1.doc_id""",
    "Q-llm-63" ->
      s"""WITH RECURSIVE
           corpus AS (
             SELECT doc_id, text FROM documents
             UNION ALL
             SELECT 9000000 + i AS doc_id,
                    text || ' megadup variant ' || i AS text
             FROM (SELECT text FROM documents WHERE doc_id = 0),
                  (SELECT unnest(generate_series(0, 2047)) AS i)),
           ${starEdgeSql("corpus")}
         SELECT cluster_id, cluster_size, n_planted FROM (
           SELECT c.cluster_id, z.cluster_size,
                  sum(CASE WHEN c.doc_id >= 9000000 THEN 1 ELSE 0 END)::BIGINT
                    AS n_planted
           FROM comp c JOIN sz z USING (cluster_id)
           GROUP BY c.cluster_id, z.cluster_size)
         WHERE cluster_size > 1 ORDER BY cluster_id""",
    "Q-llm-01" ->
      """SELECT doc_id, h, n_copies FROM (
           SELECT doc_id, md5(text) AS h,
                  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
                  count(*) OVER (PARTITION BY md5(text)) AS n_copies
           FROM documents)
         WHERE rn = 1 ORDER BY doc_id""",
    "Q-llm-02" -> s"$llm02Sql\n         ORDER BY c.a, c.b",
    "Q-llm-04" ->
      s"""SELECT lang, count(*)::BIGINT AS n_docs,
                ${Portable.rSql("CAST(sum(len(str_split(text,' '))) AS DOUBLE) / count(*)", 6)} AS avg_words,
                ${Portable.rSql("CAST(sum(n_chars) AS DOUBLE) / count(*)", 6)} AS avg_chars,
                min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY lang ORDER BY lang""",
    "Q-llm-04-hist" ->
      """SELECT (n_chars // 100) * 100 AS bucket, count(*)::BIGINT AS n
         FROM documents GROUP BY 1 ORDER BY bucket""",
    "Q-llm-05" ->
      s"""SELECT doc_id, (i - 1)::BIGINT AS idx, ws[i] AS word
         FROM (SELECT doc_id, $wordsSql AS ws FROM documents WHERE doc_id < 50),
              (SELECT unnest(generate_series(1, 1000)) AS i)
         WHERE i <= len(ws)
         ORDER BY doc_id, idx""",
    "Q-llm-06" ->
      """WITH tok AS (
           SELECT doc_id, md5(unnest(str_split(text, ' '))) AS h FROM documents),
         bits AS (
           SELECT doc_id, j,
                  CASE WHEN sum(2 * ((instr('0123456789abcdef',
                         substring(h, CAST(1 + j // 4 AS INT), 1)) - 1
                         >> (3 - j % 4)) & 1) - 1) > 0
                       THEN 1::BIGINT ELSE 0::BIGINT END AS bit_j
           FROM tok, (SELECT unnest(generate_series(0, 15)) AS j)
           GROUP BY doc_id, j),
         sims AS (
           SELECT doc_id, sum(bit_j * (1::BIGINT << j))::BIGINT AS simhash
           FROM bits GROUP BY doc_id)
         SELECT doc_id, simhash,
                (count(*) OVER (PARTITION BY simhash))::BIGINT AS n_same
         FROM sims ORDER BY doc_id""",
    "Q-llm-07" ->
      s"""WITH sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(${shinglesSql(3)}) AS sh
             FROM (SELECT doc_id, $wordsSql AS ws FROM documents))),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS a, count(*) AS n_inter
           FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id AND a.sh = b.sh
           GROUP BY a.doc_id)
         SELECT za.doc_id AS a, za.doc_id + 1 AS b,
                ${Portable.rSql(
                  "coalesce(i.n_inter, 0) / (za.n_sh + zb.n_sh - coalesce(i.n_inter, 0))", 6)}
                  AS jaccard
         FROM sizes za
         JOIN sizes zb ON zb.doc_id = za.doc_id + 1
         LEFT JOIN inter i ON i.a = za.doc_id
         ORDER BY a""",
    "Q-llm-14" -> {
      val ps = graft.operators.LshIndex.planes(
        dim = 64, nBits = LSH_BITS, nTables = LSH_TABLES)
      val planesVals = graft.operators.LshIndex.planesSqlValues(ps, LSH_BITS)
      val probeList = "bucket" +:
        (0 until LSH_BITS).map(j => s"xor(bucket, ${1 << j})")
      s"""WITH planes AS (
           SELECT * FROM (VALUES
             $planesVals) AS pt(t, bit, pv)),
         b AS (
           SELECT e.vec_id, p.t,
                  sum(CASE WHEN ${Portable.cosSql("e.embedding", "p.pv")} >= 0
                           THEN 1 << p.bit ELSE 0 END)::INT AS bucket
           FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id, p.t),
         probes AS (
           SELECT vec_id AS query_id, t,
                  unnest([${probeList.mkString(", ")}]) AS bucket
           FROM b WHERE vec_id < 5),
         cand AS (
           SELECT DISTINCT p.query_id, c.vec_id
           FROM probes p JOIN b c USING (t, bucket)
           WHERE c.vec_id <> p.query_id),
         scored AS (
           SELECT cd.query_id, cd.vec_id,
                  ${Portable.cosSql("q.embedding", "e.embedding")} AS sim
           FROM cand cd
           JOIN embeddings q ON q.vec_id = cd.query_id
           JOIN embeddings e ON e.vec_id = cd.vec_id)
         SELECT query_id, vec_id, ${Portable.rSql("sim", 6)} AS sim, rk FROM (
           SELECT query_id, vec_id, sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, vec_id) AS rk
           FROM scored) WHERE rk <= 10
         ORDER BY query_id, rk"""
    },
    "Q-llm-29" ->
      s"""WITH q AS (
           SELECT vec_id, embedding, embedding[1:16] AS temb FROM embeddings),
         cand AS (
           SELECT a.vec_id AS query_id, a.embedding AS q_emb, b.vec_id, b.embedding,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY ${Portable.cosSql("a.temb", "b.temb")} DESC, b.vec_id) AS trk
           FROM (SELECT * FROM q WHERE vec_id < 5) a
           JOIN q b ON a.vec_id <> b.vec_id)
         SELECT query_id, vec_id, ${Portable.rSql("sim", 6)} AS sim, rk FROM (
           SELECT query_id, vec_id,
                  ${Portable.cosSql("q_emb", "embedding")} AS sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY ${Portable.cosSql("q_emb", "embedding")} DESC, vec_id) AS rk
           FROM cand WHERE trk <= 50) WHERE rk <= 10
         ORDER BY query_id, rk""",
    "Q-llm-15" ->
      s"""WITH q AS (
           SELECT vec_id, embedding,
                  list_transform(embedding,
                    x -> (floor(x::DOUBLE * (127.0 / greatest(
                            list_max(list_transform(embedding, y -> abs(y::DOUBLE))),
                            1e-30)) + 0.5))::FLOAT) AS qemb
           FROM embeddings),
         cand AS (
           SELECT a.vec_id AS query_id, a.embedding AS q_emb, b.vec_id, b.embedding,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY ${Portable.cosSql("a.qemb", "b.qemb")} DESC, b.vec_id) AS qrk
           FROM (SELECT * FROM q WHERE vec_id < 5) a
           JOIN q b ON a.vec_id <> b.vec_id)
         SELECT query_id, vec_id, ${Portable.rSql("sim", 6)} AS sim, rk FROM (
           SELECT query_id, vec_id,
                  ${Portable.cosSql("q_emb", "embedding")} AS sim,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY ${Portable.cosSql("q_emb", "embedding")} DESC, vec_id) AS rk
           FROM cand WHERE qrk <= 50) WHERE rk <= 10
         ORDER BY query_id, rk""",
    "Q-llm-09" ->
      """SELECT doc_id,
                ((length(text) - length(replace(text, 'the', ''))) / 3
               + (length(text) - length(replace(text, 'and', ''))) / 3
               + (length(text) - length(replace(text, 'ing', ''))) / 3)::BIGINT AS score_en,
                ((length(text) - length(replace(text, 'sch', ''))) / 3
               + (length(text) - length(replace(text, 'der', ''))) / 3
               + (length(text) - length(replace(text, 'ein', ''))) / 3)::BIGINT AS score_de,
                ((length(text) - length(replace(text, 'le ', ''))) / 3
               + (length(text) - length(replace(text, 'ent', ''))) / 3
               + (length(text) - length(replace(text, 'eau', ''))) / 3)::BIGINT AS score_fr,
                ((length(text) - length(replace(text, 'os ', ''))) / 3
               + (length(text) - length(replace(text, 'ar ', ''))) / 3
               + (length(text) - length(replace(text, 'el ', ''))) / 3)::BIGINT AS score_es,
                CASE WHEN score_en >= greatest(score_de, score_fr, score_es) THEN 'en'
                     WHEN score_de >= greatest(score_fr, score_es) THEN 'de'
                     WHEN score_fr >= score_es THEN 'fr'
                     ELSE 'es' END AS predicted,
                lang
         FROM documents ORDER BY doc_id""",
    "Q-llm-10" ->
      s"""SELECT doc_id,
                len(ws)::BIGINT AS n_words,
                ${Portable.rSql(
                  "CAST(len(list_filter(ws, w -> w IN ('the','a','of','to','and'))) AS DOUBLE)" +
                  " / len(ws)", 6)} AS stopword_ratio,
                ${Portable.rSql(
                  "CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)", 6)} AS unique_ratio,
                ${Portable.rSql(
                  "0.3 * least(len(ws) / 100.0, 1.0)" +
                  " + 0.4 * (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))" +
                  " + 0.3 * (CAST(len(list_filter(ws, w -> w IN ('the','a','of','to','and'))) AS DOUBLE) / len(ws))",
                  6)} AS quality
         FROM (SELECT doc_id, $wordsSql AS ws FROM documents)
         ORDER BY doc_id""",
    "Q-llm-11" ->
      """SELECT doc_id,
                len(string_split_regex(trim(text), '\s+'))::BIGINT AS ws_tokens,
                len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))::BIGINT AS re_tokens,
                ceil(n_chars / 4.0)::BIGINT AS est_bpe_tokens
         FROM documents ORDER BY doc_id""",
    "Q-llm-12" ->
      s"""SELECT d.doc_id, f.fingerprint
         FROM documents d LEFT JOIN (
           SELECT doc_id, min(md5(gram)) AS fingerprint FROM (
             SELECT doc_id, unnest(${shinglesSql(8).replace("ws", "str_split(text, ' ')")}) AS gram
             FROM documents)
           GROUP BY doc_id) f ON f.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    "Q-mm-01" ->
      """SELECT doc_id AS asset_id,
                length(text)::BIGINT AS n_bytes,
                md5(text) AS content_hash,
                (length(text) % 640)::BIGINT AS fake_width,
                (length(text) * 7 % 256)::BIGINT AS fake_brightness,
                (length(text) // 1000 + 1)::BIGINT AS frame_count
         FROM documents ORDER BY asset_id""",
    // BM25: identical arithmetic op sequence as the Spark side — idf and
    // term scores rounded at 9 digits, decimal per-doc sum, final round
    // at 6, ranks over the rounded score with doc_id tie-break.
    "Q-llm-53" ->
      s"""WITH $bm25Ctes
          SELECT query_id, rnk::BIGINT AS "rank", doc_id, n_terms, score
          FROM rk WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // RRF hybrid: the BM25 CTE chain reused verbatim, the vector list is
    // the sequential-fold cosine (Q-llm-03's parity), fusion = two IEEE
    // terms in fixed order rounded at 9, ranks over the rounded score
    "Q-llm-54" ->
      s"""WITH $bm25Ctes,
            bm AS (SELECT query_id, doc_id, rnk AS bm_rank
                   FROM rk WHERE rnk <= 10),
            vq AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id % 37 = 5),
            vs AS (SELECT vq.query_id, e.vec_id AS doc_id,
                          ${Portable.cosSql("e.embedding", "vq.qv")} AS sim
                   FROM embeddings e, vq),
            vrk AS (SELECT query_id, doc_id, row_number() OVER (
                      PARTITION BY query_id ORDER BY sim DESC, doc_id)
                      AS vec_rank
                    FROM vs),
            vec AS (SELECT query_id, doc_id, vec_rank
                    FROM vrk WHERE vec_rank <= 10),
            fz AS (SELECT coalesce(bm.query_id, vec.query_id) AS query_id,
                          coalesce(bm.doc_id, vec.doc_id) AS doc_id,
                          coalesce(bm.bm_rank, -1)::BIGINT AS bm_rank,
                          coalesce(vec.vec_rank, -1)::BIGINT AS vec_rank,
                          ${Portable.rSql(
                            "coalesce(1.0 / (60.0 + bm.bm_rank), 0.0) + " +
                            "coalesce(1.0 / (60.0 + vec.vec_rank), 0.0)", 9)}
                            AS fused
                   FROM bm FULL JOIN vec
                     ON bm.query_id = vec.query_id
                    AND bm.doc_id = vec.doc_id),
            frk AS (SELECT *, row_number() OVER (
                      PARTITION BY query_id ORDER BY fused DESC, doc_id)
                      AS rnk
                    FROM fz)
          SELECT query_id, rnk::BIGINT AS "rank", doc_id,
                 bm_rank, vec_rank, fused
          FROM frk WHERE rnk <= 10 ORDER BY query_id, rnk""",
    // the NAIVE exact join (all shared-token pairs, no prefix): a
    // DIFFERENT algorithm producing the same τ ≥ 0.8 pairs — a
    // hash-match here IS the prefix filter's completeness proof
    "Q-llm-58" ->
      s"""WITH sh AS (
           SELECT DISTINCT doc_id, sh FROM (
             SELECT doc_id, unnest(${shinglesSql(3)}) AS sh
             FROM (SELECT doc_id, $wordsSql AS ws FROM documents))),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         inter AS (
           SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_inter
           FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT a, b,
                ${Portable.rSql(
                  "n_inter / (za.n_sh + zb.n_sh - n_inter)", 6)} AS jaccard
         FROM inter
         JOIN sizes za ON za.doc_id = a
         JOIN sizes zb ON zb.doc_id = b
         WHERE 9 * n_inter >= 4 * (za.n_sh + zb.n_sh)
         ORDER BY a, b""",

    // regexp_replace needs the 'g' flag here (DuckDB replaces only the
    // first match by default; Spark replaces all); patterns stay in the
    // Java∩RE2 dialect so both engines match identically
    "Q-llm-60" ->
      """WITH aug AS (
           SELECT source,
             text ||
               CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@mail.example.com now'
                 ELSE '' END ||
               CASE WHEN doc_id % 11 = 0
                 THEN ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                 ELSE '' END ||
               CASE WHEN doc_id % 13 = 0
                 THEN ' from 10.' || (doc_id % 256) || '.0.' ||
                      (doc_id % 200) || ' logged'
                 ELSE '' END AS t
           FROM documents),
         scanned AS (
           SELECT source,
             len(regexp_extract_all(t,
               '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[a-z]{2,}')) AS ne,
             len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS np,
             len(regexp_extract_all(t,
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS ni,
             length(t) - length(
               regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS delta
           FROM aug)
         SELECT source, count(*)::BIGINT AS n_docs,
                sum(ne)::BIGINT AS n_email, sum(np)::BIGINT AS n_phone,
                sum(ni)::BIGINT AS n_ip,
                sum(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END)::BIGINT
                  AS docs_with_pii,
                sum(delta)::BIGINT AS redact_len_delta
         FROM scanned GROUP BY source ORDER BY source""",

    "Q-llm-61" ->
      s"""WITH mixed AS (
           SELECT source,
                  (ascii(substr(source, length(source), 1)) % 9 + 1)::BIGINT
                    AS iw,
                  ((ascii(substr(source, length(source), 1)) % 9 + 1) // 2 +
                   CASE WHEN (ascii(substr(source, length(source), 1)) % 9 + 1)
                             % 2 = 1
                         AND substr(md5(doc_id::VARCHAR), 1, 1)
                             IN ('0','1','2','3','4','5','6','7')
                        THEN 1 ELSE 0 END)::BIGINT AS copies
           FROM documents),
         outrows AS (
           SELECT m.source, r.r
           FROM mixed m JOIN range(1, 10) r(r) ON r.r <= m.copies),
         agg AS (
           SELECT source, max(iw) AS iw, count(*)::BIGINT AS n_docs
           FROM mixed GROUP BY source),
         outs AS (
           SELECT source, count(*)::BIGINT AS n_out
           FROM outrows GROUP BY source)
         SELECT a.source, a.iw AS half_epochs, a.n_docs, o.n_out,
                ${Portable.rSql("o.n_out / a.n_docs::DOUBLE", 6)}
                  AS realized_epochs
         FROM agg a JOIN outs o ON a.source = o.source
         ORDER BY a.source""",

    "Q-llm-62" ->
      s"""WITH w AS (
           SELECT doc_id, unnest(str_split(text, ' ')) AS word FROM documents),
         dw AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY 1, 2),
         cc AS (SELECT word, sum(n) AS cc FROM dw GROUP BY 1),
         tcn AS (SELECT word, sum(n) AS tc FROM dw
                 WHERE doc_id % 19 = 3 GROUP BY 1),
         freq AS (
           SELECT c.word, c.cc, coalesce(t.tc, 0) AS tc
           FROM cc c LEFT JOIN tcn t USING (word)),
         tot AS (SELECT sum(cc) AS ctot, sum(tc) AS ttot,
                        count(*) AS v FROM freq),
         term AS (
           SELECT dw.doc_id, dw.n,
                  CAST(ln((tc + 1)::DOUBLE / (ttot + v)::DOUBLE) -
                       ln((cc + 1)::DOUBLE / (ctot + v)::DOUBLE)
                    AS DECIMAL(20,10)) * CAST(dw.n AS DECIMAL(8,0)) AS llr
           FROM dw JOIN freq USING (word) CROSS JOIN tot),
         sc AS (
           SELECT doc_id, sum(n)::BIGINT AS n_tokens,
                  ${Portable.rSql("CAST(sum(llr) AS DOUBLE) / sum(n)", 6)}
                    AS mean_llr
           FROM term GROUP BY doc_id)
         SELECT doc_id, n_tokens, mean_llr,
                (doc_id % 19 = 3) AS is_seed
         FROM sc ORDER BY mean_llr DESC, doc_id LIMIT 20"""
  )

  // the BM25 CTE chain (through `rk`), shared by Q-llm-53 and Q-llm-54
  private lazy val bm25Ctes: String =
      s"""toks AS (SELECT doc_id, $wordsSql AS ws FROM documents),
            dl AS (SELECT doc_id, len(ws)::DOUBLE AS dl FROM toks),
            post AS (SELECT doc_id, unnest(ws) AS word FROM toks),
            tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf
                   FROM post GROUP BY 1, 2),
            dfc AS (SELECT word, count(DISTINCT doc_id)::BIGINT AS df
                    FROM post GROUP BY 1),
            stats AS (SELECT count(*)::DOUBLE AS n_docs,
                             ${Portable.davgSql("dl", 6)} AS avgdl
                      FROM dl),
            qt AS (SELECT DISTINCT doc_id AS query_id, unnest(ws[1:5]) AS word
                   FROM toks WHERE doc_id % 37 = 5),
            term AS (
              SELECT qt.query_id, tf.doc_id,
                     ${Portable.rSql(
                       "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)", 9)} AS idf,
                     (tf::DOUBLE * 2.2) /
                       (tf::DOUBLE + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS nrm
              FROM tf JOIN qt USING (word) JOIN dfc USING (word)
                   JOIN dl ON dl.doc_id = tf.doc_id
                   CROSS JOIN stats),
            sc AS (
              SELECT query_id, doc_id, count(*)::BIGINT AS n_terms,
                     ${Portable.rSql(
                       Portable.dsumSql(Portable.rSql("idf * nrm", 9)), 6)}
                       AS score
              FROM term GROUP BY 1, 2),
            rk AS (SELECT *, row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY score DESC, doc_id) AS rnk FROM sc)"""
}
