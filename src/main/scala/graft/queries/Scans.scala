package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Q-scan-* / Q-sink-*: sources and sinks (SURVEY.md §2B "Scans").
  *
  * Parquet is the primary format (columnar at rest; Catalyst pushes filters
  * and prunes columns into the scan). CSV/JSON are exercised round-trip with
  * explicit schemas — schema inference is banned at 100 TB (it implies an
  * extra full pass over the data).
  */
object Scans {

  val queries: Map[String, Q] = Map(
    // ---- Q-scan-01: parquet scan over all 10 testdata tables
    "Q-scan-01" -> { (s, d) =>
      Tables.names.map { n =>
        Tables.t(s, d, n)
          .agg(count(lit(1)).as("n_rows"))
          .select(lit(n).as("tbl"), col("n_rows"))
      }.reduce(_ unionAll _).orderBy("tbl")
    },

    // ---- Q-scan-02: CSV + JSON scan with explicit schema (round-trip)
    "Q-scan-02" -> { (s, d) =>
      val tmp = tempDir("graft_scan02").toString
      Tables.nation(s, d).write.mode("overwrite")
        .option("header", "true").csv(s"$tmp/nation_csv")
      Tables.region(s, d).write.mode("overwrite").json(s"$tmp/region_json")
      val nation = s.read
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("header", "true").csv(s"$tmp/nation_csv")
      val region = s.read
        .schema("r_regionkey INT, r_name STRING").json(s"$tmp/region_json")
      nation.join(region, nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n_nations"))
        .orderBy("r_name")
    },

    // ---- Q-sink-01: partitioned parquet sink, read back (round-trip)
    "Q-sink-01" -> { (s, d) =>
      val tmp = tempDir("graft_sink01").toString
      Tables.lineitem(s, d)
        .filter(col("l_quantity") >= 25)
        .write.mode("overwrite").partitionBy("l_returnflag")
        .parquet(s"$tmp/li_part")
      s.read.parquet(s"$tmp/li_part")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), Portable.r(Portable.dsum(col("l_quantity")), 2).as("qty"))
        .orderBy("l_returnflag")
    },

    // ---- Q-sink-02: keyed JSON sink rows (the reference's egress shape:
    // key = device/user, value = JSON body, event time carried in payload —
    // WeatherPresenceSerializationSchema.java:30-35)
    "Q-sink-02" -> { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(
          col("user_id").cast("string").as("key"),
          to_json(struct(
            col("event_id"),
            col("event_type"),
            unix_millis(col("ts")).as("ts_ms"))).as("value"))
        .orderBy("key", "value")
    },

    // ---- Q-scan-06: deterministic stratified sampling via key-hash
    // buckets. RNG-based sample()/TABLESAMPLE is partition-order dependent
    // and engine-specific; hashing the row KEY makes the sampling decision
    // a pure function of the data — stable across engines, runs, and
    // repartitioning, which is what a reproducible training-data pipeline
    // needs. Rates are hex-prefix thresholds: '80'/256 = 50% for urgent
    // orders, '1a'/256 = 10.2% for the rest.
    "Q-scan-06" -> { (s, d) =>
      val h = substring(md5(col("o_orderkey").cast("string")), 1, 2)
      Tables.orders(s, d)
        .filter(
          (col("o_orderpriority") === "1-URGENT" && h < "80") ||
          (col("o_orderpriority") =!= "1-URGENT" && h < "1a"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Portable.r(Portable.dsum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderpriority")
    },

    // ---- Q-scan-07: parquet schema evolution — two generations of files
    // in one dataset (gen1 lacks the later o_totalprice column);
    // mergeSchema unifies the footers and back-fills nulls, the read-side
    // half of a long-lived dataset whose writer schema grew over time.
    "Q-scan-07" -> { (s, d) =>
      val tmp = tempDir("graft_scan07").toString
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite").parquet(s"$tmp/ds/gen=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").parquet(s"$tmp/ds/gen=2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/ds")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          count(col("o_totalprice")).as("n_with_price"),
          Portable.r(Portable.dsum(coalesce(col("o_totalprice"), lit(0.0))), 2)
            .as("total"))
        .orderBy("o_orderstatus")
    },

    // ---- Q-scan-10: corrupt-tolerant CSV scan — the reference's
    // poison-pill semantics (drop + account, never fail the job,
    // WeatherKafkaAvroDeserializerSchema.java:65-67) applied to the file
    // surface: PERMISSIVE mode routes malformed lines to a corrupt-record
    // column; the query aggregates the clean rows and COUNTS the drops
    // (three synthetic bad lines injected at staging).
    "Q-scan-10" -> { (s, d) =>
      val tmp = tempDir("graft_scan10")
      Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1).write.mode("overwrite")
        .option("header", "false").csv(s"$tmp/csv")
      Files.writeString(tmp.resolve("csv/bad.csv"),
        "oops,not,a,nation,row\nnot_an_int,XLAND,9\n,,,,,,\n")
      val schema = "n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt STRING"
      val rows = s.read.schema(schema)
        .option("header", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(s"$tmp/csv")
        .cache() // corrupt-column queries need the raw rows retained
      rows.count()
      val bad = rows.filter(col("_corrupt").isNotNull).count()
      rows.filter(col("_corrupt").isNull)
        .agg(count(lit(1)).as("n_good"),
          lit(bad).as("n_corrupt"),
          min("n_name").as("first_name"),
          sum("n_regionkey").cast("bigint").as("region_sum"))
    },

    // ---- Q-scan-09: STREAMING CSV source — the file-stream surface
    // beyond parquet: explicit schema (inference is banned on streams),
    // header-less CSV staged from the nation table, aggregated per region
    // through a one-trigger replay.
    "Q-scan-09" -> { (s, d) =>
      val tmp = tempDir("graft_scan09")
      Tables.nation(s, d)
        .select("n_nationkey", "n_name", "n_regionkey")
        .coalesce(1).write.mode("overwrite")
        .option("header", "false").csv(s"$tmp/csv")
      val schema = "n_nationkey INT, n_name STRING, n_regionkey INT"
      graft.streaming.Replay.run(
        s.readStream.schema(schema).option("header", "false")
          .csv(s"$tmp/csv")
          .groupBy("n_regionkey")
          .agg(count(lit(1)).as("n"),
            min("n_name").as("first_name")),
        "complete").orderBy("n_regionkey")
    },

    // ---- Q-scan-08: z-order (Morton) clustering key — the layout
    // operator for multi-dimensional data skipping (operators/
    // ZOrderLayout; row-group-skipping effect measured in ZOrderSpec).
    // The z-value algebra is hash-checked here: pure shift/and/or bit
    // spread, replicated exactly by the oracle.
    "Q-scan-08" -> { (s, d) =>
      import graft.operators.ZOrderLayout
      Tables.events(s, d)
        .select(
          col("event_id"),
          col("user_id").bitwiseAND(lit(1023L)).as("zx"),
          unix_timestamp(col("ts")).bitwiseAND(lit(65535L)).as("zy"))
        .withColumn("z", ZOrderLayout.zvalue(col("zx"), col("zy")))
        .orderBy("z", "event_id")
    },

    // ---- Q-scan-12: nested JSON-lines scan — records with a nested
    // struct and an array field, read under an EXPLICIT nested schema (no
    // inference pass over the data — at 100 TB schema inference is a full
    // extra scan), then dot-path projection + array explode. Staged from
    // the events table so the oracle can recompute from the same rows.
    "Q-scan-12" -> { (s, d) =>
      val tmp = tempDir("graft_scan12")
      Tables.events(s, d).filter(col("event_type") === "signup")
        .select(to_json(struct(
          col("event_id"),
          struct(col("user_id").as("id"), col("event_type").as("kind")).as("user"),
          array(col("event_type"), concat(lit("u"), col("user_id") % 10)).as("tags")))
          .as("value"))
        .coalesce(1).write.mode("overwrite").text(s"$tmp/json")
      s.read
        .schema("event_id LONG, user STRUCT<id: LONG, kind: STRING>, tags ARRAY<STRING>")
        .json(s"$tmp/json")
        .select(col("event_id"), col("user.id").as("uid"),
          explode(col("tags")).as("tag"))
        .groupBy("tag")
        .agg(count(lit(1)).as("n"), countDistinct(col("uid")).as("n_users"))
        .orderBy("tag")
    },

    // ---- Q-scan-11: Hive-style partition layout — write partitioned by a
    // key, read back with partition DISCOVERY (the directory names become
    // the o_orderstatus column) and a partition-pruning filter: the 'F'
    // predicate eliminates whole directories at planning time, so the scan
    // never opens the other partitions' files. At 100 TB this is the
    // first-line data-skipping mechanism (before row-group stats/z-order).
    // ExplainCheck asserts the PartitionFilters line.
    "Q-scan-11" -> { (s, d) =>
      val tmp = tempDir("graft_scan11").toString
      Tables.orders(s, d)
        .write.mode("overwrite").partitionBy("o_orderstatus").parquet(s"$tmp/ds")
      s.read.parquet(s"$tmp/ds")
        .filter(col("o_orderstatus") === "F")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          Portable.r(Portable.dsum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderpriority")
    },

    // ---- Q-scan-13: binaryFile source — the multimodal ingest path:
    // opaque assets land as (path, length, content: binary) rows with no
    // decode on the scan. Files are staged from the first 20 documents'
    // UTF-8 bytes so the oracle recomputes identity (byte length + md5)
    // from the documents table. At 100 TB this is how image/audio blobs
    // enter the pipeline: one row per file, partitioned by directory,
    // content never parsed until an explicit decode stage.
    "Q-scan-13" -> { (s, d) =>
      val tmp = tempDir("graft_scan13")
      Tables.documents(s, d).filter(col("doc_id") < 20)
        .select("doc_id", "text").collect()
        .foreach { r =>
          Files.write(tmp.resolve(f"doc_${r.getLong(0)}%05d.txt"),
            r.getString(1).getBytes("UTF-8"))
        }
      s.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(tmp.toString)
        .select(
          regexp_extract(col("path"), "doc_(\\d+)\\.txt$", 1)
            .cast("bigint").as("doc_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy("doc_id")
    },

    // ---- Q-sink-03: size-bounded output files — maxRecordsPerFile caps
    // rows per written file (the knob that keeps 100 TB outputs in
    // many same-sized parquet files instead of a few huge or thousands of
    // tiny ones), with sortWithinPartitions clustering rows so row-group
    // min/max stats stay tight. Read back and audited: the file count
    // must equal ceil(rows / cap) and the content must round-trip.
    "Q-sink-03" -> { (s, d) =>
      val tmp = tempDir("graft_sink03").toString
      Tables.lineitem(s, d)
        .repartition(1)
        .sortWithinPartitions("l_orderkey", "l_linenumber")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 10000)
        .parquet(s"$tmp/li")
      s.read.parquet(s"$tmp/li")
        .withColumn("__file", input_file_name()) // project first: agg args must be deterministic
        .agg(
          countDistinct(col("__file")).as("n_files"),
          count(lit(1)).as("n_rows"),
          Portable.r(Portable.dsum(col("l_quantity")), 2).as("qty_sum"))
    },

    // ---- Q-sink-04: dynamic partition overwrite — the idempotent
    // partition-refresh pattern: re-publishing one partition's corrected
    // data replaces ONLY the partitions present in the written frame
    // (partitionOverwriteMode=dynamic), leaving every other partition's
    // files untouched. This is how a 100 TB table takes daily restatements
    // without a full rewrite. The audit re-reads the table: purchase rows
    // carry the corrected (doubled) values, all other types original.
    "Q-sink-04" -> { (s, d) =>
      val tmp = tempDir("graft_sink04").toString
      val ev = Tables.events(s, d)
        .select("event_id", "user_id", "event_type", "value")
      ev.write.mode("overwrite").partitionBy("event_type").parquet(s"$tmp/ev")
      val corrected = ev.filter(col("event_type") === "purchase")
        .withColumn("value", col("value") * 2)
      corrected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type").parquet(s"$tmp/ev")
      s.read.parquet(s"$tmp/ev")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          Portable.r(Portable.dsum(col("value")), 2).as("val_sum"))
        .orderBy("event_type")
    },

    // ---- Q-scan-14: XML scan — the native Spark 4 XML data source
    // (StAX-based, spark-xml merged into core): nation staged as
    // <nations><nation>…</nation></nations>, read back under an EXPLICIT
    // schema + rowTag (schema inference on XML is a second full pass —
    // banned at scale, like CSV/JSON inference). Identity oracle from the
    // same table.
    "Q-scan-14" -> { (s, d) =>
      val tmp = tempDir("graft_scan14")
      Tables.nation(s, d).coalesce(1).write.mode("overwrite")
        .option("rowTag", "nation").option("rootTag", "nations")
        .format("xml").save(s"$tmp/xml")
      s.read.format("xml")
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("rowTag", "nation")
        .load(s"$tmp/xml")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    },

    // ---- Q-sink-05: CSV sink dialect controls — quote/escape/nullValue
    // round-trip on adversarial payloads (embedded delimiter, embedded
    // quote char, real NULLs vs empty-looking strings). The read-back must
    // reproduce the source rows exactly; the oracle reconstructs the same
    // payloads from the nation table directly.
    "Q-sink-05" -> { (s, d) =>
      val tmp = tempDir("graft_sink05")
      Tables.nation(s, d).select(
          col("n_nationkey"),
          concat(col("n_name"), lit(",with|\"quotes\"")).as("payload"),
          when(col("n_nationkey") % 5 === 0, lit(null).cast("string"))
            .otherwise(col("n_name")).as("maybe_null"))
        .coalesce(1).write.mode("overwrite")
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .option("nullValue", "\\N")
        .csv(s"$tmp/csv")
      s.read.schema("n_nationkey INT, payload STRING, maybe_null STRING")
        .option("header", "true").option("quote", "\"").option("escape", "\"")
        .option("nullValue", "\\N")
        .csv(s"$tmp/csv")
        .orderBy("n_nationkey")
    },

    // ---- Q-scan-15: raw-text source + field parsing — the log-ingest
    // path: pipe-delimited lines staged via the text sink, read back as
    // one `value` column, split/cast into fields, aggregated. Money rides
    // the log line as exact integer cents (floats in text would re-enter
    // through a formatter's rounding policy). At 100 TB this is the
    // "parse first, columnarize once" entry stage before parquet.
    "Q-scan-15" -> { (s, d) =>
      val tmp = tempDir("graft_scan15")
      Tables.orders(s, d)
        .select(concat_ws("|",
          col("o_orderpriority"), col("o_orderkey"), col("o_orderstatus"),
          floor(col("o_totalprice") * 100 + 0.5).cast("bigint")).as("value"))
        .coalesce(1).write.mode("overwrite").text(s"$tmp/log")
      s.read.text(s"$tmp/log")
        .select(split(col("value"), "\\|").as("f"))
        .select(
          element_at(col("f"), 1).as("prio"),
          element_at(col("f"), 3).as("status"),
          element_at(col("f"), 4).cast("bigint").as("cents"))
        .groupBy("prio", "status")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_cents"))
        .orderBy("prio", "status")
    },

    // ---- Q-scan-17: corrupt-tolerant XML (the Q-scan-10 CSV pattern on
    // the second markup format): three records with a non-integer key
    // field are injected next to the staged nation rows; DROPMALFORMED
    // must shed exactly those, PERMISSIVE must keep them with the typed
    // field nulled. Both modes read under the same explicit schema —
    // poison-pill tolerance mirroring the reference's drop-on-error
    // decode (WeatherKafkaAvroDeserializerSchema.java:65-67).
    "Q-scan-17" -> { (s, d) =>
      val tmp = tempDir("graft_scan17")
      Tables.nation(s, d).coalesce(1).write.mode("overwrite")
        .option("rowTag", "nation").option("rootTag", "nations")
        .format("xml").save(s"$tmp/xml")
      val bad = (1 to 3).map(i =>
        s"<nation><n_nationkey>bad_$i</n_nationkey>" +
          s"<n_name>CORRUPT_$i</n_name><n_regionkey>0</n_regionkey></nation>")
        .mkString("<nations>", "", "</nations>")
      Files.writeString(
        java.nio.file.Paths.get(s"$tmp/xml/part-corrupt.xml"), bad)
      def read(mode: String) =
        s.read.format("xml")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
          .option("rowTag", "nation").option("mode", mode)
          .load(s"$tmp/xml")
      val dropped = read("DROPMALFORMED").agg(
          count(lit(1)).as("n_rows"),
          count(col("n_nationkey")).as("n_keys"))
        .select(lit("dropmalformed").as("mode"), col("n_rows"), col("n_keys"))
      val kept = read("PERMISSIVE").agg(
          count(lit(1)).as("n_rows"),
          count(col("n_nationkey")).as("n_keys"))
        .select(lit("permissive").as("mode"), col("n_rows"), col("n_keys"))
      dropped.unionAll(kept).orderBy("mode")
    },

    // ---- Q-scan-20: exact-k per-stratum sample — the distributed
    // reservoir: rank each stratum's rows by the key-hash (md5(doc_id) is
    // uniform and unique, so the first k in hash order ARE a uniform
    // k-subset) and keep rank ≤ k. Deterministic across engines, runs,
    // and repartitioning (the Q-scan-06 discipline upgraded from a rate
    // to an EXACT count per group). Plans as a partial WindowGroupLimit:
    // each input partition forwards at most k rows per stratum, so the
    // shuffle carries O(k·|strata|·|partitions|), never the corpus.
    "Q-scan-20" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("lang"), col("rk").cast("bigint").as("rk"),
          col("doc_id"), col("n_chars"))
        .orderBy("lang", "rk")
    },

    // ---- Q-scan-21: weighted sample WITHOUT replacement (Efraimidis-
    // Spirakis A-ES, "Weighted random sampling with a reservoir", IPL
    // 2006): each row draws u = hash-uniform in (0,1) and scores
    // key = -ln(u)/w; the k SMALLEST keys are a weight-proportional
    // k-subset drawn without replacement in ONE pass. The md5-derived u
    // (13 hex chars = 2^52 states, exactly representable in a double)
    // makes the draw deterministic across engines, runs, and
    // repartitioning — the Q-scan-20 discipline extended from uniform to
    // WEIGHTED sampling, the shape importance-weighted corpus curation
    // needs (sample documents ∝ length / quality score). Plans as
    // TakeOrderedAndProject: each partition forwards its local top-k
    // only — O(k·partitions) crosses the wire, never the corpus.
    "Q-scan-21" -> { (s, d) =>
      val u = (expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13)," +
        " 16, 10) AS DOUBLE)") + lit(1.0)) / lit(4503599627370497.0)
      Tables.documents(s, d)
        .where(col("n_chars") > 0)
        .withColumn("aes_key", -log(u) / col("n_chars"))
        .orderBy("aes_key")
        .limit(25)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },

    // ---- Q-scan-22: PER-STRATUM weighted sampling — Q-scan-20's
    // stratification × Q-scan-21's A-ES weighting: within each language,
    // the k smallest −ln(u)/w keys are an exact-k weight-proportional
    // draw without replacement, one pass, deterministic across engines.
    // The per-language weighted draw a multilingual corpus mix actually
    // runs (sample long/high-quality docs ∝ weight, fixed quota per
    // language). Plans as a partial WindowGroupLimit like Q-scan-20 —
    // each input partition forwards ≤ k rows per stratum.
    "Q-scan-22" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val u = (expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13)," +
        " 16, 10) AS DOUBLE)") + lit(1.0)) / lit(4503599627370497.0)
      val w = Window.partitionBy("lang")
        .orderBy(col("aes_key"), col("doc_id"))
      Tables.documents(s, d)
        .where(col("n_chars") > 0)
        .withColumn("aes_key", -log(u) / col("n_chars"))
        .withColumn("rk", row_number().over(w).cast("bigint"))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "rk")
    }
  )

  val oracle: Map[String, String] = Map(
    "Q-scan-22" ->
      """WITH k AS (
           SELECT lang, doc_id, n_chars,
                  row_number() OVER (PARTITION BY lang ORDER BY
                    -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
                         + 1.0) / 4503599627370497.0) / n_chars,
                    doc_id) AS rk
           FROM documents WHERE n_chars > 0)
         SELECT lang, rk::BIGINT AS rk, doc_id, n_chars
         FROM k WHERE rk <= 5 ORDER BY lang, rk""",
    "Q-scan-21" ->
      """WITH k AS (
           SELECT doc_id, lang, n_chars,
                  -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::UBIGINT
                       + 1.0) / 4503599627370497.0) / n_chars AS aes_key
           FROM documents WHERE n_chars > 0),
         s AS (SELECT doc_id, lang, n_chars FROM k ORDER BY aes_key LIMIT 25)
         SELECT doc_id, lang, n_chars FROM s ORDER BY doc_id""",
    "Q-scan-20" ->
      """WITH r AS (
           SELECT lang, doc_id, n_chars,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
           FROM documents)
         SELECT lang, rk::BIGINT AS rk, doc_id, n_chars
         FROM r WHERE rk <= 10 ORDER BY lang, rk""",
    "Q-scan-14" ->
      """SELECT n_nationkey, n_name, n_regionkey
         FROM nation ORDER BY n_nationkey""",
    "Q-scan-17" ->
      """SELECT 'dropmalformed' AS mode, count(*)::BIGINT AS n_rows,
                count(*)::BIGINT AS n_keys
         FROM nation
         UNION ALL
         SELECT 'permissive', (count(*) + 3)::BIGINT, count(*)::BIGINT
         FROM nation
         ORDER BY mode""",
    "Q-scan-15" ->
      """SELECT o_orderpriority AS prio, o_orderstatus AS status,
                count(*)::BIGINT AS n,
                sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT
                  AS total_cents
         FROM orders GROUP BY 1, 2 ORDER BY prio, status""",
    "Q-sink-05" ->
      """SELECT n_nationkey,
                n_name || ',with|"quotes"' AS payload,
                CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_name END
                  AS maybe_null
         FROM nation ORDER BY n_nationkey""",
    "Q-scan-13" ->
      """SELECT doc_id, strlen(text)::BIGINT AS n_bytes, md5(text) AS content_md5
         FROM documents WHERE doc_id < 20 ORDER BY doc_id""",
    "Q-sink-03" ->
      s"""SELECT ceil(count(*) / 10000.0)::BIGINT AS n_files,
                count(*)::BIGINT AS n_rows,
                ${Portable.rSql(Portable.dsumSql("l_quantity"), 2)} AS qty_sum
         FROM lineitem""",
    "Q-sink-04" ->
      s"""SELECT event_type, count(*)::BIGINT AS n,
                ${Portable.rSql(Portable.dsumSql(
                  "CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END"), 2)}
                  AS val_sum
         FROM events GROUP BY event_type ORDER BY event_type""",
    "Q-scan-01" ->
      Tables.names.map(n => s"SELECT '$n' AS tbl, count(*)::BIGINT AS n_rows FROM $n")
        .mkString("", " UNION ALL ", " ORDER BY tbl"),
    "Q-scan-02" ->
      """SELECT r_name, count(*)::BIGINT AS n_nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "Q-sink-01" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n, floor((CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS qty
         FROM lineitem WHERE l_quantity >= 25
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "Q-sink-02" ->
      """SELECT user_id::VARCHAR AS key,
                '{"event_id":' || event_id || ',"event_type":"' || event_type ||
                '","ts_ms":' || epoch_ms(ts) || '}' AS value
         FROM events WHERE event_type = 'purchase'
         ORDER BY key, value""",
    "Q-scan-06" ->
      s"""SELECT o_orderpriority, count(*)::BIGINT AS n,
                ${Portable.rSql(Portable.dsumSql("o_totalprice"), 2)} AS total
         FROM orders
         WHERE (o_orderpriority = '1-URGENT'
                AND substring(md5(o_orderkey::VARCHAR), 1, 2) < '80')
            OR (o_orderpriority <> '1-URGENT'
                AND substring(md5(o_orderkey::VARCHAR), 1, 2) < '1a')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "Q-scan-07" ->
      s"""SELECT o_orderstatus, count(*)::BIGINT AS n,
                count(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END)::BIGINT AS n_with_price,
                ${Portable.rSql(Portable.dsumSql(
                  "CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice ELSE 0.0 END"), 2)} AS total
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "Q-scan-09" ->
      """SELECT n_regionkey, count(*)::BIGINT AS n, min(n_name) AS first_name
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "Q-scan-10" ->
      """SELECT count(*)::BIGINT AS n_good,
                3::BIGINT AS n_corrupt,
                min(n_name) AS first_name,
                sum(n_regionkey)::BIGINT AS region_sum
         FROM nation""",
    "Q-scan-12" ->
      """WITH x AS (SELECT event_id, user_id,
                           unnest([event_type, 'u' || (user_id % 10)]) AS tag
                    FROM events WHERE event_type = 'signup')
         SELECT tag, count(*)::BIGINT AS n,
                count(DISTINCT user_id)::BIGINT AS n_users
         FROM x GROUP BY tag ORDER BY tag""",
    "Q-scan-11" ->
      s"""SELECT o_orderpriority, count(*)::BIGINT AS n,
                ${Portable.rSql(Portable.dsumSql("o_totalprice"), 2)} AS total
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "Q-scan-08" ->
      s"""SELECT event_id, zx, zy,
                ${graft.operators.ZOrderLayout.zvalueSql("zx", "zy")} AS z
         FROM (SELECT event_id,
                      (user_id & 1023) AS zx,
                      ((epoch_ms(ts) // 1000) & 65535) AS zy
               FROM events)
         ORDER BY z, event_id"""
  )
}
