package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Q-fn-*: scalar function families (SURVEY.md §2B).
  *
  * Everything here is a Spark built-in (`org.apache.spark.sql.functions`) —
  * codegen'd, whole-stage-fused, no UDFs. The oracle side uses the DuckDB
  * dialect equivalent; where semantics diverge (dayofweek origin, ceil
  * return type, list indexing) the query normalizes both sides explicitly.
  */
object Functions {

  val queries: Map[String, Q] = Map(
    // ---- Q-fn-str-01: string family
    "Q-fn-str-01" -> { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        concat(col("c_name"), lit("_"), col("c_mktsegment")).as("cat"),
        substring(col("c_name"), 1, 8).as("sub"),
        upper(col("c_mktsegment")).as("up"),
        lower(col("c_name")).as("lo"),
        lpad(col("c_name"), 25, "*").as("padded"),
        length(col("c_name")).cast("bigint").as("len"),
        regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        element_at(split(col("c_name"), "#"), 2).as("num_part"),
        col("c_name").like("%1").as("ends_in_1"),
        trim(lpad(col("c_mktsegment"), 15, " ")).as("trimmed"))
        .orderBy("c_custkey")
    },

    // ---- Q-fn-date-01: date/time family (UTC pinned)
    "Q-fn-date-01" -> { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mo"),
        dayofweek(col("o_orderdate")).cast("bigint").as("dow"), // 1=Sunday
        date_add(col("o_orderdate"), 30).as("plus30"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("bigint").as("days_since"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("epoch_millis"),
        expr("from_unixtime(unix_millis(cast(o_orderdate AS timestamp)) DIV 1000)")
          .as("formatted"))
        .orderBy("o_orderkey")
    },

    // ---- Q-fn-math-01: math family
    "Q-fn-math-01" -> { (s, d) =>
      Tables.lineitem(s, d)
        .orderBy("l_orderkey", "l_linenumber").limit(2000)
        .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("abs_dev"),
        ceil(col("l_extendedprice")).cast("bigint").as("ceiled"),
        floor(col("l_extendedprice")).cast("bigint").as("floored"),
        Portable.r(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        Portable.r(pow(col("l_discount") + 1.0, 3), 6).as("pow3"),
        Portable.r(log(col("l_extendedprice")), 6).as("ln_price"),
        Portable.r(log10(col("l_extendedprice")), 6).as("log10_price"),
        signum(col("l_quantity") - 25).cast("bigint").as("sgn"),
        pmod(col("l_orderkey"), lit(7)).cast("bigint").as("mod7"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Q-fn-math-02: trig / inverse-trig / transcendental family.
    // Inputs are normalized into safe domains (discount in [0,0.1],
    // quantity scaled to [0,1]) so asin/acos never go NaN. Both engines
    // call their platform libm; ULP drift is absorbed by the portable
    // 6-dp floor-rounding (same policy as ln in Q-llm-17, proven
    // hash-stable).
    "Q-fn-math-02" -> { (s, d) =>
      val x = col("l_discount")            // [0, 0.1]
      val u = col("l_quantity") / 50.0     // (0, 1]
      Tables.lineitem(s, d)
        .orderBy("l_orderkey", "l_linenumber").limit(2000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Portable.r(sin(x), 6).as("sin_x"),
          Portable.r(cos(x), 6).as("cos_x"),
          Portable.r(tan(x), 6).as("tan_x"),
          Portable.r(asin(u), 6).as("asin_u"),
          Portable.r(acos(u), 6).as("acos_u"),
          Portable.r(atan2(u, x + 1.0), 6).as("atan2_ux"),
          Portable.r(degrees(u), 6).as("deg_u"),
          Portable.r(radians(col("l_quantity")), 6).as("rad_q"),
          Portable.r(cbrt(col("l_extendedprice")), 6).as("cbrt_price"),
          Portable.r(exp(x), 6).as("exp_x"),
          Portable.r(log2(col("l_extendedprice")), 6).as("log2_price"),
          factorial(col("l_linenumber").cast("int")).as("fact_line"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Q-fn-str-04: string family 2 — positional/codec helpers
    // (ascii/chr, left/right, instr, translate, reverse, repeat). All
    // codegen'd built-ins shared verbatim with the oracle dialect.
    "Q-fn-str-04" -> { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        ascii(col("c_mktsegment")).cast("bigint").as("seg_ascii"),
        expr("chr(65 + c_custkey % 26)").as("bucket_chr"),
        expr("left(c_name, 8)").as("name_l8"),
        expr("right(c_name, 3)").as("name_r3"),
        instr(col("c_name"), "0").cast("bigint").as("first_zero"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"),
        reverse(col("c_name")).as("name_rev"),
        expr("repeat(c_mktsegment, 2)").as("seg_twice"))
        .orderBy("c_custkey")
    },

    // ---- Q-fn-json-02: JSON on the CONSTRUCTION side — arrays/objects
    // built with to_json, array-length introspection, and a nested
    // path extraction over a synthesized document. Both engines emit the
    // compact `{"k":v}` / `[v,...]` rendering, so the JSON text itself
    // hash-compares.
    "Q-fn-json-02" -> { (s, d) =>
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          to_json(array(col("user_id") % 5, col("event_id") % 7, k)).as("arr_json"),
          to_json(map(lit("uid"), col("user_id") % 5, lit("k"), k)).as("obj_json"),
          json_array_length(to_json(array(col("user_id"), col("event_id"), k, k)))
            .cast("bigint").as("arr_len"),
          get_json_object(
            concat(lit("{\"a\":[{\"b\":"), k, lit("}]}")), "$.a[0].b")
            .as("nested_b"))
        .orderBy("event_id")
    },

    // ---- Q-fn-str-05: string family 3 — field extraction (split_part),
    // printf-style formatting, and substring predicates. Shared verbatim
    // with the oracle dialect (Spark format_string == DuckDB printf).
    "Q-fn-str-05" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        split_part(col("p_type"), lit(" "), lit(-1)).as("type_tail"),
        format_string("%s|%06d", col("p_brand"), col("p_partkey")).as("tag"),
        col("p_name").contains("a").as("has_a"),
        col("p_name").startsWith("p").as("p_start"),
        col("p_type").endsWith("D").as("d_end"))
        .orderBy("p_partkey")
    },

    // ---- Q-fn-arr-01: array family incl. higher-order functions
    "Q-fn-arr-01" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("words")).cast("bigint").as("n_words"),
          array_contains(col("words"), "spark").as("has_spark"),
          element_at(sort_array(col("words")), 1).as("first_sorted"),
          // list-typed outputs are serialized to strings: the driver's compare
          // sorts rows in pandas, and ndarray cells are unsortable there
          array_join(slice(sort_array(col("words"), asc = false), 1, 3), ",").as("top3_desc"),
          array_join(transform(slice(col("words"), 1, 5), w => upper(w)), ",").as("first5_upper"),
          size(filter(col("words"), w => length(w) > 4)).cast("bigint").as("n_long_words"),
          aggregate(transform(col("words"), w => length(w).cast("bigint")),
            lit(0L), (acc, x) => acc + x).as("total_chars"))
        .orderBy("doc_id")
    },

    // ---- Q-fn-arr-02: array set algebra (union/intersect/except),
    // flatten, zip_with, position, repeat. Set-op outputs are sorted then
    // string-joined: set operations define membership, not order, so the
    // canonical form is the sorted rendering (and the driver compare needs
    // scalar cells anyway).
    "Q-fn-arr-02" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("words", split(col("text"), " "))
        .withColumn("a", slice(col("words"), 1, 6))
        .withColumn("b", slice(col("words"), 4, 6))
        .select(
          col("doc_id"),
          array_join(sort_array(array_union(col("a"), col("b"))), ",").as("u"),
          array_join(sort_array(array_intersect(col("a"), col("b"))), ",").as("i"),
          array_join(sort_array(array_except(col("a"), col("b"))), ",").as("e"),
          size(array_distinct(col("words"))).cast("bigint").as("n_distinct"),
          array_join(flatten(array(slice(col("a"), 1, 2), slice(col("b"), 1, 2))), ",").as("flat"),
          array_join(zip_with(slice(col("a"), 1, 3), slice(col("b"), 1, 3),
            (x, y) => concat(x, lit("_"), y)), ",").as("zipped"),
          array_position(col("words"), "the").cast("bigint").as("pos_the"),
          array_join(array_repeat(element_at(col("words"), 1),
            (col("doc_id") % 3 + 1).cast("int")), ",").as("rep"))
        .orderBy("doc_id")
    },

    // ---- Q-fn-map-01: map family (construct, keys/values, explode, lookup)
    "Q-fn-map-01" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("m", from_json(col("props"), lit("map<string,bigint>")))
        .select(
          col("event_id"), col("m"),
          // string-serialized for the driver compare (pandas can't sort lists)
          array_join(map_keys(col("m")), ",").as("keys"),
          element_at(map_values(col("m")), 1).as("first_val"),
          element_at(col("m"), "k").as("k_val"))
        .withColumn("entry", explode(map_entries(col("m"))))
        .drop("m")
        .select(
          col("event_id"), col("keys"), col("first_val"), col("k_val"),
          col("entry.key").as("entry_key"), col("entry.value").as("entry_value"))
        .orderBy("event_id")
    },

    // ---- Q-fn-json-01: JSON family over events.props
    "Q-fn-json-01" -> { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_num"),
        from_json(col("props"), lit("k BIGINT")).getField("k").as("k_struct"),
        json_tuple(col("props"), "k").as(Seq("k_tuple")),
        to_json(struct(col("event_id").as("id"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k"))).as("rebuilt"))
        .orderBy("event_id")
    },

    // ---- Q-fn-bin-01: binary/hash family — digests, base64/hex codecs,
    // byte length, and a base64 round-trip check (documents text is ASCII,
    // so string bytes == UTF-8 bytes on both engines)
    "Q-fn-bin-01" -> { (s, d) =>
      val bin = col("text").cast("binary")
      Tables.documents(s, d).filter(col("doc_id") < 200).select(
        col("doc_id"),
        sha2(bin, 256).as("sha256"),
        md5(col("text")).as("md5"),
        // Spark's base64 is MIME-flavored (CRLF every 76 chars); strip the
        // breaks for the canonical unchunked form DuckDB emits
        regexp_replace(base64(bin), "[\\r\\n]", "").as("b64"),
        lower(hex(substring(bin, 1, 16))).as("hex16"),
        length(bin).cast("bigint").as("n_bytes"),
        (decode(unbase64(base64(bin)), "UTF-8") === col("text")).as("b64_rt"))
        .orderBy("doc_id")
    },

    // ---- Q-fn-cond-01: conditional/null-handling family — coalesce,
    // nullif, nvl2 (oracle renders it as the equivalent CASE), greatest/
    // least with null propagation, ifnull
    "Q-fn-cond-01" -> { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        expr("nullif(o_orderkey % 3, 0)").as("mod_or_null"),
        coalesce(expr("nullif(o_orderstatus, 'O')"), lit("open")).as("status_or_open"),
        expr("nvl2(nullif(o_orderkey % 3, 0), 'nonzero', 'zero')").as("nvl2_tag"),
        greatest(col("o_totalprice"), lit(100000.0),
          col("o_orderkey").cast("double")).as("g3"),
        least(col("o_totalprice"), lit(100000.0),
          col("o_orderkey").cast("double")).as("l3"),
        expr("ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT!')").as("prio_or"))
        .orderBy("o_orderkey")
    },

    // ---- Q-fn-bit-01: bitwise family — and/or/xor/not, shifts, popcount.
    // (Bitwise NOT is exercised Spark-side via `~`; the oracle renders it
    // as the two's-complement identity -1-x, which DuckDB lacks an
    // unambiguous `~` for.)
    "Q-fn-bit-01" -> { (s, d) =>
      Tables.lineitem(s, d)
        .orderBy("l_orderkey", "l_linenumber").limit(2000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_orderkey").bitwiseAND(col("l_partkey")).as("b_and"),
          col("l_orderkey").bitwiseOR(col("l_partkey")).as("b_or"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
          expr("~l_orderkey").as("b_not"),
          shiftleft(col("l_linenumber"), 3).cast("bigint").as("shl"),
          shiftright(col("l_partkey"), 2).as("shr"),
          bit_count(col("l_orderkey")).cast("bigint").as("popcnt"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- Q-fn-try-01: try_* safety family. The session runs ANSI mode
    // (Spark 4 default) — arithmetic/cast faults THROW instead of silently
    // corrupting, and the try_* variants are the explicit opt-in to
    // null-on-fault. A 100 TB job wants the throw-by-default + targeted
    // try_* combination: one bad row can't silently poison an aggregate,
    // and expected-dirty columns are handled without failing the job.
    "Q-fn-try-01" -> { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)").as("prio_num"),
        expr("try_cast(o_orderstatus AS BIGINT)").as("status_num"), // 'F'/'O'/'P' -> null
        Portable.r(expr("try_divide(o_totalprice, o_orderkey % 3)"), 6)
          .as("per_mod"), // divisor 0 -> null, not an error
        expr("try_element_at(split(o_orderpriority, '-'), 2)").as("prio_word"),
        expr("try_element_at(split(o_orderpriority, '-'), 5)").as("oob")) // -> null
        .orderBy("o_orderkey")
    },

    // ---- Q-fn-str-02: string family 2 — edit distance, char codecs,
    // printf formatting, casing, positional split. All codegen built-ins;
    // initcap is rendered on the oracle side as upper(head)||lower(tail)
    // (single-word input) since DuckDB has no initcap.
    "Q-fn-str-02" -> { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000001")).cast("bigint").as("lev"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
        reverse(col("c_name")).as("rev"),
        repeat(col("c_mktsegment"), 2).as("rep2"),
        ascii(col("c_mktsegment")).cast("bigint").as("asc1"),
        expr("chr(65 + c_custkey % 26)").as("chr_mod"),
        instr(col("c_name"), "#").cast("bigint").as("hash_pos"),
        format_string("%s=%07d", col("c_mktsegment"), col("c_custkey")).as("fmt"),
        initcap(lower(col("c_mktsegment"))).as("cap"),
        col("c_name").startsWith("Customer").as("is_cust"),
        expr("split_part(c_name, '#', 2)").as("part2"),
        rpad(col("c_mktsegment"), 12, ".").as("rp"))
        .orderBy("c_custkey")
    },

    // ---- Q-fn-date-02: date/time family 2 — calendar arithmetic with
    // day-clamping (add_months), month-end/next-weekday navigation, ISO
    // week numbering, month-boundary diffs. next_day is rendered on the
    // oracle side via isodow arithmetic (strictly-after semantics: a
    // Monday input yields the NEXT Monday, +7).
    "Q-fn-date-02" -> { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        add_months(col("o_orderdate"), 2).as("plus2m"),
        last_day(col("o_orderdate")).as("eom"),
        quarter(col("o_orderdate")).cast("bigint").as("qtr"),
        dayofyear(col("o_orderdate")).cast("bigint").as("doy"),
        weekofyear(col("o_orderdate")).cast("bigint").as("iso_wk"),
        next_day(col("o_orderdate"), "Mon").as("next_mon"),
        months_between(date_trunc("month", lit("1998-12-01").cast("timestamp")),
          date_trunc("month", col("o_orderdate"))).cast("bigint").as("months_to_end"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        make_date(year(col("o_orderdate")), month(col("o_orderdate")), lit(1)).as("som"),
        date_trunc("week", col("o_orderdate")).cast("date").as("wk_start"))
        .orderBy("o_orderkey")
    },

    // ---- Q-fn-arr-03: array family 3 — predicate higher-order functions
    // (exists / forall), membership position, distinct+sort
    // canonicalization, and null-compaction counting. All codegen-capable
    // lambdas over a bounded slice.
    "Q-fn-arr-03" -> { (s, d) =>
      val ws8 = slice(split(col("text"), " "), 1, 8)
      Tables.documents(s, d).select(
        col("doc_id"),
        exists(ws8, w => length(w) > 6).as("has_long"),
        forall(ws8, w => length(w) >= 1).as("all_nonempty"),
        array_position(ws8, "table").cast("bigint").as("pos_table"),
        array_join(array_sort(array_distinct(ws8)), ",").as("uniq"),
        size(array_compact(transform(ws8, w => when(w =!= "the", w))))
          .cast("bigint").as("n_non_the"))
        .orderBy("doc_id")
    },

    // ---- Q-fn-str-03: case-insensitive COLLATION (Spark 4 collated
    // strings) — grouping under UTF8_LCASE merges case variants without
    // materializing a normalized key column; the emitted label is
    // lowercased so the representative choice can't leak into the result.
    "Q-fn-str-03" -> { (s, d) =>
      Tables.customer(s, d)
        .withColumn("seg_mixed",
          when(col("c_custkey") % 2 === 0, initcap(lower(col("c_mktsegment"))))
            .otherwise(col("c_mktsegment")))
        .groupBy(expr("collate(seg_mixed, 'UTF8_LCASE')").as("k"))
        .agg(count(lit(1)).as("n"))
        .select(lower(col("k")).cast("string").as("segment"), col("n"))
        .orderBy("segment")
    },

    // ---- Q-fn-var-01: VARIANT — Spark 4's semi-structured column type:
    // parse once into a binary-encoded variant, then typed path extraction
    // (variant_get) and safe extraction of a missing path (try_variant_get
    // -> null, never a throw). At 100 TB variant beats re-parsing JSON
    // text per access and shreds into columnar storage. The oracle reads
    // the same paths with DuckDB's JSON extraction.
    "Q-fn-var-01" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(
          col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k"),
          try_variant_get(col("v"), "$.missing", "string").as("gone"),
          (variant_get(col("v"), "$.k", "bigint") % 10).as("k_mod"))
        .orderBy("event_id")
    },

    // ---- Q-fn-url-01: URL parsing — host/path/query/parameter extraction
    // with parse_url (codegen built-in). The oracle renders the same
    // extractions as anchored regexes over the identically-constructed URL.
    "Q-fn-url-01" -> { (s, d) =>
      Tables.customer(s, d)
        .withColumn("url",
          concat(lit("https://"), lower(col("c_mktsegment")), lit(".example.com/u/"),
            col("c_custkey"), lit("?seg="), col("c_mktsegment"),
            lit("&k="), col("c_custkey") % 7))
        .select(
          col("c_custkey"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("seg")).as("seg"),
          parse_url(col("url"), lit("QUERY"), lit("k")).as("kparam"))
        .orderBy("c_custkey")
    },

    // ---- Q-fn-tz-01: timezone conversion — wall-clock <-> instant in a
    // named zone, DST-correct (the order dates span years of both DST
    // phases). Outputs are instants (epoch micros) or zone-local field
    // values, so the comparison never depends on either engine's session
    // timezone.
    "Q-fn-tz-01" -> { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        unix_micros(to_utc_timestamp(col("o_orderdate"), "America/New_York"))
          .as("ny_utc_us"),
        unix_micros(to_utc_timestamp(col("o_orderdate"), "Asia/Tokyo"))
          .as("tokyo_utc_us"),
        hour(from_utc_timestamp(col("o_orderdate"), "America/New_York"))
          .cast("bigint").as("ny_hour"))
        .orderBy("o_orderkey")
    },

    // ---- Q-fn-gen-01: generator with ordinality — posexplode gives each
    // exploded row its position (the UDTF shape for order-sensitive
    // fan-out); the oracle reproduces ordinality with a bounded series
    // join.
    "Q-fn-gen-01" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(slice(split(col("text"), " "), 1, 10)))
        .withColumnRenamed("pos", "pos0")
        .select(col("doc_id"), col("pos0").cast("bigint").as("pos"), col("col").as("word"))
        .orderBy("doc_id", "pos")
    },

    // ---- Q-fn-regex-01: regex family — match counting, extract-all with
    // a capture group, first-match extraction, boolean match. Patterns stay
    // in the Java∩RE2 dialect (no backreferences, no lookaround) so both
    // engines produce identical leftmost-greedy matches.
    "Q-fn-regex-01" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        regexp_count(col("text"), lit("table")).cast("bigint").as("n_table"),
        size(regexp_extract_all(col("text"), lit("(s\\w+)"), lit(1)))
          .cast("bigint").as("n_swords"),
        array_join(slice(regexp_extract_all(col("text"), lit("(s\\w+)"), lit(1)),
          1, 5), ",").as("first5_s"),
        regexp_extract(col("text"), "(b\\w+)", 1).as("first_b"),
        col("text").rlike("vector").as("has_vector"))
        .orderBy("doc_id")
    },

    // ---- Q-fn-struct-01: struct family — nested construction, dot-path
    // field access, JSON projection of a struct, and lexicographic struct
    // comparison (the sort-key idiom for multi-column ordering carried as
    // one value).
    "Q-fn-struct-01" -> { (s, d) =>
      Tables.orders(s, d)
        .withColumn("o", struct(col("o_orderkey").as("key"),
          struct(col("o_orderstatus").as("st"),
            col("o_totalprice").as("tp")).as("inner")))
        .select(
          col("o_orderkey"),
          col("o.inner.st").as("st"),
          col("o.inner.tp").as("tp"),
          to_json(struct(col("o.key").as("k"),
            col("o.inner.st").as("s"))).as("js"),
          (struct(col("o_orderstatus"), col("o_orderpriority")) <
            struct(lit("O"), lit("3-MEDIUM"))).as("lt_probe"))
        .orderBy("o_orderkey")
    },

    // ---- Q-fn-map-02: map family 2 — construction (map_from_arrays,
    // str_to_map), higher-order rewrites (map_filter, transform_keys,
    // transform_values, map_zip_with), and merge (map_concat). Outputs
    // are scalar lookups / canonically-joined keys, so the oracle
    // recomputes the expected values directly from the same inputs (the
    // Q-fn-url-01 pattern): map semantics are exercised on the Spark
    // side, the values verified on both.
    "Q-fn-map-02" -> { (s, d) =>
      val m = map(
        lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string"))
      val merged = map_concat(m, map(lit("src"), lit("events")))
      val zipped = map_zip_with(m, transform_values(m, (_, v) => upper(v)),
        (_, lo, hi) => concat(lo, lit("|"), hi))
      Tables.events(s, d).select(
        col("event_id"),
        element_at(map_filter(merged, (k, _) => k =!= lit("src")), "type").as("typ"),
        element_at(transform_keys(m, (k, _) => upper(k)), "UID").as("uid_str"),
        element_at(transform_values(m, (_, v) => concat(lit("v:"), v)), "type").as("typ_tag"),
        size(merged).cast("bigint").as("n_entries"),
        array_join(sort_array(map_keys(merged)), ",").as("keys_sorted"),
        element_at(zipped, "type").as("typ_zip"),
        element_at(expr("str_to_map('a:1,b:2', ',', ':')"), "b").as("b_val"),
        element_at(map_from_arrays(array(lit("x"), lit("y")),
          array(col("user_id"), col("user_id") * 2)), "y").as("uid2"))
        .orderBy("event_id")
    },

    // ---- Q-fn-gen-02: generators stack + inline — stack() is the
    // wide→long unpivot generator (n output rows per input row), inline()
    // explodes an array of structs into columns. Both fan-outs are narrow
    // (no shuffle); the oracle renders each as a UNION ALL. Money is
    // carried as exact integer cents (the portable floor-round) so the
    // stringified value is engine-independent.
    "Q-fn-gen-02" -> { (s, d) =>
      val stacked = Tables.customer(s, d).selectExpr("c_custkey",
        "stack(2, 'name', c_name, 'segment', c_mktsegment) AS (attr, val)")
      val inlined = Tables.customer(s, d).selectExpr("c_custkey",
        """inline(array(
             struct('acct_cents' AS attr,
               cast(cast(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS STRING) AS val),
             struct('nation' AS attr, cast(c_nationkey AS STRING) AS val)))""")
      stacked.unionAll(inlined).orderBy("c_custkey", "attr")
    },

    // ---- Q-fn-str-06: string family 4 — splice (overlay), search
    // (locate / find_in_set), whitespace padding (space), prefix
    // extraction (substring_index), and positional argument pick (elt).
    // DuckDB has none of these by name, so the oracle renders each via
    // substr/strpos/CASE/list_position algebra.
    "Q-fn-str-06" -> { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        overlay(col("c_name"), lit("XX"), lit(3)).as("spliced"),
        locate("0", col("c_name")).cast("bigint").as("zero_at"),
        concat(col("c_mktsegment"), expr("space(2)"), col("c_name")).as("spaced"),
        substring_index(col("c_name"), "0", 1).as("head0"),
        expr("elt(1 + c_custkey % 2, 'even-slot', 'odd-slot')").as("slot"),
        expr("find_in_set(c_mktsegment, " +
          "'BUILDING,AUTOMOBILE,MACHINERY,HOUSEHOLD,FURNITURE')")
          .cast("bigint").as("seg_slot"))
        .orderBy("c_custkey")
    },

    // ---- Q-fn-date-03: timestamp arithmetic family — timestampadd /
    // timestampdiff, make_timestamp, microsecond epoch. CAUTION pinned
    // here: Spark's timestampdiff counts COMPLETE elapsed units while
    // DuckDB's date_diff counts boundary crossings — the oracle renders
    // the diff as floor-divided epoch microseconds (equivalent for a
    // start bound ≤ every event time), never date_diff.
    "Q-fn-date-03" -> { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        expr("timestampadd(MINUTE, 90, ts)").as("plus90m"),
        expr("timestampadd(HOUR, -2, ts)").as("minus2h"),
        expr("timestampdiff(MINUTE, timestamp'2024-01-01 00:00:00', ts)")
          .cast("bigint").as("min_since"),
        expr("timestampdiff(DAY, timestamp'2024-01-01 00:00:00', ts)")
          .cast("bigint").as("day_since"),
        expr("make_timestamp(2024, 3, 1, 12, 30, 0)").as("fixed_ts"),
        unix_micros(col("ts")).as("epoch_us"))
        .orderBy("event_id")
    },

    // ---- Q-fn-str-07: mask() redaction family (the FUNCTION-level twin
    // of Q-llm-31's regex PII scrub): class-preserving masking with
    // default, custom, and partial (digits-only) replacement characters,
    // plus the NULL-replacement identity. The oracle renders each as a
    // chain of class regexp_replaces ordered so no pass re-matches a
    // character an earlier pass introduced.
    "Q-fn-str-07" -> { (s, d) =>
      Tables.customer(s, d).select(
          col("c_custkey"),
          expr("mask(c_name)").as("masked"),
          expr("mask(c_name, 'U', 'l', '#', '*')").as("custom"),
          expr("mask(c_name, NULL, NULL, '9', NULL)").as("digits_only"),
          expr("mask(c_mktsegment, NULL, NULL, NULL, NULL)").as("unmasked"))
        .orderBy("c_custkey")
    },

    // ---- Q-fn-csv-01: string-level CSV codec (from_csv / to_csv — the
    // FUNCTION twins of the CSV source/sink): a constructed line is
    // parsed under an explicit schema, fields extracted typed, and a
    // struct serialized back to a line. The embedded-text path for CSV
    // payloads living inside another column (Kafka values, log fields).
    "Q-fn-csv-01" -> { (s, d) =>
      val line = concat_ws(",",
        col("n_nationkey"), col("n_name"), col("n_regionkey"))
      Tables.nation(s, d)
        .withColumn("parsed",
          from_csv(line,
            org.apache.spark.sql.types.StructType.fromDDL(
              "k INT, name STRING, rk INT"),
            Map.empty[String, String]))
        .select(
          col("n_nationkey"),
          col("parsed.k").cast("bigint").as("k"),
          col("parsed.name").as("name"),
          col("parsed.rk").cast("bigint").as("rk"),
          to_csv(struct(col("parsed.name"), col("parsed.rk"))).as("reline"))
        .orderBy("n_nationkey")
    },

    // ---- Q-fn-xml-01: XPath function family (xpath_string / xpath_int /
    // xpath node-set) over an XML payload constructed per row — the
    // embedded-markup twin of Q-scan-14's XML source. The oracle
    // recomputes the extracted values from the same inputs.
    "Q-fn-xml-01" -> { (s, d) =>
      Tables.nation(s, d).select(
          col("n_nationkey"),
          expr(s"xpath_string(${xmlExpr}, '/r/n')").as("name"),
          expr(s"xpath_int(${xmlExpr}, '/r/k')").cast("bigint").as("k"),
          array_join(expr(s"xpath(${xmlExpr}, '/r/*/text()')"), ",").as("all_text"))
        .orderBy("n_nationkey")
    }
  )

  // the XML payload constructed inline (shared by Q-fn-xml-01's columns)
  private val xmlExpr =
    "concat('<r><k>', n_nationkey, '</k><n>', n_name, '</n></r>')"

  val oracle: Map[String, String] = Map(
    "Q-fn-str-01" ->
      """SELECT c_custkey,
                concat(c_name, '_', c_mktsegment) AS cat,
                substring(c_name, 1, 8) AS sub,
                upper(c_mktsegment) AS up,
                lower(c_name) AS lo,
                lpad(c_name, 25, '*') AS padded,
                length(c_name)::BIGINT AS len,
                regexp_replace(c_name, 'Customer', 'Cust', 'g') AS repl,
                regexp_extract(c_name, '([0-9]+)', 1) AS digits,
                str_split(c_name, '#')[2] AS num_part,
                c_name LIKE '%1' AS ends_in_1,
                trim(lpad(c_mktsegment, 15, ' ')) AS trimmed
         FROM customer ORDER BY c_custkey""",
    "Q-fn-date-01" ->
      """SELECT o_orderkey,
                date_trunc('month', o_orderdate) AS month_start,
                year(o_orderdate)::BIGINT AS yr,
                month(o_orderdate)::BIGINT AS mo,
                (dayofweek(o_orderdate) + 1)::BIGINT AS dow,
                (o_orderdate + INTERVAL 30 DAY)::DATE AS plus30,
                datediff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS days_since,
                epoch_ms(o_orderdate) AS epoch_millis,
                strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted
         FROM orders ORDER BY o_orderkey""",
    "Q-fn-arr-03" ->
      """SELECT doc_id,
                len(list_filter(ws8, w -> len(w) > 6)) > 0 AS has_long,
                len(list_filter(ws8, w -> len(w) >= 1)) = len(ws8) AS all_nonempty,
                coalesce(list_position(ws8, 'table'), 0)::BIGINT AS pos_table,
                coalesce(array_to_string(list_sort(list_distinct(ws8)), ','), '')
                  AS uniq,
                len(list_filter(ws8, w -> w <> 'the'))::BIGINT AS n_non_the
         FROM (SELECT doc_id, string_split(text, ' ')[1:8] AS ws8 FROM documents)
         ORDER BY doc_id""",
    "Q-fn-str-03" ->
      """SELECT lower(seg_mixed) AS segment, count(*)::BIGINT AS n
         FROM (SELECT CASE WHEN c_custkey % 2 = 0
                           THEN upper(substring(lower(c_mktsegment), 1, 1))
                                  || substring(lower(c_mktsegment), 2)
                           ELSE c_mktsegment END AS seg_mixed
               FROM customer)
         GROUP BY 1 ORDER BY 1""",
    "Q-fn-var-01" ->
      """SELECT event_id,
                json_extract(props, '$.k')::BIGINT AS k,
                json_extract_string(props, '$.missing') AS gone,
                (json_extract(props, '$.k')::BIGINT % 10) AS k_mod
         FROM events ORDER BY event_id""",
    "Q-fn-url-01" ->
      """SELECT c_custkey, host, path, query,
                regexp_extract(query, '(^|&)seg=([^&]*)', 2) AS seg,
                regexp_extract(query, '(^|&)k=([^&]*)', 2) AS kparam
         FROM (SELECT c_custkey,
                      regexp_extract(url, '^https://([^/]+)', 1) AS host,
                      regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
                      regexp_extract(url, '\?(.*)$', 1) AS query
               FROM (SELECT c_custkey,
                            'https://' || lower(c_mktsegment) || '.example.com/u/'
                              || c_custkey || '?seg=' || c_mktsegment
                              || '&k=' || (c_custkey % 7) AS url
                     FROM customer))
         ORDER BY c_custkey""",
    "Q-fn-tz-01" ->
      """SELECT o_orderkey,
                epoch_us(timezone('America/New_York', o_orderdate)) AS ny_utc_us,
                epoch_us(timezone('Asia/Tokyo', o_orderdate)) AS tokyo_utc_us,
                hour(timezone('America/New_York',
                     to_timestamp(epoch_ms(o_orderdate) / 1000.0)))::BIGINT AS ny_hour
         FROM orders ORDER BY o_orderkey""",
    "Q-fn-gen-01" ->
      """SELECT doc_id, i AS pos, ws[i + 1] AS word
         FROM (SELECT doc_id, string_split(text, ' ')[1:10] AS ws FROM documents),
              (SELECT unnest(generate_series(0, 9)) AS i)
         WHERE i < len(ws)
         ORDER BY doc_id, pos""",
    "Q-fn-regex-01" ->
      """SELECT doc_id,
                len(regexp_extract_all(text, 'table'))::BIGINT AS n_table,
                len(regexp_extract_all(text, '(s\w+)', 1))::BIGINT AS n_swords,
                coalesce(array_to_string(regexp_extract_all(text, '(s\w+)', 1)[1:5],
                         ','), '') AS first5_s,
                regexp_extract(text, '(b\w+)', 1) AS first_b,
                regexp_matches(text, 'vector') AS has_vector
         FROM documents ORDER BY doc_id""",
    "Q-fn-str-02" ->
      """SELECT c_custkey,
                levenshtein(c_name, 'Customer#000000001')::BIGINT AS lev,
                translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
                reverse(c_name) AS rev,
                repeat(c_mktsegment, 2) AS rep2,
                ascii(c_mktsegment)::BIGINT AS asc1,
                chr((65 + c_custkey % 26)::INT) AS chr_mod,
                instr(c_name, '#')::BIGINT AS hash_pos,
                printf('%s=%07d', c_mktsegment, c_custkey) AS fmt,
                upper(substring(lower(c_mktsegment), 1, 1))
                  || substring(lower(c_mktsegment), 2) AS cap,
                c_name LIKE 'Customer%' AS is_cust,
                split_part(c_name, '#', 2) AS part2,
                rpad(c_mktsegment, 12, '.') AS rp
         FROM customer ORDER BY c_custkey""",
    "Q-fn-date-02" ->
      """SELECT o_orderkey,
                (o_orderdate::DATE + INTERVAL 2 MONTH)::DATE AS plus2m,
                last_day(o_orderdate::DATE) AS eom,
                quarter(o_orderdate)::BIGINT AS qtr,
                dayofyear(o_orderdate)::BIGINT AS doy,
                weekofyear(o_orderdate)::BIGINT AS iso_wk,
                (o_orderdate::DATE + (8 - isodow(o_orderdate))::INT) AS next_mon,
                datediff('month', date_trunc('month', o_orderdate),
                         TIMESTAMP '1998-12-01')::BIGINT AS months_to_end,
                strftime(o_orderdate, '%Y-%m') AS ym,
                make_date(year(o_orderdate)::INT, month(o_orderdate)::INT, 1) AS som,
                date_trunc('week', o_orderdate)::DATE AS wk_start
         FROM orders ORDER BY o_orderkey""",
    "Q-fn-struct-01" ->
      """SELECT o_orderkey,
                o_orderstatus AS st,
                o_totalprice AS tp,
                to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS js,
                (o_orderstatus < 'O' OR
                 (o_orderstatus = 'O' AND o_orderpriority < '3-MEDIUM')) AS lt_probe
         FROM orders ORDER BY o_orderkey""",
    "Q-fn-math-01" ->
      s"""SELECT l_orderkey, l_linenumber,
                abs(l_quantity - 25) AS abs_dev,
                ceil(l_extendedprice)::BIGINT AS ceiled,
                floor(l_extendedprice)::BIGINT AS floored,
                ${Portable.rSql("sqrt(l_extendedprice)", 6)} AS sqrt_price,
                ${Portable.rSql("pow(l_discount + 1.0, 3)", 6)} AS pow3,
                ${Portable.rSql("ln(l_extendedprice)", 6)} AS ln_price,
                ${Portable.rSql("log10(l_extendedprice)", 6)} AS log10_price,
                sign(l_quantity - 25)::BIGINT AS sgn,
                (l_orderkey % 7)::BIGINT AS mod7
         FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 2000)
         ORDER BY l_orderkey, l_linenumber""",
    "Q-fn-math-02" ->
      s"""SELECT l_orderkey, l_linenumber,
                ${Portable.rSql("sin(l_discount)", 6)} AS sin_x,
                ${Portable.rSql("cos(l_discount)", 6)} AS cos_x,
                ${Portable.rSql("tan(l_discount)", 6)} AS tan_x,
                ${Portable.rSql("asin(l_quantity / 50.0)", 6)} AS asin_u,
                ${Portable.rSql("acos(l_quantity / 50.0)", 6)} AS acos_u,
                ${Portable.rSql("atan2(l_quantity / 50.0, l_discount + 1.0)", 6)} AS atan2_ux,
                ${Portable.rSql("degrees(l_quantity / 50.0)", 6)} AS deg_u,
                ${Portable.rSql("radians(l_quantity)", 6)} AS rad_q,
                ${Portable.rSql("cbrt(l_extendedprice)", 6)} AS cbrt_price,
                ${Portable.rSql("exp(l_discount)", 6)} AS exp_x,
                ${Portable.rSql("log2(l_extendedprice)", 6)} AS log2_price,
                factorial(l_linenumber)::BIGINT AS fact_line
         FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 2000)
         ORDER BY l_orderkey, l_linenumber""",
    "Q-fn-str-04" ->
      """SELECT c_custkey,
                ascii(c_mktsegment)::BIGINT AS seg_ascii,
                chr((65 + c_custkey % 26)::INT) AS bucket_chr,
                left(c_name, 8) AS name_l8,
                right(c_name, 3) AS name_r3,
                coalesce(strpos(c_name, '0'), 0)::BIGINT AS first_zero,
                translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
                reverse(c_name) AS name_rev,
                repeat(c_mktsegment, 2) AS seg_twice
         FROM customer ORDER BY c_custkey""",
    "Q-fn-json-02" ->
      """SELECT event_id,
                to_json([user_id % 5, event_id % 7,
                         json_extract(props, '$.k')::BIGINT])::VARCHAR AS arr_json,
                to_json(map(['uid', 'k'],
                            [user_id % 5, json_extract(props, '$.k')::BIGINT]))::VARCHAR
                  AS obj_json,
                json_array_length(to_json([user_id, event_id,
                         json_extract(props, '$.k')::BIGINT,
                         json_extract(props, '$.k')::BIGINT])::VARCHAR)::BIGINT AS arr_len,
                json_extract_string('{"a":[{"b":' || json_extract(props, '$.k') || '}]}',
                                    '$.a[0].b') AS nested_b
         FROM events WHERE event_id < 2000 ORDER BY event_id""",
    "Q-fn-str-05" ->
      """SELECT p_partkey,
                split_part(p_type, ' ', 1) AS type_head,
                split_part(p_type, ' ', -1) AS type_tail,
                printf('%s|%06d', p_brand, p_partkey) AS tag,
                contains(p_name, 'a') AS has_a,
                starts_with(p_name, 'p') AS p_start,
                ends_with(p_type, 'D') AS d_end
         FROM part ORDER BY p_partkey""",
    "Q-fn-arr-01" ->
      """SELECT doc_id,
                len(words)::BIGINT AS n_words,
                list_contains(words, 'spark') AS has_spark,
                list_sort(words)[1] AS first_sorted,
                array_to_string(list_reverse_sort(words)[1:3], ',') AS top3_desc,
                array_to_string(list_transform(words[1:5], w -> upper(w)), ',') AS first5_upper,
                len(list_filter(words, w -> length(w) > 4))::BIGINT AS n_long_words,
                list_sum(list_transform(words, w -> length(w)))::BIGINT AS total_chars
         FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
         ORDER BY doc_id""",
    "Q-fn-arr-02" ->
      """SELECT doc_id,
                coalesce(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS u,
                coalesce(array_to_string(list_sort(list_distinct(list_filter(a, x -> list_contains(b, x)))), ','), '') AS i,
                coalesce(array_to_string(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b, x)))), ','), '') AS e,
                len(list_distinct(words))::BIGINT AS n_distinct,
                coalesce(array_to_string(list_concat(a[1:2], b[1:2]), ','), '') AS flat,
                coalesce(array_to_string(list_transform(generate_series(1, least(3, len(a), len(b))),
                                               i -> a[i] || '_' || b[i]), ','), '') AS zipped,
                coalesce(list_position(words, 'the'), 0)::BIGINT AS pos_the,
                coalesce(array_to_string(list_transform(generate_series(1, ((doc_id % 3) + 1)::INT),
                                               i -> words[1]), ','), '') AS rep
         FROM (SELECT doc_id, words, words[1:6] AS a, words[4:9] AS b
               FROM (SELECT doc_id, str_split(text, ' ') AS words FROM documents))
         ORDER BY doc_id""",
    "Q-fn-map-01" ->
      """SELECT event_id,
                k AS keys,
                v AS first_val,
                v AS k_val,
                k AS entry_key,
                v AS entry_value
         FROM (SELECT event_id,
                      'k' AS k,
                      json_extract_string(props, '$.k')::BIGINT AS v
               FROM events)
         ORDER BY event_id""",
    "Q-fn-json-01" ->
      """SELECT event_id,
                json_extract_string(props, '$.k')::BIGINT AS k_num,
                json_extract_string(props, '$.k')::BIGINT AS k_struct,
                json_extract_string(props, '$.k') AS k_tuple,
                '{"id":' || event_id || ',"k":' || json_extract_string(props, '$.k') || '}' AS rebuilt
         FROM events ORDER BY event_id""",
    "Q-fn-bin-01" ->
      """SELECT doc_id,
                sha256(text) AS sha256,
                md5(text) AS md5,
                base64(text::BLOB) AS b64,
                lower(hex(substring(text, 1, 16)::BLOB)) AS hex16,
                octet_length(text::BLOB)::BIGINT AS n_bytes,
                (from_base64(base64(text::BLOB))::VARCHAR = text) AS b64_rt
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    "Q-fn-cond-01" ->
      """SELECT o_orderkey,
                nullif(o_orderkey % 3, 0) AS mod_or_null,
                coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
                CASE WHEN nullif(o_orderkey % 3, 0) IS NOT NULL
                     THEN 'nonzero' ELSE 'zero' END AS nvl2_tag,
                greatest(o_totalprice, 100000.0, o_orderkey::DOUBLE) AS g3,
                least(o_totalprice, 100000.0, o_orderkey::DOUBLE) AS l3,
                coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_or
         FROM orders ORDER BY o_orderkey""",
    "Q-fn-bit-01" ->
      """SELECT l_orderkey, l_linenumber,
                (l_orderkey & l_partkey) AS b_and,
                (l_orderkey | l_partkey) AS b_or,
                xor(l_orderkey, l_partkey) AS b_xor,
                (-1 - l_orderkey) AS b_not,
                CAST(l_linenumber << 3 AS BIGINT) AS shl,
                (l_partkey >> 2) AS shr,
                CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt
         FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 2000)
         ORDER BY l_orderkey, l_linenumber""",
    "Q-fn-try-01" ->
      s"""SELECT o_orderkey,
                TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
                TRY_CAST(o_orderstatus AS BIGINT) AS status_num,
                ${Portable.rSql("o_totalprice / nullif(o_orderkey % 3, 0)", 6)} AS per_mod,
                str_split(o_orderpriority, '-')[2] AS prio_word,
                str_split(o_orderpriority, '-')[5] AS oob
         FROM orders ORDER BY o_orderkey""",
    "Q-fn-map-02" ->
      """SELECT event_id,
                event_type AS typ,
                CAST(user_id AS VARCHAR) AS uid_str,
                'v:' || event_type AS typ_tag,
                3::BIGINT AS n_entries,
                'src,type,uid' AS keys_sorted,
                event_type || '|' || upper(event_type) AS typ_zip,
                '2' AS b_val,
                user_id * 2 AS uid2
         FROM events ORDER BY event_id""",
    "Q-fn-gen-02" ->
      """SELECT c_custkey, attr, val FROM (
           SELECT c_custkey, 'name' AS attr, c_name AS val FROM customer
           UNION ALL
           SELECT c_custkey, 'segment', c_mktsegment FROM customer
           UNION ALL
           SELECT c_custkey, 'acct_cents',
                  CAST(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR)
           FROM customer
           UNION ALL
           SELECT c_custkey, 'nation', CAST(c_nationkey AS VARCHAR) FROM customer)
         ORDER BY c_custkey, attr""",
    "Q-fn-str-06" ->
      """SELECT c_custkey,
                substr(c_name, 1, 2) || 'XX' || substr(c_name, 5) AS spliced,
                strpos(c_name, '0')::BIGINT AS zero_at,
                c_mktsegment || '  ' || c_name AS spaced,
                CASE WHEN strpos(c_name, '0') = 0 THEN c_name
                     ELSE substr(c_name, 1, strpos(c_name, '0') - 1)
                END AS head0,
                CASE WHEN c_custkey % 2 = 0 THEN 'even-slot' ELSE 'odd-slot' END AS slot,
                list_position(
                  str_split('BUILDING,AUTOMOBILE,MACHINERY,HOUSEHOLD,FURNITURE', ','),
                  c_mktsegment)::BIGINT AS seg_slot
         FROM customer ORDER BY c_custkey""",
    "Q-fn-str-07" ->
      """SELECT c_custkey,
                regexp_replace(regexp_replace(regexp_replace(c_name,
                  '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
                  AS masked,
                regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                  c_name, '[^A-Za-z0-9]', '*', 'g'), '[A-Z]', 'U', 'g'),
                  '[a-z]', 'l', 'g'), '[0-9]', '#', 'g') AS custom,
                regexp_replace(c_name, '[0-9]', '9', 'g') AS digits_only,
                c_mktsegment AS unmasked
         FROM customer ORDER BY c_custkey""",
    "Q-fn-csv-01" ->
      """SELECT n_nationkey,
                n_nationkey::BIGINT AS k,
                n_name AS name,
                n_regionkey::BIGINT AS rk,
                n_name || ',' || n_regionkey AS reline
         FROM nation ORDER BY n_nationkey""",
    "Q-fn-xml-01" ->
      """SELECT n_nationkey,
                n_name AS name,
                n_nationkey::BIGINT AS k,
                n_nationkey || ',' || n_name AS all_text
         FROM nation ORDER BY n_nationkey""",
    "Q-fn-date-03" ->
      """SELECT event_id,
                ts + INTERVAL 90 MINUTE AS plus90m,
                ts - INTERVAL 2 HOUR AS minus2h,
                ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                  // 60000000)::BIGINT AS min_since,
                ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                  // 86400000000)::BIGINT AS day_since,
                make_timestamp(2024, 3, 1, 12, 30, 0) AS fixed_ts,
                epoch_us(ts) AS epoch_us
         FROM events ORDER BY event_id"""
  )
}
