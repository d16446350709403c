package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level text primitives for the LLM-pipeline operators
  * (SURVEY.md §2B Q-llm-*): tokenization, shingling, seeded MinHash,
  * SimHash bit algebra. Everything is built-in-composed (codegen'd,
  * no UDFs), and every hash is md5-based so the DuckDB oracle can
  * replicate the algebra byte-for-byte.
  */
object TextFunctions {

  /** Whitespace tokens of a text column. */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles; empty array when the doc is shorter than n.
    * (Guarded: Spark's `sequence(1, 0)` would count DOWN, not return empty.)
    */
  def shingles(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)))
      .otherwise(array())

  /** Exploded word n-gram shingles as rows `(id, sh)` — the scale path for
    * shingle-heavy operators (Q-llm-02/07/12).
    *
    * Equivalent to `explode(shingles(words(text), n))` but formulated as
    * posexplode → per-doc window `lead` → `concat_ws`, which stays entirely
    * in codegen/sort-exec operators. The Column-level `shingles` uses a
    * higher-order `transform`, which Spark evaluates interpreted
    * (CodegenFallback) re-evaluating the `split` inside the lambda per
    * element — O(words·n) interpreted work per doc and single-threaded on a
    * single-file input. This version parallelizes after the first shuffle
    * and leaves the output hash-partitioned by `id`, so a following
    * `distinct()`/`groupBy(id)` needs no further exchange. Docs shorter
    * than n words yield no rows (same as the empty-array explode).
    */
  def shingleRows(df: DataFrame, id: String, text: String, n: Int): DataFrame = {
    val w = Window.partitionBy(id).orderBy("__pos")
    val tok = df.select(col(id), posexplode(split(col(text), " ")))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__w0")
    val leads = (1 until n).map(k => lead("__w0", k).over(w).as(s"__w$k"))
    val cols = Seq(col(id), col("__w0")) ++ leads
    tok.select(cols: _*)
      .filter(col(s"__w${n - 1}").isNotNull)
      .select(col(id),
        concat_ws(" ", (0 until n).map(k => col(s"__w$k")): _*).as("sh"))
  }

  /** Seeded shingle hash: md5 of "<seed>:<shingle>". Lexicographic MIN of
    * these per doc is a MinHash signature row — string min is
    * engine-portable, unlike integer-truncated hashes. */
  def seededHash(seed: Int, shingle: Column): Column =
    md5(concat(lit(s"$seed:"), shingle))

  /** SimHash bit value (0/1) of hex md5 at bit position j (0 = MSB of the
    * first hex digit). Uses only instr/substring arithmetic so DuckDB can
    * replicate it exactly. */
  def md5Bit(hash: Column, j: Int): Column = {
    // conv(hex-digit, 16, 10) == instr('0123456789abcdef', digit)-1 (oracle)
    val digit = conv(substring(hash, 1 + j / 4, 1), 16, 10).cast("bigint")
    shiftright(digit, 3 - (j % 4)) % 2
  }
}
