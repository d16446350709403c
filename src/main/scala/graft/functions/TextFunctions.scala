package graft.functions

import org.apache.spark.sql.Column
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
