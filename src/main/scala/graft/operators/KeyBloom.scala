package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-size per-file key bloom filter, stored HEX-ENCODED in the
  * TxTable commit log alongside per-file [min, max] stats — the
  * point-lookup complement to range pruning: on a layout where every
  * file spans the whole key domain (per-epoch streamed appends), range
  * stats exclude nothing, but a point read can still skip every file
  * whose bloom misses all probed keys — a membership decision that
  * costs ZERO data I/O (the Delta/Parquet bloom-index design, held in
  * the table log so no footer needs opening).
  *
  * m = 65536 bits (8 KiB -> 16 Kchar hex per file), k = 3: ~0.4% false
  * positives at 4k keys/file. A production writer sizes m per file
  * (~10-16 bits/key); membership derives m from the stored hex length,
  * so mixed sizes across commits just work.
  *
  * Hashing is the splitmix64 finalizer over (key + i*C) — pure integer
  * mixing, no library dependency, identical on driver (membership) and
  * executors (construction).
  */
object KeyBloom {

  val Bits = 65536
  val Words: Int = Bits / 64
  val K = 3

  private val C = 0x6A09E667F3BCC909L // sqrt(2) fractional bits, odd

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** k bit positions of a key in an m-bit filter (m a power of two). */
  def positions(key: Long, bits: Int): Array[Int] =
    Array.tabulate(K)(i => (mix(key + i * C) >>> 13).toInt & (bits - 1))

  def set(words: Array[Long], key: Long): Unit =
    positions(key, words.length * 64).foreach { p =>
      words(p >> 6) |= 1L << (p & 63)
    }

  def toHex(words: Array[Long]): String =
    words.map(w => f"$w%016x").mkString

  def fromHex(s: String): Array[Long] =
    s.grouped(16).map(java.lang.Long.parseUnsignedLong(_, 16)).toArray

  /** Membership against a decoded word array (no false negatives) —
    * batch callers decode the 16 Kchar hex once via [[fromHex]] and
    * probe many keys against the same array. */
  def mightContainWords(words: Array[Long], key: Long): Boolean =
    positions(key, words.length * 64).forall { p =>
      (words(p >> 6) & (1L << (p & 63))) != 0L
    }

  /** Membership against the hex form (no false negatives). */
  def mightContain(hexBloom: String, key: Long): Boolean =
    mightContainWords(fromHex(hexBloom), key)

  /** Distributed construction: per-file bitset built by OR-merge partial
    * aggregation — each file's bloom costs one m-bit buffer per
    * partition and ships 8 KiB to the reduce side, never the keys. */
  class Agg extends Aggregator[Long, Array[Long], String] {
    def zero: Array[Long] = new Array[Long](Words)
    def reduce(b: Array[Long], key: Long): Array[Long] = { set(b, key); b }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): String = toHex(b)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Null-tolerant variant for the MULTI-column stats pass: stats columns
    * are aggregated side by side in one `groupBy(file)`, so a row NULL in
    * one column must still contribute its other columns — a row filter
    * can't express that. NULL keys contribute nothing (they never match a
    * pruning predicate); an all-NULL file yields the all-zero bitset,
    * which prunes every probe — correct for the same reason. */
  class AggOpt extends Aggregator[java.lang.Long, Array[Long], String] {
    def zero: Array[Long] = new Array[Long](Words)
    def reduce(b: Array[Long], key: java.lang.Long): Array[Long] = {
      if (key != null) set(b, key.longValue()); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): String = toHex(b)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** [[AggOpt]] with a caller-chosen filter size (in 64-bit words) —
    * for key populations the fixed 8 KiB filter would saturate, e.g.
    * per-file SHINGLE blooms where a 500-doc file carries ~50 k distinct
    * n-grams. Membership never needs the size: it derives m from the
    * stored hex length, so differently-sized blooms coexist in one log. */
  class AggSized(words: Int)
      extends Aggregator[java.lang.Long, Array[Long], String] {
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], key: java.lang.Long): Array[Long] = {
      if (key != null) set(b, key.longValue()); b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): String = toHex(b)
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
