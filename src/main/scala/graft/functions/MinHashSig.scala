package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-band MinHash signature as a native `TypedImperativeAggregate`
  * (SURVEY.md §2B Q-llm-02's "Aggregator minhash", upgraded to the
  * imperative-buffer API).
  *
  * Computes, in ONE aggregation buffer, what K separate
  * `min(md5(concat(seed, ':', shingle)))` aggregates compute — the hash
  * algebra is identical (seeded md5, lexicographic string min), so results
  * are interchangeable with the column-composed version and with the DuckDB
  * oracle. The win at scale: one buffer per group instead of K aggregate
  * states, one pass over the input, no per-band Column plumbing; partial
  * aggregation applies as usual (merge = element-wise min), so shuffle
  * volume is K hashes per group per partition.
  */
case class MinHashSig(
    child: Expression,
    bands: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[String] =
    Array.fill[String](bands)(null)

  @transient private lazy val md = MessageDigest.getInstance("MD5")
  // per-band "b:" prefixes, precomputed once per task
  @transient private lazy val bandPrefix: Array[Array[Byte]] =
    Array.tabulate(bands)(b => s"$b:".getBytes("UTF-8"))

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(digest: Array[Byte]): String = {
    val c = new Array[Char](32)
    var i = 0
    while (i < 16) {
      c(2 * i) = HEX((digest(i) >> 4) & 0xf)
      c(2 * i + 1) = HEX(digest(i) & 0xf)
      i += 1
    }
    new String(c)
  }

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val sb = v.asInstanceOf[UTF8String].getBytes
      var b = 0
      while (b < bands) {
        md.reset()
        md.update(bandPrefix(b))
        md.update(sb)
        val h = hex(md.digest())
        if (buf(b) == null || h < buf(b)) buf(b) = h
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < bands) {
      if (a(i) == null || (b(i) != null && b(i) < a(i))) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(x =>
      if (x == null) null else UTF8String.fromString(x)))

  override def serialize(buf: Array[String]): Array[Byte] = {
    // fixed-width: each md5 hex is 32 ascii bytes; null -> 32 zero bytes
    val out = new Array[Byte](bands * 32)
    var i = 0
    while (i < bands) {
      if (buf(i) != null)
        System.arraycopy(buf(i).getBytes("US-ASCII"), 0, out, i * 32, 32)
      i += 1
    }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val buf = createAggregationBuffer()
    var i = 0
    while (i < bands) {
      if (bytes(i * 32) != 0)
        buf(i) = new String(bytes, i * 32, 32, "US-ASCII")
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Register `minhash_sig(col, bands)` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(
        exprs.head,
        exprs(1).eval(null).asInstanceOf[Int]).toAggregateExpression(),
      "built-in")
}
