package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-preserving 64-bit encodings that let STRING columns ride the
  * TxTable stats/bloom machinery unchanged (reference scope: the file
  * skipping a 100 TB text corpus needs; the commit log already prunes
  * numeric/date axes — see `operators/TxTable.scala`).
  *
  * Two encodings, both computable identically on executors (codegen
  * expressions below, used at stage time) and on the driver (plain
  * methods, used at prune time):
  *
  *  - [[prefix64]]: the first 8 UTF-8 bytes, big-endian, zero-padded,
  *    sign-bit-flipped. MONOTONE w.r.t. Spark's string ordering —
  *    UTF8String compares by unsigned UTF-8 bytes, and zero-padding
  *    preserves the shorter-prefix-sorts-first rule — so per-file
  *    min/max of `prefix64(s)` is a correct (8-byte-granular) bounding
  *    range for range/prefix predicate pruning: `a <= s` implies
  *    `prefix64(a) <= prefix64(s)`. Strings equal in their first 8
  *    bytes collapse to one code point, which only ever WIDENS the
  *    kept-file set — never a false prune.
  *  - [[hash64]]: FNV-1a over ALL the bytes, splitmix-finalized — the
  *    bloom key for exact point/IN probes, where the prefix range test
  *    alone would admit every 8-byte-prefix sibling.
  *
  * Why not store string min/max in the log directly: bounds would need
  * truncation anyway (Iceberg truncates at 16 chars for the same
  * reason), JSON-escaping of arbitrary bytes, and a parallel comparison
  * path. Encoding to the long domain reuses the ENTIRE existing
  * pipeline — commit fields, checkpoints, clone/restore carry,
  * z-order interleave — at the cost of 8-byte granularity, which the
  * boundary spec pins as conservative, never lossy.
  */
object StrKey {

  /** First 8 UTF-8 bytes, big-endian, zero-padded, sign-flipped into
    * the signed-long domain. Monotone: byte-lexicographic a <= b (the
    * UTF8String / parquet binary-stats order) implies
    * prefix64(a) <= prefix64(b). */
  def prefix64Bytes(b: Array[Byte]): Long = {
    var raw = 0L
    var i = 0
    while (i < 8) {
      raw = (raw << 8) | (if (i < b.length) b(i) & 0xFFL else 0L)
      i += 1
    }
    raw ^ Long.MinValue
  }

  def prefix64(s: String): Long =
    prefix64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Upper bound of `prefix64` over every string that STARTS WITH `p`:
    * pad the missing tail with 0xFF. For |p| >= 8 bytes all extensions
    * share p's first 8 bytes, so the bound collapses to [[prefix64]]. */
  def upper64(p: String): Long = {
    val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var raw = 0L
    var i = 0
    while (i < 8) {
      raw = (raw << 8) | (if (i < b.length) b(i) & 0xFFL else 0xFFL)
      i += 1
    }
    raw ^ Long.MinValue
  }

  /** FNV-1a 64 over the UTF-8 bytes, splitmix64-finalized — the bloom
    * probe key for string point reads. Same arithmetic on executors
    * (codegen) and driver (here); no library dependency. */
  def hash64Bytes(b: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    // splitmix64 finalizer: FNV's low avalanche alone clusters the
    // bloom's bit positions for similar suffixes
    h += 0x9E3779B97F4A7C15L
    h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
    h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  def hash64(s: String): Long =
    hash64Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Register `str_prefix64(s)` / `str_hash64(s)` on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "str_prefix64", exprs => StrPrefix64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "str_hash64", exprs => StrHash64(exprs.head), "built-in")
  }
}

/** `prefix64` as a native codegen expression: stats staging folds it
  * inside the same whole-stage-codegen pass that computes the numeric
  * columns' min/max — no UDF boundary on the write path. */
case class StrPrefix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"str_prefix64 needs a string argument, got ${child.dataType.simpleString}")
  override def prettyName: String = "str_prefix64"

  override protected def nullSafeEval(s: Any): Any =
    StrKey.prefix64Bytes(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StrKey.prefix64Bytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `hash64` as a native codegen expression (see [[StrKey.hash64Bytes]]). */
case class StrHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"str_hash64 needs a string argument, got ${child.dataType.simpleString}")
  override def prettyName: String = "str_hash64"

  override protected def nullSafeEval(s: Any): Any =
    StrKey.hash64Bytes(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StrKey.hash64Bytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}