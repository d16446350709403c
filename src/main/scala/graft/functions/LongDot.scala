package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot product over two `ArrayType(LongType)` columns — the
  * exact-arithmetic member of the native similarity family (CosineSim,
  * L2Distance). Quantized pipelines (KMeans fixed-point vectors,
  * SemDeDup's rational-threshold cosine test) decide everything in
  * int64; this expression keeps that decision inside whole-stage
  * codegen: a tight primitive loop, no per-row array materialization —
  * the `zip_with`+`aggregate` composition it replaces allocates an
  * intermediate array per pair, which is the hot-loop cost when the
  * pair space is Σ cell².
  *
  * Overflow discipline is the CALLER's contract (documented where the
  * quantization scale is chosen): |v_i| ≤ m requires dim·m² < 2^63.
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long acc = 0L;
         |for (int i = 0; i < n; i++) {
         |  acc += $a.getLong(i) * $b.getLong(i);
         |}
         |${ev.value} = acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  /** Register `long_dot(a, b)` for SQL/expr use on a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "long_dot", exprs => LongDot(exprs.head, exprs(1)), "built-in")
}
