package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Euclidean (L2) distance over two `ArrayType(FloatType)` embedding
  * columns — the second native codegen expression of the similarity
  * family (CosineSim's sibling). Cosine ranks by angle; L2 is the metric
  * k-means, IVF cell assignment and most ANN indexes are actually built
  * on, so a similarity engine needs both.
  *
  * Same design as CosineSim: `doGenCode` emits a tight primitive loop
  * into whole-stage codegen (no boxing, no Row conversion); accumulation
  * is in double, sequentially over the array — the exact op order the
  * DuckDB oracle replicates, so results are bit-identical.
  *
  * Returns NULL only when an input is null (distance of equal vectors is
  * 0.0, never null — unlike cosine there is no zero-norm singularity).
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double d = (double) $a.getFloat(i) - (double) $b.getFloat(i);
         |  acc += d * d;
         |}
         |${ev.value} = java.lang.Math.sqrt(acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Distance {
  /** Register `l2_distance(a, b)` for SQL/expr use on a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_distance", exprs => L2Distance(exprs.head, exprs(1)), "built-in")
}
