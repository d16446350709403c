package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cosine similarity over two `ArrayType(FloatType)` embedding columns, as a
  * native Catalyst expression (SURVEY.md §2B Q-llm-03).
  *
  * Why an `Expression` and not a UDF: this sits in the hot inner loop of a
  * 100 TB similarity scan — `doGenCode` emits a tight primitive `for` loop
  * directly into whole-stage codegen (no boxing, no Row conversion, no
  * serialization), whereas a Scala UDF would box every float of every
  * vector. Accumulation is in double, sequentially over the array — the
  * exact op order the DuckDB oracle replicates, so results are
  * bit-identical.
  *
  * Returns NULL if either vector has zero norm (or either input is null).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // No ExpectsInputTypes: AbstractDataType is private[sql] in Spark 4.
  // Callers pass ArrayType(FloatType) columns by construction (embeddings).
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double x = (double) $a.getFloat(i);
         |  double y = (double) $b.getFloat(i);
         |  dot += x * y; na += x * x; nb += y * y;
         |}
         |if (na == 0.0 || nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Register `cosine_sim(a, b)` for SQL/expr use on a session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "built-in")
}
