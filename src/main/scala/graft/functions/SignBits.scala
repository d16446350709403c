package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** ALL hyperplane-LSH bucket ids of a vector in ONE traversal — the fused
  * signature pass for [[graft.operators.LshIndex]] (round-9 verdict #4):
  * the per-plane formulation evaluated nTables × nBits FULL cosine calls
  * per row (and the multi-probe side re-expanded each of them nBits + 1
  * times before subexpression elimination); this expression reads the
  * vector once, accumulates every plane's dot product simultaneously, and
  * emits the nTables bucket ids as one int array.
  *
  * Bit algebra is EXACTLY the old `cosine_sim(vec, plane) >= 0` gate:
  * plane norms are non-zero constants, so sign(cosine) = sign(dot) —
  * accumulated in the same sequential order, hence bit-identical — and a
  * zero-norm vector (cosine NULL, `when` fell through to 0) yields bucket
  * 0 in every table. Q-llm-14's result hash is unchanged.
  *
  * `planes` are baked in as an expression reference (a transposed flat
  * float[] — inner loop walks planes contiguously per vector element).
  */
case class SignBits(child: Expression, planes: Array[Array[Float]],
                    nBits: Int) extends UnaryExpression {

  private val nPlanes = planes.length
  private val nTables = nPlanes / nBits
  private val dim = if (planes.isEmpty) 0 else planes(0).length
  // transposed layout: planesT(j * nPlanes + p) = planes(p)(j)
  private lazy val planesT: Array[Float] = {
    val t = new Array[Float](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var j = 0
      while (j < dim) { t(j * nPlanes + p) = planes(p)(j); j += 1 }
      p += 1
    }
    t
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "sign_bits"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val dots = new Array[Double](nPlanes)
    var na = 0.0
    var j = 0
    while (j < n) {
      val x = arr.getFloat(j).toDouble
      na += x * x
      val off = j * nPlanes
      var p = 0
      while (p < nPlanes) { dots(p) += x * planesT(off + p); p += 1 }
      j += 1
    }
    val buckets = new Array[Int](nTables)
    if (na != 0.0) {
      var t = 0
      while (t < nTables) {
        var b = 0; var i = 0
        while (i < nBits) {
          if (dots(t * nBits + i) >= 0.0) b |= (1 << i); i += 1
        }
        buckets(t) = b; t += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planesT", planesT, "float[]")
      s"""
         |int n = java.lang.Math.min($a.numElements(), $dim);
         |double[] dots = new double[$nPlanes];
         |double na = 0.0;
         |for (int j = 0; j < n; j++) {
         |  double x = (double) $a.getFloat(j);
         |  na += x * x;
         |  int off = j * $nPlanes;
         |  for (int p = 0; p < $nPlanes; p++) dots[p] += x * (double) $pl[off + p];
         |}
         |int[] buckets = new int[$nTables];
         |if (na != 0.0) {
         |  for (int t = 0; t < $nTables; t++) {
         |    int b = 0;
         |    for (int i = 0; i < $nBits; i++)
         |      if (dots[t * $nBits + i] >= 0.0) b |= (1 << i);
         |    buckets[t] = b;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(buckets);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBits {
  /** Register `sign_bits(vec)` bound to these planes on a session. */
  def register(spark: SparkSession, planes: Array[Array[Float]],
               nBits: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sign_bits", exprs => SignBits(exprs.head, planes, nBits), "built-in")
}
