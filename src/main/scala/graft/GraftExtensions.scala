package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSim, L2Distance, MinHashSig}

/** Library install hook: `spark.sql.extensions=graft.GraftExtensions`
  * registers the engine's native expressions on every session (the
  * idiomatic deployment path for a Spark-native library — no per-session
  * imperative registration required).
  *
  * Usage:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // aggregate pushdown to table metadata: global count/min/max over a
    // clean graft relation folds from the commit log (zero files opened)
    ext.injectOptimizerRule(_ => graft.plans.MetadataAggregateRule)
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, null, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSim(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("l2_distance"),
      new ExpressionInfo(classOf[L2Distance].getName, null, "l2_distance"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        L2Distance(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, null, "minhash_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        def usage(got: String) = throw new IllegalArgumentException(
          "minhash_sig(shingles, k): expects an array column and a literal " +
            s"integer signature size; got $got")
        if (exprs.length != 2) usage(s"${exprs.length} argument(s)")
        val kExpr = exprs(1)
        if (!kExpr.foldable)
          usage(s"non-literal k: ${kExpr.sql}")
        val k = kExpr.eval(null) match {
          case i: Int                     => i
          case l: Long if l.isValidInt    => l.toInt
          case s: Short                   => s.toInt
          case b: Byte                    => b.toInt
          case other                      =>
            usage(s"k of type ${kExpr.dataType.simpleString} ($other)")
        }
        if (k <= 0) usage(s"k = $k (must be positive)")
        MinHashSig(exprs.head, k).toAggregateExpression()
      }))
  }
}
