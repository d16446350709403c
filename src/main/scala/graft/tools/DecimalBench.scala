package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{EngineSession, Tables}

/** Dev micro-bench: decimal precision cost in the exact-sum hot path.
  * DECIMAL(<=18) sums can stay in Spark's compact (long-backed) Decimal
  * representation; DECIMAL(30,10) buffers widen to (38,10) where values
  * fall back to BigDecimal. Run on sf0.1 lineitem.
  */
object DecimalBench {
  def main(args: Array[String]): Unit = {
    val s = EngineSession.getOrCreate("decbench")
    val li = Tables.lineitem(s, "/root/testdata/sf0.1").cache()
    li.count() // warm cache

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"DECBENCH $label: ${ts(1)}%.3f s")
    }

    def q(dt: Option[DecimalType]): Unit = {
      val c = (name: String) => dt match {
        case Some(t) => sum(col(name).cast(t)).cast("double")
        case None => sum(col(name))
      }
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(c("l_quantity"), c("l_extendedprice"), c("l_discount"), c("l_tax"))
        .write.format("noop").mode("overwrite").save()
    }

    time("double (baseline, not portable)") { q(None) }
    time("DECIMAL(18,8)") { q(Some(DecimalType(18, 8))) }
    time("DECIMAL(30,10) (current)") { q(Some(DecimalType(30, 10))) }
    s.stop()
  }
}
