package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the deterministic testdata tables (see /root/repo/TESTDATA.md,
  * schemas in /root/repo/FIXTURES.md). Every query entry receives the
  * scale-factor directory at call time, so nothing here caches paths.
  *
  * Reads go through `spark.read.parquet` so Catalyst's parquet source
  * handles predicate pushdown, column pruning and (on a cluster)
  * partition pruning / file splitting for free.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries timestamp[ns] (see FIXTURES.md), which Spark's
    // parquet reader rejects unless nanos are surfaced as long. The testdata
    // nanos are exact microseconds, so `DIV 1000` is lossless; integer DIV
    // (not `/`) because 1.7e18 ns exceeds double's 2^53 exact-integer range.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** Register all tables as temp views (for spark.sql-expressed queries). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
