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
    // Older testdata generations carry events.ts as timestamp[ns], which
    // Spark's parquet reader rejects unless nanos are surfaced as long;
    // newer generations write standard timestamp[us]. Read with the nanos
    // escape hatch on and normalize whatever arrives (see normalizeEvents).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    if (name == "events") normalizeEvents(df) else df
  }

  /** Normalize events.ts to a session-zone TIMESTAMP regardless of the
    * testdata generation: long nanos (timestamp[ns] footer read under
    * nanosAsLong — exact microseconds, so `DIV 1000` is lossless; integer
    * DIV because 1.7e18 ns exceeds double's 2^53 exact-integer range) or a
    * native timestamp/timestamp_ntz column (cast is value-preserving under
    * the UTC-pinned session zone). */
  def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        df.withColumn("ts", expr("cast(ts AS timestamp)"))
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
