package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver's test tables (TESTDATA.md).
  *
  * The reference engine's only source is a line-delimited text file
  * (reference StreamingJob.scala:85); this engine generalizes to columnar
  * parquet scans so Catalyst can push filters and prune columns down to
  * the file reader — the scan strategy that survives a 100 TB dataset.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The driver's events.ts is parquet TIMESTAMP(NANOS), which vanilla
    * Spark 4 refuses to read; read it as a nanos BIGINT (legacy conf) and
    * truncate to a proper TimestampType column at microsecond precision —
    * the same truncation DuckDB's epoch_us applies, keeping the oracle
    * aligned. Files that already carry micro-precision timestamps (any
    * non-driver writer) pass through unchanged. */
  def events(s: SparkSession, d: String): DataFrame = {
    // session-conf write guarded so repeated loads don't churn a global
    // (the conf must be set before the scan is PLANNED, which is why it
    // lives here and not in each entrypoint's builder)
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // an events table written back by another engine (DuckDB, plain
      // Spark writes) may carry TIMESTAMP_NTZ; normalize to an instant so
      // downstream unix_micros()/watermarks type-check. Session TZ is
      // pinned to UTC, so the cast is exact, not a guess.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
