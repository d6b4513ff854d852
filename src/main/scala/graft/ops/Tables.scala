package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S9 — file scans over the driver's parquet tables (TESTDATA.md).
  *
  * One function per table so queries never hard-code paths. Plain
  * `spark.read.parquet` keeps Catalyst free to push filters/pruning into
  * the scan (verify via `.explain`: PushedFilters / ReadSchema). At 100 TB
  * these become partitioned/bucketed reads; the call sites don't change.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events table stores ts as parquet TIMESTAMP(NANOS), which Spark 4
    * only reads with spark.sql.legacy.parquet.nanosAsLong=true (as a long).
    * Converted here to a µs TimestampType via exact integer division —
    * the same ns->µs truncation DuckDB applies, so oracle parity holds. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
