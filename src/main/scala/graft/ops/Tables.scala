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
  /** The events table's ts physical type has varied across driver data
    * regenerations: parquet TIMESTAMP(NANOS) (readable only as a long via
    * spark.sql.legacy.parquet.nanosAsLong=true), and naive TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false, which Spark 4 infers as TIMESTAMP_NTZ.
    * Both are normalized here to a µs TimestampType so every downstream
    * query (unix_micros, window(), session_window, stream replays) sees one
    * stable type. The NTZ→LTZ cast under the UTC session timezone is an
    * identity on the stored micros — exactly the naive-epoch reading DuckDB
    * applies — and the ns path truncates ns→µs the same way DuckDB does,
    * so oracle parity holds on either physical encoding. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))

  /** Normalize the `ts` column from any of the observed physical encodings
    * to a µs TimestampType. Shared by the batch loader above and the
    * streaming replay readers (which must apply the same rule to a
    * readStream frame built from the batch-inferred schema). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
