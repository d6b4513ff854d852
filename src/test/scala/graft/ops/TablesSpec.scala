package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Tables.normalizeTs]] across every physical ts encoding the
  * driver's data generator has shipped so far. Round 12 silently lost 16
  * judged queries when a regeneration switched events.ts from
  * TIMESTAMP(NANOS) to naive TIMESTAMP(MICROS) (isAdjustedToUTC=false →
  * Spark 4 infers TIMESTAMP_NTZ, and `unix_micros` rejects NTZ). This
  * suite makes the loader's contract executable: whatever the parquet
  * encoding, downstream queries see a µs TimestampType with the SAME
  * epoch micros DuckDB's naive reading produces.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one fixed instant: 2024-01-15T10:30:00.123456Z
  private val us = 1705314600123456L

  test("normalizeTs: ns-as-long, naive-µs (NTZ), and UTC-µs (LTZ) encodings " +
    "all land on the same TimestampType micros") {
    val dir = java.nio.file.Files.createTempDirectory("tsenc")

    // (a) TIMESTAMP(NANOS) read under nanosAsLong → LongType holding ns
    Seq((1L, us * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/ns")

    // (b) naive TIMESTAMP(MICROS): TimestampNTZType round-trips through
    // parquet as isAdjustedToUTC=false, which the default reader infers
    // back as NTZ — the round-12 regeneration's encoding
    Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")

    // (c) instant TIMESTAMP(MICROS), isAdjustedToUTC=true → TimestampType
    Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ltz")

    val read = Map(
      "ns" -> spark.read.parquet(s"$dir/ns"),
      "ntz" -> spark.read.parquet(s"$dir/ntz"),
      "ltz" -> spark.read.parquet(s"$dir/ltz"))

    // the fixture really does exercise three distinct physical readings
    assert(read("ns").schema("ts").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(read("ntz").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampNTZType)
    assert(read("ltz").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)

    for ((name, df) <- read) {
      val norm = Tables.normalizeTs(df)
      assert(norm.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, s"encoding $name")
      val got = norm.select(expr("unix_micros(ts)")).as[Long].head()
      assert(got === us, s"encoding $name")
    }
  }

  test("events loader applies the normalization (current testdata encoding)") {
    val df = Tables.events(spark, sf("sf0.001"))
    assert(df.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // unix_micros must resolve — the exact call that broke in round 12
    assert(df.select(expr("unix_micros(ts)")).limit(1).count() === 1L)
  }
}
