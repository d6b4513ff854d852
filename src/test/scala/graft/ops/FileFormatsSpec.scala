package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S9 — the engine reads CSV/JSON with explicit schemas, not just parquet. */
class FileFormatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("CSV round-trip with explicit schema preserves rows and types") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    val src = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "event_type", "value").limit(100)
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.count() == 100)
    assert(back.schema == schema)
    assert(back.agg(sum("value")).head().getDouble(0) ==
      src.agg(sum("value")).head().getDouble(0))
  }

  test("hive-partitioned parquet prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.events(spark, sf("sf0.001"))
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("event_type") === "click")
    val plan = planOf(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"))
    // only the click partition's rows are read
    val expected = Tables.events(spark, sf("sf0.001"))
      .filter(col("event_type") === "click").count()
    assert(pruned.count() == expected)
  }

  test("malformed JSON rows land in the corrupt-record column, not a crash") {
    val dir = java.nio.file.Files.createTempDirectory("badjson")
    java.nio.file.Files.writeString(dir.resolve("data.json"),
      """{"event_id": 1, "event_type": "click", "value": 1.5}
        |{"event_id": "NOT A NUMBER", "event_type": 3}
        |{"event_id": 2, "event_type": "view", "value": 2.5}
        |""".stripMargin)
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val df = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir.toString).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("event_id").isNotNull).count() == 2)
    df.unpersist()
  }

  test("JSON round-trip with explicit schema preserves rows") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    val src = Tables.events(spark, sf("sf0.001"))
      .select("event_id", "event_type", "value").limit(100)
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == 100)
    assert(back.filter(col("event_type").isNull).count() == 0)
  }
}
