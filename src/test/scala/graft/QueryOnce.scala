package graft

import org.apache.spark.sql.SparkSession

/** Debug runner: execute ONE declared query by name against an SF dir
  * (`Test/runMain graft.QueryOnce <name> [sfDir]`) — far faster than a
  * full Verify pass when iterating on a single query. */
object QueryOnce {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Queries.byName(name).fn(spark, dir)
    df.show(10, truncate = false)
    println("ROWS=" + df.count())
    spark.stop()
  }
}
