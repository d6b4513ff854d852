package graft

/** Dev helper: dump formatted plans of selected queries (not a test). */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    args.headOption.toSeq.flatMap(_.split(",")).foreach { n =>
      println(s"==== $n")
      Queries.byName(n).fn(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
