package graft

/** Dev helper: execute a query and dump its FINAL adaptive plan — the
  * only place runtime exchange/stage reuse is visible (not a test). */
object RuntimePlanDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    args.headOption.toSeq.flatMap(_.split(",")).foreach { n =>
      println(s"==== $n")
      val df = Queries.byName(n).fn(spark, d)
      // collect() drives THIS queryExecution, so the adaptive plan below
      // is the final one (a write would spawn a fresh execution)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      def count(s: String) = s.r.findAllIn(p).size
      println(s"Scans=${count("Scan parquet")} Exchanges=${count("Exchange")} " +
        s"Reused=${count("ReusedExchange")} ShuffleReads=${count("AQEShuffleRead")}")
      if (sys.env.contains("PLAN_FULL")) println(p)
    }
    spark.stop()
  }
}
