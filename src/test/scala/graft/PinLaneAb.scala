package graft

import org.apache.spark.sql.SparkSession

/** Lane-level A/B of the Fanout.pinned static-frame discipline vs the
  * prior localCheckpoint (round 18): runs each named lane alternately
  * with the `graft.fanout.pin` toggle on/off, warm, in one JVM —
  * exactly the Bench session shape. `Test/runMain graft.PinLaneAb
  * [lanes...]`. */
object PinLaneAb {
  def main(args: Array[String]): Unit = {
    val lanes = if (args.nonEmpty) args.toSeq
      else Seq("x10_ppr", "x10_pagerank", "x10_lpa", "x10_betweenness",
        "x10_pagerank_weighted", "x10_sssp")
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String, pin: Boolean): Long = {
      if (pin) sys.props.put("graft.fanout.pinMinBytes", "0")
      else sys.props.put("graft.fanout.pinMinBytes", Long.MaxValue.toString)
      val t0 = System.nanoTime()
      val n = Queries.byName(name).fn(spark, dir).count()
      val ms = (System.nanoTime() - t0) / 1000000
      spark.sharedState.cacheManager.clearCache()
      println(s"$name pin=$pin rows=$n wall=${ms}ms")
      ms
    }
    lanes.foreach { l =>
      run(l, pin = true); run(l, pin = false) // warmup both paths
      val on = (1 to 3).map(_ => run(l, pin = true)).min
      val off = (1 to 3).map(_ => run(l, pin = false)).min
      println(f"RESULT $l pin=${on}ms chk=${off}ms ratio=${on.toDouble / off}%.2f")
    }
    spark.stop()
  }
}
