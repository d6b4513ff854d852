package graft

import org.apache.spark.sql.SparkSession

/** Where do x3_rp_recall's ~4 s go? The lane is 10 queries x 2k corpus
  * — execution should be milliseconds — but rpProject expands to
  * 16 x 64 = 1024 codegen'd ±element_at terms, so the suspicion is
  * Janino COMPILE time, not data. Timing the lane at sf0.001 vs sf0.1
  * separates the two: compile cost is SF-independent.
  * `Test/runMain graft.RpRecallProbe`. */
object RpRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (lane <- Seq("x3_rp_recall", "x3_rp_project");
         dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1");
         rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = scala.util.Try(Queries.byName(lane).fn(spark, dir).count())
      println(s"[rp] $lane $dir rep$rep rows=$n " +
        s"wall=${(System.nanoTime() - t0) / 1000000}ms")
    }
    spark.stop()
  }
}
