package graft

import org.apache.spark.sql.SparkSession

/** Throwaway measurement main: times the judged x2_dedup_e2e lane under
  * bench-like conditions (local[32], 32 shuffle partitions, sf0.1, three
  * passes) so the r16 hybrid-resolver reclaim is a measurement. */
object DedupE2eProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Queries.byName("x2_dedup_e2e")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      System.err.println(f"[probe] x2_dedup_e2e pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
