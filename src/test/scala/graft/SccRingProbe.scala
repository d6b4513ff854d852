package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement for the round-17 scc fix: a single directed
  * N-ring has diameter N, so the r16 hook-only color loop needed N inner
  * rounds (it aborted at maxInner=40 for any real N); hook+jump² must
  * close it in ~log4(N)+O(1) rounds. Checks labels exactly (all 0). */
object SccRingProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ring = spark.range(n).selectExpr("id as src", s"(id + 1) % $n as dst")
    val t0 = System.nanoTime()
    val labels = graft.ops.Graph.scc(ring)
    val bad = labels.filter(col("scc_id") =!= 0L).count()
    val cnt = labels.count()
    System.err.println(f"[probe] scc ring n=$n: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"nodes=$cnt, mislabeled=$bad")
    require(bad == 0L && cnt == n, "ring must be ONE component labeled 0")
    spark.stop()
  }
}
