package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B for the round-17 HyperANF systolic-delta change:
  * replicates StressBench's reach_1m lane (symmetrized skew graph,
  * 2 hops) and reports wall + shuffle bytes. r16 (full re-fan every
  * hop): 1.22 GB shuffle, 34.5–127.5 s band; the delta version ships
  * only changed register rows, so saturated sketches stop costing. */
object ReachProbe {
  def main(args: Array[String]): Unit = {
    val m = if (args.length > 0) args(0).toLong else 1000000L
    val hops = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "32g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val mm = e.taskMetrics
          if (mm != null) {
            shuffleBytes.addAndGet(mm.shuffleWriteMetrics.bytesWritten); ()
          }
        }
      })
    def skewGraph(n: Long): DataFrame = {
      val spokes = spark.range(1, n / 2)
        .selectExpr("cast(0 as long) as src", "id as dst")
      val chain = spark.range(1, n / 2 - 1)
        .selectExpr("id as src", "id + 1 as dst")
      val cliques = spark.range(n / 2, n)
        .filter(s"id % 10 <> 9 AND id < ${n - 1}")
        .selectExpr("id as src",
          s"explode(sequence(id + 1, least((id div 10) * 10 + 9, ${n - 1}))) as dst")
      spokes.unionAll(chain).unionAll(cliques)
    }
    val g = skewGraph(m)
    val sym = g.unionAll(g.select(col("dst").as("src"), col("src").as("dst")))
    val t0 = System.nanoTime()
    val reach = ops.Graph.neighborhoodFunction(sym, hops)
    val rows = reach.count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    System.err.println(f"[probe] reach m=$m hops=$hops: $dt%.1f s, rows=$rows, " +
      f"shuffle=${shuffleBytes.get() / 1e6}%.1f MB")
    val curve = reach.orderBy(col("h")).select(col("sum_est_fp"))
      .collect().map(_.getLong(0)).toSeq
    require(curve.zip(curve.tail).forall { case (a, b) => a <= b } &&
      curve.last > curve.head, s"curve must grow: $curve")
    spark.stop()
  }
}
