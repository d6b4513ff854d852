package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Targeted 1M-node measurement of the iterative graph ops' static-frame
  * pinning (round 18) — the StressBench skew fixture, just the lanes the
  * pinning touches (`Test/runMain graft.GraphStressProbe [m]`). */
object GraphStressProbe {
  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val tm = e.taskMetrics
          if (tm != null) {
            shuffle.addAndGet(tm.shuffleWriteMetrics.bytesWritten); ()
          }
        }
      })
    def skewGraph(m: Long): DataFrame = {
      val spokes = spark.range(1, m / 2)
        .selectExpr("cast(0 as long) as src", "id as dst")
      val chain = spark.range(1, m / 2 - 1)
        .selectExpr("id as src", "id + 1 as dst")
      val cliques = spark.range(m / 2, m)
        .filter(s"id % 10 <> 9 AND id < ${m - 1}")
        .selectExpr("id as src",
          s"explode(sequence(id + 1, least((id div 10) * 10 + 9, ${m - 1}))) as dst")
      spokes.unionAll(chain).unionAll(cliques)
    }
    def stage(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val s0 = shuffle.get()
      val rows = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val sb = (shuffle.get() - s0) / 1e6
      println(f"[gstress] $name%-16s $wall%7.2f s  shuffle=$sb%9.1f MB  rows=$rows")
      spark.sharedState.cacheManager.clearCache()
    }
    // the pre-round-18 sssp shape (numbered repartition + checkpoint,
    // which loses the partitioning) — the A/B control for the pinning
    def ssspOld(edges: DataFrame, sources: DataFrame,
        rounds: Int): DataFrame = {
      val e = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
        .repartition(32, col("src"))
        .localCheckpoint(eager = false)
      var dist = sources.select(col("node").cast("long").as("node"))
        .distinct().withColumn("dist", lit(0L))
        .localCheckpoint(eager = false)
      var frontier = dist
      (1 to rounds).foreach { _ =>
        val relaxed = frontier.join(e, frontier("node") === e("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
          .groupBy(col("node")).agg(min(col("dist")).as("_cd"))
        val merged = dist.select(col("node"), col("dist").as("_pd"))
          .join(relaxed, Seq("node"), "full_outer")
          .localCheckpoint(eager = false)
        frontier = merged
          .filter(col("_pd").isNull ||
            (col("_cd").isNotNull && col("_cd") < col("_pd")))
          .select(col("node"), col("_cd").as("dist"))
        dist = merged.select(col("node"),
          when(col("_pd").isNull, col("_cd"))
            .when(col("_cd").isNull, col("_pd"))
            .otherwise(least(col("_pd"), col("_cd"))).as("dist"))
      }
      dist
    }
    val srcs = spark.range(0, 3).selectExpr("id * 7 as node")
    stage("sssp_old_10r")(ssspOld(
      skewGraph(m).withColumn("w", lit(1L)), srcs, 10))
    stage("sssp_10r")(graft.ops.Graph.sssp(
      skewGraph(m).withColumn("w", lit(1L)), srcs, 10))
    stage("sssp_10r_again")(graft.ops.Graph.sssp(
      skewGraph(m).withColumn("w", lit(1L)), srcs, 10))
    stage("bfs_10r")(graft.ops.Graph.bfsHops(skewGraph(m), srcs, 10))
    stage("lpa_100k_2r") {
      val cl = spark.range(0, 100000L).filter("id % 10 <> 9")
        .selectExpr("id as src",
          "explode(sequence(id + 1, (id div 10) * 10 + 9)) as dst")
      graft.ops.Graph.labelPropagation(cl, 2)
    }
    stage("pagerank_5i")(graft.ops.Graph.pageRank(skewGraph(m), 5))
    stage("betweenness")(graft.ops.Graph.betweenness(
      skewGraph(m), srcs, 3))
    spark.stop()
  }
}
