package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: dump the executed plan of linkpred's cn agg and per-stage
  * task timings (`Test/runMain graft.LinkPredPlan`). */
object LinkPredPlan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.ops.Tables.lineitem(spark, dir)
    val edges = graft.ops.Graph.coSupplyEdges(li, 41L)
    val und = edges.select(col("src").cast("long").as("a"),
        col("dst").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .unionAll(edges.select(col("dst").cast("long").as("a"),
        col("src").cast("long").as("b")))
      .distinct().localCheckpoint()
    val deg = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val centers = deg.filter(col("deg") <= 1000).select(col("node"))
    val adj = und.select(col("a").as("ctr"), col("b").as("leaf"))
      .join(centers.withColumnRenamed("node", "ctr"), Seq("ctr"), "left_semi")
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.ctr") === col("y.ctr") && col("x.leaf") < col("y.leaf"))
      .select(col("x.leaf").as("n1"), col("y.leaf").as("n2"))
    val cn = wedges.groupBy(col("n1"), col("n2"))
      .agg(count(lit(1)).as("cn")).filter(col("cn") >= 2)
    // stage timing listener
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d " +
          f"runtimeMs=${si.taskMetrics.executorRunTime}%8d " +
          f"cpuMs=${si.taskMetrics.executorCpuTime / 1000000}%8d " +
          f"spillMem=${si.taskMetrics.memoryBytesSpilled}%12d " +
          f"spillDisk=${si.taskMetrics.diskBytesSpilled}%12d  ${si.name}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    println("[probe] cn=" + cn.count())
    println(f"[probe] cn wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val full = graft.ops.Graph.linkPredict(
      graft.ops.Graph.coSupplyEdges(li, 41L), 1000, 2L)
    full.write.format("noop").mode("overwrite").save()
    println(f"[probe] full wall ${(System.nanoTime() - t1) / 1e9}%.2f s")
    Thread.sleep(1000)
    println("=== OPTIMIZED LOGICAL ===")
    println(full.queryExecution.optimizedPlan.toString)
    println("=== ANALYZED ===")
    println(full.queryExecution.analyzed.toString)
    spark.stop()
  }
}
