package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: one betweenness forward hop's physical plan — is the
  * checkpointed edge frame's captured HashPartitioning recognized, and
  * which side coalesces? (`Test/runMain graft.BetwHopProbe`) */
object BetwHopProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.ops.Tables.lineitem(spark, dir)
    val or = graft.ops.Tables.orders(spark, dir)
    val edges = graft.ops.Graph.tradeEdgesDirected(li, or)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
      .repartition(32, col("src"))
      .localCheckpoint(eager = false)
    println("e.rdd partitions = " + e.rdd.getNumPartitions)
    println("e logical = " + e.queryExecution.optimizedPlan.getClass)
    println("e outputPartitioning = " +
      e.queryExecution.executedPlan.outputPartitioning)
    val ePersist = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .distinct()
      .repartition(32, col("src"))
      .persist()
    val lbl = ePersist.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint(eager = false)
    val round = ePersist.join(
      lbl.select(col("node").as("src"), col("lab")), Seq("src"))
      .groupBy(col("dst")).agg(min(col("lab")).as("lab"))
    round.collect()
    println("persisted round plan:\n" +
      round.queryExecution.executedPlan.toString.take(2200))
    val lvl0 = e.select(col("src").as("v")).distinct().limit(16)
      .select(col("v").as("s"), col("v"), lit(1L).as("sigma"))
      .localCheckpoint(eager = false)
    val cand = lvl0.join(e, lvl0("v") === e("src"))
      .groupBy(col("s"), col("dst"))
      .agg(sum(col("sigma")).as("sigma"))
    cand.collect()
    println(cand.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
