package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Dedup

/** Throwaway measurement: decompose x2_dedup_e2e's wall into candidate
  * generation vs cluster resolution, and time each resolver on the SAME
  * materialized edge set — isolates what the hybrid can actually reclaim. */
object DedupResolverProbe {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // stage 1+2 of dedupPipeline, materialized
    val withRep = docs.select(col("doc_id"), col("text"))
      .withColumn("rep", min(col("doc_id")).over(
        Window.partitionBy(md5(col("text")))))
    val exactEdges = withRep.filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("d1"), col("doc_id").as("d2"))
    val reps = withRep.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("text"))
    (1 to 2).foreach { p =>
      val edges = time(s"candidates pass$p") {
        val e = Dedup.lshCandidates(
            Dedup.minhash(reps, "text", "doc_id", spread = false), "doc_id", 64)
          .select(col("d1"), col("d2")).union(exactEdges).localCheckpoint()
        e.count(); e
      }
      val nodes = docs.select(col("doc_id")).localCheckpoint()
      nodes.count()
      time(s"minlabel pass$p")(
        Dedup.components(nodes, edges, "doc_id").count())
      time(s"star pass$p")(
        Dedup.componentsStar(nodes, edges, "doc_id").count())
      time(s"hybrid pass$p")(
        Dedup.componentsHybrid(nodes, edges, "doc_id").count())
    }
    spark.stop()
  }
}
