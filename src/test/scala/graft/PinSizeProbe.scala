package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the cached byte size the Fanout pin gate sees for the graph
  * lanes' static frames at a given SF — ground truth for the
  * pinMinBytes threshold. `Test/runMain graft.PinSizeProbe [sfDir]`. */
object PinSizeProbe {
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
    def bytesOf(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val cp = df.localCheckpoint()
      val sz = cp.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          spark.sparkContext.getRDDStorageInfo.find(_.id == l.rdd.id)
            .map(i => i.memSize + i.diskSize).getOrElse(-1L)
        case _ => -2L
      }
      // same default as Fanout.pinMinBytes — keep in sync
      val thr = sys.props.get("graft.fanout.pinMinBytes").map(_.toLong)
        .getOrElse(160L << 20)
      println(s"[pinsize] $tag rows=${cp.count()} bytes=$sz " +
        s"pin=${sz >= thr} (threshold $thr)")
    }
    val edges = graft.ops.Graph
      .tradeEdges(graft.ops.Tables.lineitem(spark, dir),
        graft.ops.Tables.orders(spark, dir))
      .localCheckpoint(eager = false)
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("outdeg"))
    bytesOf(edges.join(deg, Seq("src")), "pagerank_annotated")
    bytesOf(edges.select(col("src"), col("dst")), "bfs_select")
    spark.stop()
  }
}
