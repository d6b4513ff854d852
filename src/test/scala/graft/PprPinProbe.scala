package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the x10_ppr regression (round 18): the Fanout.pinned
  * static-edge discipline vs the prior localCheckpoint, on the exact
  * lane shape (tradeEdges at sf0.1, 3 ppm iterations). Bench r18 showed
  * ppr 4.55 -> 6.08 s after the pin; hypothesis: at 3 iterations the
  * REPARTITION_BY_NUM + cache write of the annotated edge frame costs
  * more than 3 avoided per-round exchanges at this SF.
  * `Test/runMain graft.PprPinProbe [sfDir]`. */
object PprPinProbe {
  private def pprWith(edges: DataFrame, sources: DataFrame, iters: Int,
      pin: Int): DataFrame = {
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("outdeg"))
    val annotated = edges.join(deg, Seq("src"))
    val e = pin match {
      case 0 => annotated.localCheckpoint(eager = false)
      case 1 => annotated.repartition(
        annotated.sparkSession.sessionState.conf.numShufflePartitions,
        col("src")).persist()
      case 2 => annotated.persist()
    }
    val nodes = e.select(col("src"))
      .unionAll(e.select(col("dst").as("src"))).distinct()
    val srcSet = sources.select(col("node").cast("long").as("src"))
      .distinct().withColumn("is_src", lit(1L))
    val base = nodes.join(srcSet, Seq("src"), "left")
      .select(col("src"),
        (coalesce(col("is_src"), lit(0L)) * 150000L).as("base"))
      .localCheckpoint(eager = false)
    var rank = base.select(col("src"),
      expr("CASE WHEN base > 0 THEN 1000000L ELSE 0L END").as("score"))
    (1 to iters).foreach { _ =>
      val contribs = e.join(rank, Seq("src"))
        .select(col("dst"), expr("score div outdeg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("c"))
        .select(col("dst").as("src"), col("c"))
      rank = base.join(contribs, Seq("src"), "left")
        .select(col("src"),
          (col("base") + expr("(850 * coalesce(c, 0L)) div 1000"))
            .as("score"))
    }
    rank.select(col("src").as("node"), col("score"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def lane(pin: Int): Long = {
      val edges = graft.ops.Graph
        .tradeEdges(graft.ops.Tables.lineitem(spark, dir),
          graft.ops.Tables.orders(spark, dir))
        .localCheckpoint(eager = false)
      val sources = edges.select(col("src").as("node")).distinct()
        .filter(col("node") % 100 === 0)
      val t0 = System.nanoTime()
      val n = pprWith(edges, sources, 3, pin).orderBy(col("node")).count()
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"pin=$pin rows=$n wall=${ms}ms")
      spark.sharedState.cacheManager.clearCache()
      ms
    }
    // interleave to cancel JIT/pagecache drift
    Seq(1, 0, 2, 1, 0, 2, 1, 0, 2).foreach(lane)
    spark.stop()
  }
}
