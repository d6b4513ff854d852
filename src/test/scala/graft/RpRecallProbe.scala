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
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"[rp] $tag rows=$n wall=${(System.nanoTime() - t0) / 1000000}ms")
    }
    val emb = graft.ops.Tables.table(spark, dir, "embeddings")
    t("warm_scan")(emb.count())
    t("project_only")(
      graft.ops.Similarity.rpProject(emb, "embedding", 16, 64).count())
    val proj = graft.ops.Similarity.rpProject(emb, "embedding", 16, 64)
    t("bf_raw")(graft.ops.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 10), emb, 5).count())
    t("bf_proj")(graft.ops.Similarity.bruteForceTopK(
      proj.filter(col("vec_id") < 10), proj, 5).count())
    for (rep <- 1 to 2)
      t(s"full_lane_rep$rep")(
        Queries.byName("x3_rp_recall").fn(spark, dir).count())
    spark.stop()
  }
}
