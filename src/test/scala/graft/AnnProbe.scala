package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: standalone walls for the ANN stress stages, isolating the
  * r16 graft_l2sq/graft_dot kernel swap (the interpreted
  * aggregate(zip_with(...)) folds were the per-pair cost of the
  * pqEncode / kmeans-assign fan-outs). Mirrors StressBench's vectors. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val nVec = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def vecSql(idExpr: String, nudge: Boolean): String = {
      val bump = if (nudge) " + if(d = 0, 0.001d, 0.0d)" else ""
      s"transform(sequence(0, 15), d -> cast((pmod(hash($idExpr, d), " +
        s"1000) - 500) / 1000.0$bump as float))"
    }
    val corpusV = spark.range(0, nVec).selectExpr(
      "id AS vec_id", s"${vecSql("id", nudge = false)} AS embedding")
      .localCheckpoint()
    val qStep = nVec / 200
    val queriesV = spark.range(0, 200)
      .selectExpr(s"id * $qStep AS src_id")
      .selectExpr(s"src_id + $nVec AS vec_id",
        s"${vecSql("src_id", nudge = true)} AS embedding")
      .localCheckpoint()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      System.err.println(
        f"[probe] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows")
    }
    val pqK = math.max(20L, nVec / 10000L).toInt
    (1 to 2).foreach { pass =>
      time(s"ivf_hits p$pass")(ops.Similarity.ivfTopK(
        queriesV, corpusV, 1, nCentroids = 64, nProbe = 8)
        .filter(col("vec_id") === col("query_id") - nVec).count())
      time(s"ivfpq_cut p$pass")(ops.Similarity.ivfPqTopK(
        queriesV, corpusV, pqK, dim = 16, m = 8, ks = 16,
        nCentroids = 64, nProbe = 8)
        .filter(col("vec_id") === col("query_id") - nVec).count())
    }
    spark.stop()
  }
}
