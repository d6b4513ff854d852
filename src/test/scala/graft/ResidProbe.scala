package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: raw vs residual IVF-PQ, sampled vs Lloyd-trained
  * codebooks, on real + clustered corpora. */
object ResidProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    def corpusOf(name: String) = name match {
      case "real" => ops.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      case "clustered" => (0 until 120).map { i =>
        val c = i / 15
        val v = Array.tabulate(64) { d =>
          (((c * 31 + d * 17) % 13) - 6).toFloat +
            (((i * 7 + d * 3) % 5) - 2) * 0.05f
        }
        (i.toLong, v)
      }.toDF("vec_id", "embedding")
    }
    for (cname <- Seq("real", "clustered")) {
      val emb = corpusOf(cname)
      val queries = emb.filter(col("vec_id") < 20)
      val byId = emb.select("vec_id", "embedding")
        .as[(Long, Seq[Float])].collect().toMap
        .map { case (k, v) => k -> v.map(_.toDouble).toArray }
      def dot(q: Long, v: Long): Double =
        byId(q).zip(byId(v)).map { case (a, b) => a * b }.sum
      val exact = (0L until 20L).map { q =>
        q -> byId.keys.filter(_ != q).toSeq
          .sortBy(v => (-dot(q, v), v)).take(10).toSet
      }.toMap
      def stats(name: String, rows: Seq[(Long, Long, Double)]): Unit = {
        val mae = rows.map { case (q, v, a) => math.abs(a - dot(q, v)) }.sum / rows.size
        val rec = rows.count { case (q, v, _) => exact(q).contains(v) } / 200.0
        println(f"[$cname%9s] $name%14s mae=$mae%.6f recall@10=$rec%.3f")
      }
      def collectRows(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "vec_id", "adc").as[(Long, Long, Double)].collect().toSeq
      val rawTrained = ops.Similarity.pqCodebookTrained(emb, 64, 4, 16, 5)
      val residSeeds = ops.Similarity.residualCodebookSampled(emb, 64, 4, 16, 16)
      val residTrained = ops.Similarity.pqCodebookTrainedWith(
        ops.Similarity.residuals(emb, 16), 64, 4, residSeeds, 5)
      stats("raw-sampled", collectRows(ops.Similarity.ivfPqTopK(queries, emb, 10, dim = 64)))
      stats("raw-trained", collectRows(ops.Similarity.ivfPqTopK(queries, emb, 10, dim = 64,
        codebook = Some(rawTrained))))
      stats("resid-sampled", collectRows(ops.Similarity.ivfPqResidualTopK(queries, emb, 10, dim = 64)))
      stats("resid-trained", collectRows(ops.Similarity.ivfPqResidualTopK(queries, emb, 10, dim = 64,
        residualCodebook = Some(residTrained))))
    }
    spark.stop()
  }
}
