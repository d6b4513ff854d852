package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** scratch: time sub-stages of x2_cosine_neardup at an SF dir. */
object TimeStages {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    val emb = ops.Tables.embeddings(spark, dir)
    // warm
    graft.ops.Similarity.cosineNearDupPairs(emb, 20).write.format("noop").mode("overwrite").save()
    t("full query (2nd run)") {
      graft.ops.Similarity.cosineNearDupPairs(emb, 20).count()
    }
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("bucket",
        expr(graft.ops.Similarity.md5BucketExpr(4, 64, "v")).cast("int"))
    t("bucket projection only") { base.select(sum(col("bucket"))).count(); base.count() }
    val a = base.select(col("vec_id").as("v1"), col("v").as("qv"), col("bucket"))
    val b = base.select(col("vec_id").as("v2"), col("v").as("cv"), col("bucket"))
    val joined = a.join(b, Seq("bucket")).filter(col("v1") < col("v2"))
    t("join count only") { joined.count() }
    graft.functions.GraftFunctions.register(spark)
    t("join + dot + topk") {
      joined.withColumn("sim", expr("graft_dot(qv, cv)"))
        .select(col("v1"), col("v2"), col("sim"))
        .orderBy(col("sim").desc).limit(20).count()
    }
    spark.stop()
  }
}
