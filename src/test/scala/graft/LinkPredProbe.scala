package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling probe for x10_linkpred's stage costs
  * (`Test/runMain graft.LinkPredProbe [sfDir]`). */
object LinkPredProbe {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val li = graft.ops.Tables.lineitem(spark, dir)
    val edges = t("coSupplyEdges build+count") {
      val e = graft.ops.Graph.coSupplyEdges(li, 41L)
      println("[probe] edges=" + e.count()); e
    }
    val und = t("und distinct") {
      val u = edges.select(col("src").cast("long").as("a"),
          col("dst").cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .unionAll(edges.select(col("dst").cast("long").as("a"),
          col("src").cast("long").as("b")))
        .distinct().localCheckpoint()
      println("[probe] und=" + u.count()); u
    }
    val deg = t("deg") {
      val d = und.groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      println("[probe] nodes=" + d.count()); d
    }
    t("wedge count") {
      val centers = deg.filter(col("deg") <= 1000).select(col("node"))
      val adj = und.select(col("a").as("ctr"), col("b").as("leaf"))
        .join(centers.withColumnRenamed("node", "ctr"), Seq("ctr"), "left_semi")
      val wedges = adj.as("x").join(adj.as("y"),
          col("x.ctr") === col("y.ctr") && col("x.leaf") < col("y.leaf"))
      println("[probe] wedges=" + wedges.count())
    }
    t("cn agg (struct key)") {
      val centers = deg.filter(col("deg") <= 1000).select(col("node"))
      val adj = und.select(col("a").as("ctr"), col("b").as("leaf"))
        .join(centers.withColumnRenamed("node", "ctr"), Seq("ctr"), "left_semi")
      val wedges = adj.as("x").join(adj.as("y"),
          col("x.ctr") === col("y.ctr") && col("x.leaf") < col("y.leaf"))
        .select(col("x.leaf").as("n1"), col("y.leaf").as("n2"))
      val cn = wedges.groupBy(col("n1"), col("n2"))
        .agg(count(lit(1)).as("cn")).filter(col("cn") >= 2)
      println("[probe] cn rows=" + cn.count())
    }
    t("cn agg (packed long key)") {
      val centers = deg.filter(col("deg") <= 1000).select(col("node"))
      val adj = und.select(col("a").as("ctr"), col("b").as("leaf"))
        .join(centers.withColumnRenamed("node", "ctr"), Seq("ctr"), "left_semi")
      val wedges = adj.as("x").join(adj.as("y"),
          col("x.ctr") === col("y.ctr") && col("x.leaf") < col("y.leaf"))
        .select((col("x.leaf") * 4194304L + col("y.leaf")).as("pk"))
      val cn = wedges.groupBy(col("pk"))
        .agg(count(lit(1)).as("cn")).filter(col("cn") >= 2)
      println("[probe] cn rows=" + cn.count())
    }
    t("tail joins from cn") {
      val centers = deg.filter(col("deg") <= 1000).select(col("node"))
      val adj = und.select(col("a").as("ctr"), col("b").as("leaf"))
        .join(centers.withColumnRenamed("node", "ctr"), Seq("ctr"), "left_semi")
      val wedges = adj.as("x").join(adj.as("y"),
          col("x.ctr") === col("y.ctr") && col("x.leaf") < col("y.leaf"))
        .select(col("x.leaf").as("n1"), col("y.leaf").as("n2"))
      val cn = wedges.groupBy(col("n1"), col("n2"))
        .agg(count(lit(1)).as("cn")).filter(col("cn") >= 2)
      val existing = und.filter(col("a") < col("b"))
        .select(col("a").as("n1"), col("b").as("n2"))
      val out = cn.join(existing, Seq("n1", "n2"), "left_anti")
        .join(deg.select(col("node").as("n1"), col("deg").as("d1")), Seq("n1"))
        .join(deg.select(col("node").as("n2"), col("deg").as("d2")), Seq("n2"))
        .select(col("n1"), col("n2"), col("cn"),
          expr("cn * 1000000L div (d1 + d2 - cn)").as("jaccard_ppm"))
      out.write.format("noop").mode("overwrite").save()
    }
    t("full linkPredict noop") {
      graft.ops.Graph.linkPredict(graft.ops.Graph.coSupplyEdges(li, 41L),
          1000, 2L)
        .write.format("noop").mode("overwrite").save()
    }
    t("full linkPredict 2nd run") {
      graft.ops.Graph.linkPredict(graft.ops.Graph.coSupplyEdges(li, 41L),
          1000, 2L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
