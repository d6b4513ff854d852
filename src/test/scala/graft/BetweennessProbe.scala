package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: standalone wall + plan sanity for the r16 stress points
  * whose in-run walls looked too cheap (betweenness_1m, reach_1m) —
  * rules out accidental reuse of blocks materialized by earlier stages. */
object BetweennessProbe {
  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spokes = spark.range(1, m / 2)
      .selectExpr("cast(0 as long) as src", "id as dst")
    val chain = spark.range(1, m / 2 - 1)
      .selectExpr("id as src", "id + 1 as dst")
    val cliques = spark.range(m / 2, m)
      .filter(s"id % 10 <> 9 AND id < ${m - 1}")
      .selectExpr("id as src",
        s"explode(sequence(id + 1, least((id div 10) * 10 + 9, ${m - 1}))) as dst")
    val g = spokes.unionAll(chain).unionAll(cliques)
    val sym = g.unionAll(g.select(col("dst").as("src"), col("src").as("dst")))
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val btwDf = time("betweenness CONSTRUCT")(
      ops.Graph.betweenness(sym,
        spark.range(3).selectExpr(s"id * ${m / 3} AS node"), 3))
    val btw = time("betweenness count")(btwDf.count())
    System.err.println(s"[probe] betweenness rows=$btw")
    val reachDf = time("reach CONSTRUCT")(
      ops.Graph.neighborhoodFunction(sym, 2))
    val reach = time("reach count")(reachDf.count())
    System.err.println(s"[probe] reach rows=$reach")
    spark.stop()
  }
}
