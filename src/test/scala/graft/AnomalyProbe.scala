package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway measurement main (not a ScalaTest suite): times the judged
  * median/MAD anomaly kernel against the pre-r16 interpreted
  * array_sort/transform formulation on the StressBench tick corpus, so
  * the VERDICT item-5 "≥ 2× at 1M" claim is a measurement, not a guess.
  * Run: sbt "Test/runMain graft.AnomalyProbe 100000". */
object AnomalyProbe {
  def oldAnomalies(events: DataFrame, n: Int = 15, k: Int = 7): DataFrame = {
    val mid = (n + 1) / 2
    val w = Window.partitionBy(col("k"))
      .orderBy(expr("unix_micros(ts)"), col("tie"))
      .rowsBetween(-(n - 1), Window.currentRow)
    events
      .select(col("k"), col("tie"), col("cents"), col("ts"))
      .withColumn("win", collect_list(col("cents")).over(w))
      .filter(size(col("win")) === n)
      .withColumn("l", array_sort(col("win")))
      .withColumn("med", element_at(col("l"), mid))
      .withColumn("mad", element_at(
        array_sort(transform(col("l"), x => abs(x - col("med")))), mid))
      .select(col("tie"), col("k"), col("cents"), col("med"),
        col("mad"), (abs(col("cents") - col("med")) > col("mad") * k)
          .as("is_anom"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nTicks = 10L * n
    val saw = spark.range(0, nTicks).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 0L ELSE 1L + id % 149 END AS k",
        "id AS tie", "id * 1000000L AS us",
        "1000L + (id % 100) * (CASE WHEN id % 2 = 0 THEN 5L ELSE 1L END) " +
          "+ (CASE WHEN id % 100000 = 50000 THEN 10000L ELSE 0L END) AS cents")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = java.nio.file.Files.createTempDirectory("graft_probe").toString
    saw.write.mode("overwrite").parquet(s"$out/ticks.parquet")
    val ticks = spark.read.parquet(s"$out/ticks.parquet")
    def time(name: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = df.filter(col("is_anom")).count()
        System.err.println(f"[probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    }
    time("old")(oldAnomalies(ticks))
    time("new")(graft.ops.TimeSeries.robustAnomalies(ticks, "k", "ts", "tie", col("cents")))
    spark.stop()
  }
}
