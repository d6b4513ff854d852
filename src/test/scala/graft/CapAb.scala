package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness for the capBuckets evaluation strategy (round 14):
  * times the span-pairs candidate generator at a real corpus size under
  * (a) the r12 double-evaluation shape (pre-count + semi-join, key
  * subtree evaluated twice, exchanges deduped by ReuseExchange where
  * Catalyst can) and (b) the r14 localCheckpoint shape (key subtree
  * evaluated once, narrow frame persisted to executor storage). Run:
  * `sbt "Test/runMain graft.CapAb [nDocs]"`. */
object CapAb {
  private def capOld(rows: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val surviving = rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") <= cap)
      .select(keys.map(col): _*)
    rows.join(surviving, keys, "left_semi")
  }
  private def capNew(rows: DataFrame, keys: Seq[String], cap: Int): DataFrame = {
    val keyed = rows.localCheckpoint(eager = false)
    val surviving = keyed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_bsz"))
      .filter(col("_bsz") <= cap)
      .select(keys.map(col): _*)
    keyed.join(surviving, keys, "left_semi")
  }

  private def shingles(docs: DataFrame, n: Int): DataFrame =
    graft.ops.Scale.fanOut(docs)
      .withColumn("_ltoks", split(lower(col("text")), " "))
      .withColumn("_nlt", size(col("_ltoks")))
      .filter(col("_nlt") >= n)
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(1, _nlt - ${n - 1}), " +
          s"i -> md5(array_join(slice(_ltoks, i, $n), ' ')))"))
          .as(Seq("pos0", "sh")))
      .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("sh"))

  private def pairs(capped: DataFrame): DataFrame = {
    val postings = capped.groupBy(col("sh"))
      .agg(collect_list(struct(col("doc_id").as("id"), col("pos").as("p")))
        .as("occs"))
    postings.select(explode(col("occs")).as("a"), col("occs"))
      .select(col("a"), explode(col("occs")).as("b"))
      .filter(col("a.id") < col("b.id"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Files.createTempDirectory("graft_capab").toString
    StressBench.corpus(spark, n).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val c = df.count()
      System.err.println(f"[capab] $name%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$c")
    }
    // interleave two reps each so JIT/host drift does not bias one arm
    for (rep <- 1 to 2) {
      time(s"old#$rep")(pairs(capOld(shingles(docs, 8), Seq("sh"), 64)))
      time(s"new#$rep")(pairs(capNew(shingles(docs, 8), Seq("sh"), 64)))
    }
    spark.stop()
  }
}
