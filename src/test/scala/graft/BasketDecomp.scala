package graft

import org.apache.spark.sql.SparkSession

/** Round 20 (r19 verdict item 1): stage-level decomposition of the
  * x12_basket_rules sf0.1 wall — the lane graded weak two rounds
  * running on a 3.6–4.9 s driver wall vs a 1.8–2.0 s claim. Runs the
  * lane TWICE (cold, then warm — Bench times the warm pass) and prints
  * EVERY stage of the warm pass with wall, task count, cpu, shuffle
  * I/O and the first site line, plus a per-job roll-up. No flags, no
  * thresholds: the full bill, so the floor is attributable.
  *
  * `Test/runMain graft.BasketDecomp [lane] [sfDir]` */
object BasketDecomp {
  def main(args: Array[String]): Unit = {
    val lane = if (args.nonEmpty) args(0) else "x12_basket_rules"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class St(id: Int, name: String, tasks: Int, wallMs: Long,
      cpuMs: Long, shufR: Long, shufW: Long, input: Long, site: String)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        stages.add(St(si.stageId, si.name.takeWhile(_ != '('),
          si.numTasks, wall, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          si.details.linesIterator
            .filter(l => l.contains("graft") && !l.contains("Decomp"))
            .take(2).mkString(" <- ")))
        ()
      }
    }
    def run(): Double = {
      val t0 = System.nanoTime()
      Queries.byName(lane).fn(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = run()
    spark.sparkContext.addSparkListener(listener)
    val warm = run()
    Thread.sleep(800)
    spark.sparkContext.removeSparkListener(listener)
    println(f"[decomp] $lane cold=$cold%.2f s warm=$warm%.2f s")
    val all = stages.toArray(Array.empty[St]).sortBy(_.id)
    val sumWall = all.map(_.wallMs).sum
    println(f"[decomp] warm stages=${all.length} sumStageWall=${sumWall / 1e3}%.2f s " +
      f"(gaps/driver=${warm - sumWall / 1e3}%.2f s)")
    all.foreach { s =>
      println(f"[decomp]  stage=${s.id}%4d ${s.wallMs}%6d ms tasks=${s.tasks}%3d " +
        f"cpu=${s.cpuMs}%6d ms shufR=${s.shufR / 1024}%8d K shufW=${s.shufW / 1024}%8d K " +
        f"in=${s.input / 1024}%8d K  ${s.name}%-18s ${s.site.take(160)}")
    }
    spark.stop()
  }
}
