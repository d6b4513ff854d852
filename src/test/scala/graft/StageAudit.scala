package graft

import org.apache.spark.sql.SparkSession

/** Parallelism auditor: run named lanes at sf0.1 under a stage listener
  * and flag stages whose CPU time is large but task count is small —
  * the AQE coalesce-before-expansion signature found on x10_linkpred
  * (`Test/runMain graft.StageAudit lane1,lane2 [sfDir]`). */
object StageAudit {
  def main(args: Array[String]): Unit = {
    val lanes = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flagged =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val cpuMs = si.taskMetrics.executorCpuTime / 1000000
        if (si.numTasks <= 8 && cpuMs >= 1500) {
          val m = si.taskMetrics
          val rdds = si.rddInfos.map(r => r.name + ":" + r.scope
              .map(_.name).getOrElse("?"))
            .distinct.mkString(" | ") + "\n[audit]      site: " +
            si.details.linesIterator.take(6).mkString(" <- ")
          val io = s"shufRead=${m.shuffleReadMetrics.totalBytesRead} " +
            s"shufWrite=${m.shuffleWriteMetrics.bytesWritten} " +
            s"input=${m.inputMetrics.bytesRead}"
          flagged.add((si.stageId, si.numTasks, cpuMs,
            io + "\n[audit]      rdds: " + rdds.take(700))); ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    lanes.foreach { name =>
      flagged.clear()
      val t0 = System.nanoTime()
      try {
        Queries.byName(name).fn(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drain
        val flags = flagged.toArray(Array.empty[(Int, Int, Long, String)])
        println(f"[audit] $name%-24s wall=$wall%6.2f s flags=${flags.size}")
        flags.foreach { case (id, tasks, cpu, detail) =>
          println(f"[audit]   stage=$id%4d tasks=$tasks%2d cpuMs=$cpu%8d  <-- narrow+hot $detail")
        }
      } catch {
        case e: Exception =>
          println(s"[audit] $name FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
