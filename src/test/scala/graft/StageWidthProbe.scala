package graft

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Round-19 probe for WidthGateSpec threshold selection: per-stage task
  * width and CPU concentration of the fan-out lanes at sf0.01, in the
  * normal shape and with the numbered repartition stripped
  * (-Dgraft.fanout.disable seam). `Test/runMain graft.StageWidthProbe`. */
object StageWidthProbe {

  final class StageListener extends org.apache.spark.scheduler.SparkListener {
    // stageId -> (tasks, sumCpuNs, maxCpuNs, sumRecordsWritten)
    val stages = TrieMap.empty[Int, (Int, Long, Long, Long)]
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        val cpu = m.executorCpuTime
        val rec = m.shuffleWriteMetrics.recordsWritten
        stages.updateWith(e.stageId) {
          case Some((n, s, mx, r)) =>
            Some((n + 1, s + cpu, math.max(mx, cpu), r + rec))
          case None => Some((1, cpu, cpu, rec))
        }
        ()
      }
    }
    def reset(): Unit = stages.clear()
  }

  def main(args: Array[String]): Unit = {
    val lanes = Seq("x10_linkpred", "x10_betweenness", "x10_lpa",
      "x12_basket_rules", "x2_span_pairs")
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val l = new StageListener
    spark.sparkContext.addSparkListener(l)
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    lanes.foreach { name =>
      run(name) // fixture warm
      Seq(false, true).foreach { dis =>
        if (dis) sys.props.put("graft.fanout.disable", "true")
        else sys.props.remove("graft.fanout.disable")
        l.reset()
        run(name)
        Thread.sleep(500)
        val tot = l.stages.values.map(_._2).sum.toDouble.max(1)
        val top = l.stages.toSeq.sortBy(-_._2._2).take(5)
        println(s"== $name disable=$dis totalCpuMs=${(tot / 1e6).round}")
        top.foreach { case (sid, (n, s, mx, r)) =>
          println(f"  stage $sid%5d tasks=$n%3d cpuMs=${s / 1e6}%8.0f " +
            f"share=${s / tot}%5.2f maxTaskShareOfStage=${mx.toDouble / s.max(1)}%5.2f recW=$r%9d")
        }
      }
    }
    sys.props.remove("graft.fanout.disable")
    spark.stop()
  }
}
