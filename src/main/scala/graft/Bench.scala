package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. Failures are recorded as an explicit "errors" map
  * (and -1 timings) rather than silently counting overhead as runtime.
  * The JSON is also written to bench_out.json because sbt interleaves
  * [info]/[success] lines into stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fns = SparkEntry.queries
    // noop write (DSv2 "noop" sink) rather than count(): a count aggregate
    // lets EliminateSorts drop each query's final ORDER BY, so it would
    // time everything EXCEPT the declared output sort stage
    def exec(name: String, dir: String): Unit =
      fns(name)(spark, dir).write.format("noop").mode("overwrite").save()
    // untimed warmup, smallest SF first then ONE pass at the target SF:
    // JIT (C2 needs real iteration counts), Janino codegen compile for the
    // target-SF adaptive plan shapes, and parquet footer caches — so
    // measured numbers reflect steady-state execution, not first-run
    // compilation of whatever query happens to come first
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    (Seq(warmDir).filter(new java.io.File(_).isDirectory) :+ sfDir)
      .foreach { dir =>
        SparkEntry.benchQueries.foreach { name =>
          try exec(name, dir)
          catch { case _: Throwable => () }
        }
      }
    // two timed passes, min per query: a single sample conflates operator
    // cost with whatever else the host is doing at that instant (observed
    // 2-4x swings on identical code under external load); the per-query
    // minimum is the standard steady-state estimator
    var errors = List.empty[(String, String)]
    def timedPass(): Seq[(String, Double)] = SparkEntry.benchQueries.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { exec(name, sfDir); true }
        catch { case e: Throwable =>
          errors ::= (name -> e.toString.take(200))
          System.err.println(s"[bench] $name FAILED: $e")
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val (p1, p2) = (timedPass(), timedPass().toMap)
    val results = p1.map { case (name, t) =>
      val t2 = p2.getOrElse(name, -1.0)
      // -1 marks a failure: propagate it rather than min-ing it away
      name -> (if (t < 0 || t2 < 0) -1.0 else math.min(t, t2))
    }
    // full JSON string escape incl. control chars — Spark exception
    // toStrings are multi-line, and a raw \n here would make the driver's
    // json.load fail exactly when errors need reporting
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + esc(k) + "\":\"" + esc(v) + "\""
    }.mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    spark.stop()
    // printed last so the JSON is the final stdout line of the forked JVM
    println(json)
  }
}
