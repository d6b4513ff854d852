package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // ticks: key 1 has a 3-bucket gap between its two ticks (step 10);
  // key 2 has a single tick (spine of exactly one bucket)
  private def ticks = Seq(
    (1L, 5L, 100.0), (1L, 7L, 101.0),  // bucket 0, close = 101.0 (latest ts)
    (1L, 41L, 99.0),                   // bucket 40
    (2L, 23L, 55.0)                    // bucket 20
  ).toDF("k", "us", "v")

  test("resampleFfill fills gap buckets with the prior close, n_ticks=0") {
    val out = TimeSeries.resampleFfill(ticks, "k", "us", "v", 10L)
      .orderBy($"k", $"bucket_us").as[(Long, Long, Double, Long)].collect()
    assert(out.toSeq === Seq(
      (1L, 0L, 101.0, 2L),   // bucket close is the LAST tick, not the first
      (1L, 10L, 101.0, 0L),  // gap rows carry the close forward
      (1L, 20L, 101.0, 0L),
      (1L, 30L, 101.0, 0L),
      (1L, 40L, 99.0, 1L),
      (2L, 20L, 55.0, 1L)))  // single-tick key: spine is its one bucket
  }

  test("resampleFfill emits no nulls: every key's spine starts at data") {
    val out = TimeSeries.resampleFfill(ticks, "k", "us", "v", 10L)
    assert(out.filter($"px".isNull).isEmpty)
  }

  test("resampleFfill close tie-break inside a bucket is (ts, v) descending") {
    val t = Seq((1L, 5L, 3.0), (1L, 5L, 9.0)).toDF("k", "us", "v")
    val out = TimeSeries.resampleFfill(t, "k", "us", "v", 10L)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.toSeq === Seq((1L, 0L, 9.0, 2L)))
  }

  test("resampleFfill: a key whose spine exceeds maxBucketsPerKey fails loudly") {
    // key 7 idle for 1000 steps; cap at 100 — must raise naming the key,
    // not materialize the spine
    val idle = Seq((7L, 0L, 1.0), (7L, 10000L, 2.0)).toDF("k", "us", "v")
    val e = intercept[Exception] {
      TimeSeries.resampleFfill(idle, "k", "us", "v", 10L,
        maxBucketsPerKey = 100L).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("resampleFfill") && msg.contains("7"),
      s"expected a loud per-key guard failure, got: $msg")
    // well-behaved keys under the same cap still resample fine
    val ok = TimeSeries.resampleFfill(ticks, "k", "us", "v", 10L,
      maxBucketsPerKey = 100L)
    assert(ok.count() == 6)
  }

  test("X8b sessionize: sessions partition the events, intra-session " +
      "gaps stay within the rule, inter-session gaps exceed it") {
    def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    // user 1: two sessions (gap 45 > 30); user 2: one session incl. an
    // exactly-30-min gap (NOT a boundary: rule is strictly greater)
    val ev = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(29)), (1L, 12L, ts(74)),
      (2L, 20L, ts(0)), (2L, 21L, ts(30)), (2L, 22L, ts(59))
    ).toDF("user_id", "event_id", "ts")
    val out = TimeSeries.sessionize(ev, "user_id", "ts", "event_id",
        1800000000L)
      .select($"user_id", $"session_id", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(_._3).sum == 6, "sessions must partition the events")
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 3L)))
    // inter-session gap for user 1 exceeds the rule
    val u1 = out.filter(_._1 == 1L)
    assert(u1(1)._4 - u1(0)._5 > 1800000000L)
    // user 2's exactly-30-min gap stayed inside one session
    assert(out.filter(_._1 == 2L).head._5 - out.filter(_._1 == 2L).head._4
      == 59L * 60000000L)
  }

  test("X8c funnel: order and horizon both gate; greedy earliest transition") {
    def t(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      // user 1: clean conversion inside horizons
      (1L, "view", t(0)), (1L, "click", t(10)), (1L, "purchase", t(20)),
      // user 2: click BEFORE the first view — order gate fails at step 2
      (2L, "click", t(0)), (2L, "view", t(10)),
      // user 3: click past the horizon — time gate fails at step 2
      (3L, "view", t(0)), (3L, "click", t(200)),
      // user 4: purchase BETWEEN view and click (before the click) must
      // not count; the later purchase does — greedy earliest semantics
      (4L, "view", t(0)), (4L, "purchase", t(5)), (4L, "click", t(10)),
      (4L, "purchase", t(30)))
      .toDF("user_id", "event_type", "ts")
    val out = TimeSeries.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), horizonUs = 100L * 1000000)
      .orderBy($"step_idx")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 2L)))
    assert(out.head._4 == 1000000L)            // first step: 10^6 by definition
    assert(out(1)._4 == 500000L)               // 2/4
    assert(out(2)._4 == 1000000L)              // 2/2
  }

  test("X8d retention: cohort from ANY first event, activity from the " +
      "qualifying type only; absent cells are absent, ppm floors") {
    def t(day: Int, h: Int) = new java.sql.Timestamp(
      1704067200000L + (day * 24L + h) * 3600L * 1000L)  // 2024-01-01 + d
    val ev = Seq(
      // cohort day 0: users 1, 2, 3 (user 3's first event is a view —
      // still cohorted day 0, but contributes no day-0 purchase)
      (1L, "purchase", t(0, 1)), (1L, "purchase", t(1, 2)),
      (1L, "purchase", t(1, 5)),              // same day twice = one active day
      (2L, "purchase", t(0, 3)), (2L, "purchase", t(2, 1)),
      (3L, "view", t(0, 2)), (3L, "purchase", t(2, 9)),
      // cohort day 1: user 4, never purchases — cohort size counts them,
      // no active cell ever
      (4L, "view", t(1, 1)))
      .toDF("user_id", "event_type", "ts")
    val out = TimeSeries.retention(ev, "user_id", "ts", "event_type",
        Seq("purchase"))
      .orderBy($"cohort", $"age_days")
      .select($"cohort".cast("string"), $"age_days", $"n_active",
        $"n_cohort", $"ret_ppm")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("2024-01-01", 0, 2L, 3L, 666666L),  // users 1,2; floor(2e6/3)
      ("2024-01-01", 1, 1L, 3L, 333333L),  // user 1 (two same-day purchases)
      ("2024-01-01", 2, 2L, 3L, 666666L))) // users 2,3; day-1 cohort absent
  }

  test("X8e transitions: pairs are per-key consecutive, ties break on the " +
      "tie column, conditional ppm is per PREV row") {
    def t(s: Long) = new java.sql.Timestamp(1704067200000L + s * 1000L)
    val ev = Seq(
      // user 1: v -> c -> v  (pairs: v->c, c->v)
      (1L, 10L, "v", t(0)), (1L, 11L, "c", t(1)), (1L, 12L, "v", t(2)),
      // user 2: v -> v      (pair: v->v); no cross-user pair with user 1
      (2L, 20L, "v", t(5)), (2L, 21L, "v", t(6)),
      // user 3: same-ts tie — event_id orders c(30) before v(31): c->v
      (3L, 30L, "c", t(9)), (3L, 31L, "v", t(9)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = TimeSeries.transitions(ev, "user_id", "ts", "event_id",
        "event_type")
      .orderBy($"prev_t", $"next_t")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("c", "v", 2L, 1000000L),   // both c-rows lead to v
      ("v", "c", 1L, 500000L),    // of 2 v-departures: 1 to c, 1 to v
      ("v", "v", 1L, 500000L)))
  }

  test("X8f robustAnomalies: median/MAD match brute force, warm-up rows " +
      "excluded, the spike flags and the level does not") {
    // key 1: 15 quiet values (100/101/102 cycling), then one 10x spike.
    // Only ids 15 and 16 have a full 15-row trailing window.
    val rows = (1 to 15).map(i => (1L, i.toLong, 100L + (i % 3))) :+
      ((1L, 16L, 1000L))
    val df = rows.toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.robustAnomalies(df, "k", "ts", "id", col("cents"),
        n = 15, k = 7)
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().toSeq

    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    def brute(window: Seq[Long], x: Long): (Long, Long, Boolean) = {
      val med = lowerMedian(window)
      val mad = lowerMedian(window.map(v => math.abs(v - med)))
      (med, mad, math.abs(x - med) > 7 * mad)
    }
    val vals = rows.map(_._3)
    val (m15, d15, f15) = brute(vals.slice(0, 15), vals(14))
    val (m16, d16, f16) = brute(vals.slice(1, 16), vals(15))
    assert(out == Seq(
      (15L, 1L, vals(14), m15, d15, f15),
      (16L, 1L, vals(15), m16, d16, f16)))
    assert(!f15 && f16, "the quiet row must not flag; the spike must")
  }

  test("X8f robustAnomalies: a constant window has MAD 0 and any " +
      "deviation flags; keys never mix windows") {
    val rows = (1 to 15).map(i => (1L, i.toLong, 500L)) ++
      Seq((1L, 16L, 501L)) ++                 // +1 off a constant window
      (1 to 20).map(i => (2L, 100L + i, 9999L)) // other key, other level
    val df = rows.toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.robustAnomalies(df, "k", "ts", "id", col("cents"),
        n = 15, k = 7)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    val k1 = out.filter(_._2 == 1L).sortBy(_._1)
    assert(k1.map(r => (r._1, r._6)).toSeq == Seq((15L, false), (16L, true)),
      "MAD 0 + nonzero deviation must flag")
    // key 2 is constant at its own level: full windows, no flags, and
    // key 1's values never bleed into its medians
    val k2 = out.filter(_._2 == 2L)
    assert(k2.length == 6 && k2.forall(r => r._4 == 9999L && !r._6))
  }

  test("X8g maxDrawdown: deepest drop measured from the running peak, " +
      "ppm from the peak it fell from, monotone series draw down zero") {
    // key 1: 100 -> 120 -> 90 (dd 30 from 120) -> 130 -> 65 (dd 65
    // from 130 = 500000 ppm, the max in both units)
    // key 2: monotone rise, dd == 0
    val rows = Seq((1L, 1L, 100L), (1L, 2L, 120L), (1L, 3L, 90L),
      (1L, 4L, 130L), (1L, 5L, 65L),
      (2L, 1L, 50L), (2L, 2L, 60L), (2L, 3L, 70L))
    val df = rows.toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.maxDrawdown(df, "k", "ts", "id", col("cents"))
      .orderBy($"k")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 5L, 130L, 65L, 500000L),
      (2L, 3L, 70L, 0L, 0L)))
  }

  test("X8g maxDrawdown: the max ppm drop can come from a DIFFERENT " +
      "peak than the max absolute drop (true max of ratios)") {
    // peak 1000 -> drop to 900: dd 100, 100000 ppm
    // later peak 1100 -> drop to 1001: dd 99, 90000 ppm
    // abs max = 100 (from peak 1000); ppm max = 100000 — same event
    // here, but flip magnitudes so they separate:
    // peak 200 -> 100: dd 100 = 500000 ppm; peak 2000 -> 1850: dd 150
    // = 75000 ppm. abs max 150, ppm max 500000 — different peaks.
    val rows = Seq((1L, 1L, 200L), (1L, 2L, 100L), (1L, 3L, 2000L),
      (1L, 4L, 1850L))
    val df = rows.toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.maxDrawdown(df, "k", "ts", "id", col("cents"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(out == ((1L, 4L, 2000L, 150L, 500000L)))
  }

  test("X8h corrVsIndex: exact moment numerators vs brute force; a " +
      "perfectly index-tracking key has corr 1; closes pick the last " +
      "tick per bucket") {
    // 3 keys over 4 hourly buckets; key 3 mirrors the index shape by
    // construction only if its own series is affine in the index — use
    // key1 = key2 so idx = 2*key1 + key3; make key3 constant so every
    // key's corr vs idx is corr(x, 2x + c) = 1 for keys 1/2 and null
    // (zero variance) for key 3.
    val hour = 3600000000L
    def tick(k: Long, b: Long, off: Long, c: Long) = (k, b * 10 + off, c,
      b * hour + off * 1000000L)
    val rows = Seq(
      // key 1 / key 2: closes 10, 30, 20, 40 (plus an earlier tick in
      // bucket 0 that must NOT be the close)
      tick(1L, 0L, 1L, 999L), tick(1L, 0L, 2L, 10L), tick(1L, 1L, 0L, 30L),
      tick(1L, 2L, 0L, 20L), tick(1L, 3L, 0L, 40L),
      tick(2L, 0L, 0L, 10L), tick(2L, 1L, 0L, 30L), tick(2L, 2L, 0L, 20L),
      tick(2L, 3L, 0L, 40L),
      tick(3L, 0L, 0L, 7L), tick(3L, 1L, 0L, 7L), tick(3L, 2L, 0L, 7L),
      tick(3L, 3L, 0L, 7L))
    val df = rows.toDF("k", "id", "cents", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val out = TimeSeries.corrVsIndex(df, "k", "ts", "id", col("cents"), hour)
      .orderBy($"k").collect()
    // idx per bucket = 10+10+7, 30+30+7, 20+20+7, 40+40+7
    val xs = Seq(10L, 30L, 20L, 40L)
    val ys = xs.map(x => 2 * x + 7)
    val n = 4L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val syy = ys.map(a => a * a).sum
    val k1 = out(0)
    assert(k1.getAs[Long]("cov_num") == n * sxy - sx * sy)
    assert(k1.getAs[Long]("varx_num") == n * sxx - sx * sx)
    assert(k1.getAs[Long]("vary_num") == n * syy - sy * sy)
    assert(math.abs(k1.getAs[Double]("corr") - 1.0) < 1e-12)
    assert(math.abs(out(1).getAs[Double]("corr") - 1.0) < 1e-12)
    // beta of x on the index y = 2x + 7 is cov/var_y = 1/2 exactly
    assert(k1.getAs[Double]("beta") == 0.5)
    // key 3: zero own-variance -> null corr but a DEFINED beta of 0
    // (its cov with the index is 0; var_y > 0)
    assert(out(2).getAs[Long]("varx_num") == 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("corr")))
    assert(out(2).getAs[Double]("beta") == 0.0)
  }

  test("X8j emaTrunc: Horner fold matches the explicit weighted sum, " +
      "warm-up excluded, a constant series smooths to itself") {
    // key 1: 20 ticks of known cents; windows are the trailing 16
    val vals = (1 to 20).map(i => 100L + 7L * i)
    val rows = vals.zipWithIndex.map { case (c, i) => (1L, (i + 1).toLong, c) }
    val df = rows.toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.emaTrunc(df, "k", "ts", "id", col("cents"))
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // rows 16..20 have full windows
    assert(out.map(_._1) == (16L to 20L))
    def brute(win: Seq[Long]): Long = win.foldLeft(0L)((a, x) => a * 2 + x)
    out.foreach { case (id, _, cents, num, milli) =>
      val win = vals.slice(id.toInt - 16, id.toInt)
      assert(cents == vals(id.toInt - 1))
      assert(num == brute(win), s"row $id")
      assert(milli == num * 1000L / 65535L)
    }
    // constant series: ema == the constant exactly (num = c * (2^16-1))
    val const = (1 to 16).map(i => (2L, i.toLong, 500L))
      .toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val c = TimeSeries.emaTrunc(const, "k", "ts", "id", col("cents"))
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(c._4 == 500L * 65535L && c._5 == 500000L)
  }

  test("X8i realizedVolatility: deltas are per-key consecutive, the " +
      "overnight gap lands on the LATER day, first tick excluded") {
    val day = 86400000000L
    // key 1, day 0: 100 -> 110 (+10) -> 95 (-15); overnight to day 1:
    // 95 -> 105 (+10, attributed to day 1), then 105 -> 105 (0)
    // key 2: single tick -> no deltas at all
    val rows = Seq((1L, 1L, 100L, 1000000L), (1L, 2L, 110L, 2000000L),
      (1L, 3L, 95L, 3000000L), (1L, 4L, 105L, day + 1000000L),
      (1L, 5L, 105L, day + 2000000L), (2L, 9L, 777L, 1000000L))
    val df = rows.toDF("k", "id", "cents", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val out = TimeSeries.realizedVolatility(df, "k", "ts", "id",
        col("cents"))
      .orderBy($"k", $"day")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      // day 0: deltas +10, -15 -> n 2, net -5, rv 100+225, max 15
      (1L, 0L, 2L, -5L, 325L, 15L),
      // day 1: deltas +10, 0 -> n 2, net 10, rv 100, max 10
      (1L, 1L, 2L, 10L, 100L, 10L)))
    // key 2 emitted nothing (no second tick)
    assert(!out.exists(_._1 == 2L))
  }

  test("X8k cusum: recursion matches hand-rolled values, clamps at zero, " +
      "alarms past the threshold, and resets per key") {
    // key 1 cents: 100, 110, 105, 130, 160 -> deltas 0, +10, -5, +25, +30
    // slack 4, threshold 30:
    //   up: 0, 6, 0, 21, 47     dn: 0, 0, 1, 0, 0
    // alarm fires only on the last row (47 > 30)
    // key 2 starts fresh: single tick -> d = 0, up = dn = 0
    val rows = Seq((1L, 1L, 100L), (1L, 2L, 110L), (1L, 3L, 105L),
      (1L, 4L, 130L), (1L, 5L, 160L), (2L, 9L, 999L))
    val df = rows.toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.cusum(df, "k", "ts", "id",
        col("cents"), 4L, 30L)
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 100L, 0L, 0L, 0L, 0L),
      (2L, 1L, 110L, 10L, 6L, 0L, 0L),
      (3L, 1L, 105L, -5L, 0L, 1L, 0L),
      (4L, 1L, 130L, 25L, 21L, 0L, 0L),
      (5L, 1L, 160L, 30L, 47L, 0L, 1L),
      (9L, 2L, 999L, 0L, 0L, 0L, 0L)))
    // determinism across the repartition+sort: a second run is identical
    val out2 = TimeSeries.cusum(df, "k", "ts", "id",
        col("cents"), 4L, 30L)
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out2 == out)
  }

  test("X8l seasonalProfile: slot assignment wraps the modulo, means and " +
      "deviations are exact integer quotients") {
    val hour = 3600000000L
    // key 1: hour-0 ticks 100, 200 (mean 150000 milli); hour-1 tick 600;
    //        25h tick 300 lands back in slot 1
    // key mean = 1200/4 = 300000 milli
    val rows = Seq((1L, 0L, 100L), (1L, 1800000000L, 200L),
      (1L, hour, 600L), (1L, 25L * hour, 300L))
    val df = rows.toDF("k", "us", "cents")
      .withColumn("ts", timestamp_micros($"us"))
    val out = TimeSeries.seasonalProfile(df, "k", "ts", col("cents"))
      .orderBy($"slot")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 2L, 300L, 150000L, -150000L),
      (1L, 1L, 2L, 900L, 450000L, 150000L)))
  }

  test("X8n closesSummary: close-picking honors (us, tie) order, deltas " +
      "are bucket-to-bucket, drawdown from the running peak") {
    val hour = 3600000000L
    // key 1: bucket 0 ticks 100 then 120 (close 120); bucket 1 close 90;
    //   bucket 2 close 105 -> deltas -30, +15; peak path 120,120,120 ->
    //   max dd = 120-90 = 30; net -15; rv 900+225
    // tie-break: bucket 3 has two ticks at the SAME us — higher
    //   event_id wins the close
    val rows = Seq(
      (1L, 1L, 100L, 1000L), (1L, 2L, 120L, 2000L),
      (1L, 3L, 90L, hour + 5L), (1L, 4L, 105L, 2 * hour + 5L))
    val df = rows.toDF("k", "id", "cents", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val out = TimeSeries.closesSummary(df, "k", "ts", "id", col("cents"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, -15L, 1125L, 30L, 30L)))
    val tied = Seq((2L, 1L, 50L, 7L), (2L, 9L, 80L, 7L))
      .toDF("k", "id", "cents", "us")
      .withColumn("ts", timestamp_micros($"us"))
    val t = TimeSeries.closesSummary(tied, "k", "ts", "id", col("cents"))
      .collect().head
    // event 9 closes the bucket; single close -> no deltas (nulls), but
    // the drawdown off its own peak is well-defined 0
    assert(t.getLong(0) == 2L && t.getLong(1) == 1L)
    assert(t.isNullAt(2) && t.isNullAt(3) && t.isNullAt(4))
    assert(t.getLong(5) == 0L)
  }

  test("X8o trailingActives: distincts don't sum — overlapping windows " +
      "count each key once, report days clip at the data's end") {
    val day = 86400000000L
    // user 1 active days 0 and 2 (twice — dedup), user 2 active day 2
    val rows = Seq((1L, 0L), (1L, 2L * day), (1L, 2L * day + 5L),
      (2L, 2L * day))
    val df = rows.toDF("k", "us").withColumn("ts", timestamp_micros($"us"))
    val out = TimeSeries.trailingActives(df, "k", "ts", 3)
      .as[(Long, Long)].collect().toMap
    // windows (trailing 3 days): day 0 {1}; day 1 {1}; day 2 {1,2} —
    // user 1 active on BOTH day 0 and 2 counts once. Days 3,4 clipped.
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 2L))
  }

  test("X8p decayedPopularity: exact power-of-two weight ladder, floor " +
      "cutoff, numerators match the hand computation") {
    val hl = 1000000L // 1s half-life
    // now = 3s. ages: 0s (b=0, w=2^4), 1.5s (b=1, w=2^3), 10s (b=10
    // >= maxBuckets=5 -> dropped)
    val rows = Seq(("a", 3000000L, 10L), ("a", 1500000L, 20L),
      ("a", -7000000L, 999L))
    val df = rows.toDF("g", "us", "cents")
      .withColumn("ts", timestamp_micros($"us"))
    val out = TimeSeries.decayedPopularity(df, "g", "ts", col("cents"),
        hl, maxBuckets = 5)
      .as[(String, Long, Long, Long, Int)].collect().toSeq
    // numerators over denominator 2^4: count 16 + 8 = 24;
    // cents 10·16 + 20·8 = 320
    assert(out == Seq(("a", 2L, 24L, 320L, 4)))
  }

  test("X8m lastTouchAttribution: latest preceding touch wins, " +
      "touchless conversions are 'direct', keys don't leak") {
    // key 1: view, click, purchase (-> click); purchase again with no
    //   new touch between (-> still click)
    // key 2: purchase first (-> direct), then view, purchase (-> view)
    val rows = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "purchase"),
      (2L, 1L, "purchase"), (2L, 2L, "view"), (2L, 3L, "purchase"))
    val df = rows.toDF("k", "id", "et")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.lastTouchAttribution(df, "k", "ts", "id", "et",
        "purchase")
      .as[(String, Long)].collect().toMap
    assert(out == Map("click" -> 2L, "direct" -> 1L, "view" -> 1L))
  }

  test("X8q ACF: a period-2 series has acf -1 at odd lags, +1 at even; " +
      "a constant series reports null") {
    // key 1: 100,200,100,200,100,200 — perfectly alternating
    // key 2: constant 500 — zero variance at every lag
    val rows = (1 to 6).map(i =>
        (1L, i.toLong, if (i % 2 == 1) 100L else 200L)) ++
      (1 to 6).map(i => (2L, i.toLong, 500L))
    val df = rows.toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.acf(df, "k", "ts", "id", $"cents", 3)
      .orderBy($"k", $"lag_k")
      .select($"k", $"lag_k", $"n", $"acf")
      .collect()
    val byKey = out.map(r => (r.getLong(0), r.getInt(1)) ->
      (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    // the two-sqrt chain carries ~1 ulp: compare to 1e-12, not exactly
    def close(got: (Long, Option[Double]), n: Long, want: Double) = {
      assert(got._1 == n)
      assert(math.abs(got._2.get - want) < 1e-12, s"acf ${got._2} != $want")
    }
    close(byKey((1L, 1)), 5L, -1.0)
    close(byKey((1L, 2)), 4L, 1.0)
    close(byKey((1L, 3)), 3L, -1.0)
    (1 to 3).foreach(l => assert(byKey((2L, l))._2.isEmpty,
      s"constant series must report null acf at lag $l"))
  }

  test("X8r corrMatrix: co-moving keys hit corr 1, anti-moving -1, " +
      "pairs align only on shared buckets, key cap fires") {
    // key 1 and 2 move together, key 3 inversely; key 3 misses bucket 3
    val rows = Seq(
      (1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 150L), (1L, 4L, 300L),
      (2L, 1L, 10L), (2L, 2L, 20L), (2L, 3L, 15L), (2L, 4L, 30L),
      (3L, 1L, 300L), (3L, 2L, 200L), (3L, 3L, 250L))
    val df = rows.map { case (k, b, c) => (k, b * 10 + k, c) }
      .toDF("k", "id", "cents")
      .withColumn("ts", timestamp_micros($"id" * 1000000L))
    val out = TimeSeries.corrMatrix(df, "k", "ts", "id", $"cents", 10000000L)
      .select($"k1", $"k2", $"n", $"corr")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out((1L, 2L))._1 == 4L)
    assert(math.abs(out((1L, 2L))._2 - 1.0) < 1e-12)
    // (1,3) share only buckets 1..3; there 1 moves 100,200,150 and 3
    // moves 300,200,250 — exact mirror: corr -1
    assert(out((1L, 3L))._1 == 3L)
    assert(math.abs(out((1L, 3L))._2 + 1.0) < 1e-12)
    assert(out.size == 3) // (1,2), (1,3), (2,3)
    // quadratic guardrail
    intercept[IllegalArgumentException] {
      TimeSeries.corrMatrix(df, "k", "ts", "id", $"cents", 10000000L,
        maxKeys = 2).collect()
    }
  }

  test("X8u forecastBacktest: a perfectly seasonal series scores MAE 0 " +
      "against its slot means while the naive mean pays the amplitude; " +
      "keys without training rows are excluded") {
    // key 1: strict period-2 pattern 100/300 cents, 10 train + 4 test
    // rows; key 2: test-period rows only (no training support)
    val rows = (0 until 14).map(i =>
        (1L, i.toLong, if (i % 2 == 0) 100L else 300L)) ++
      Seq((2L, 12L, 500L), (2L, 13L, 500L))
    val df = rows.toDF("k", "i", "cents")
      .withColumn("ts", timestamp_micros($"i" * 10000000L))
    val out = TimeSeries.forecastBacktest(df, "k", "ts", $"cents",
        10000000L, 2, 100000000L)
      .select($"k", $"n_train", $"n_test", $"mae_seasonal_milli",
        $"mae_naive_milli")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // slot means 100 / 300 predict the test rows exactly; the key mean
    // (200 cents) misses every row by 100 cents = 100000 milli
    assert(out == Seq((1L, 10L, 4L, 0L, 100000L)), s"$out")
  }

  private def cpFrame(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("k", "i", "cents")
      .withColumn("ts", timestamp_micros($"i" * 1000000L))

  private def cp(rows: Seq[(Long, Long, Long)]) =
    TimeSeries.changepoint(cpFrame(rows), "k", "ts", "i", $"cents")
      .select($"k", $"n", $"split_t", $"shift_milli",
        $"left_mean_milli", $"right_mean_milli")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("X8v changepoint: a planted step lands the split exactly on the " +
      "boundary, with hand-computed shift and segment means") {
    // key 1: clean 100->200 step at t=3 (the only legal split);
    // key 2: 0,0,0,0,1000x4 — legal t in {3,4,5}, the boundary t=4 must
    // beat both off-by-one splits (hand: 1e6 vs 8e5 milli)
    val rows = (0 until 6).map(i =>
        (1L, i.toLong, if (i < 3) 100L else 200L)) ++
      (0 until 8).map(i => (2L, i.toLong, if (i < 4) 0L else 1000L))
    assert(cp(rows) == Seq(
      (1L, 6L, 3L, 100000L, 100000L, 200000L),
      (2L, 8L, 4L, 1000000L, 0L, 1000000L)))
  }

  test("X8v changepoint: constant series scores zero at the EARLIEST " +
      "legal split; short keys are excluded; negative sums floor") {
    // key 1: constant -> all shifts 0, tie-break picks t = minSeg = 3;
    // key 2: 5 rows < 2*minSeg -> no legal split, excluded;
    // key 3: S3 = -4 -> left mean -4000/3 FLOORS to -1334 (truncation
    // would give -1333)
    val rows = (0 until 7).map(i => (1L, i.toLong, 50L)) ++
      (0 until 5).map(i => (2L, i.toLong, i * 10L)) ++
      Seq((3L, 0L, -1L), (3L, 1L, -1L), (3L, 2L, -2L),
        (3L, 3L, 10L), (3L, 4L, 10L), (3L, 5L, 10L))
    val out = cp(rows)
    assert(out.map(_._1) == Seq(1L, 3L), "short key 2 must be excluded")
    assert(out.head == ((1L, 7L, 3L, 0L, 50000L, 50000L)))
    val k3 = out(1)
    assert(k3._3 == 3L && k3._5 == -1334L,
      s"negative left mean must floor: $k3")
    // hand replay of the winning score: |(-4)*6 - 26*3|*1000/(3*3)
    assert(k3._4 == (math.abs(-4L * 6L - 26L * 3L) * 1000L) / 9L)
  }
}
