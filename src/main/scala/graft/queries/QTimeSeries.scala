package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** X8 time-series / finance family.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QTimeSeries {

  /** X8b — batch sessionization (round 11): per-user activity sessions
    * with a 30-minute gap rule — the gaps-and-islands batch twin of the
    * st4 streaming session windows. One window shuffle on user_id; the
    * race is all-integer (epoch-µs gaps, 0/1 running sum, event_id tie
    * break), so the oracle replays every session boundary. */
  val x8Sessionize = QuerySpec("x8_sessionize",
    (s, d) => TimeSeries.sessionize(Tables.events(s, d), "user_id", "ts",
        "event_id", 1800000000L)
      .withColumn("session_id", col("session_id").cast("long"))
      .withColumn("n_events", col("n_events").cast("long"))
      .orderBy(col("user_id"), col("session_id")),
    Some("""WITH o AS (
           |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
           |f AS (
           |  SELECT user_id, event_id, us,
           |    CASE WHEN lag(us) OVER (PARTITION BY user_id
           |        ORDER BY us, event_id) IS NULL
           |      OR us - lag(us) OVER (PARTITION BY user_id
           |        ORDER BY us, event_id) > 1800000000
           |    THEN 1 ELSE 0 END AS new_s
           |  FROM o),
           |s AS (
           |  SELECT user_id, us,
           |    CAST(sum(new_s) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id) AS BIGINT) AS session_id
           |  FROM f)
           |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
           |  min(us) AS start_us, max(us) AS end_us
           |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin),
    bench = true)


  /** X8c — ORDERED EVENT FUNNEL (round 14): view → click → purchase,
    * each transition within 24 h of the previous step's earliest valid
    * time (greedy earliest-transition semantics). Discriminative at
    * every SF (150 → 60 → 25 users at sf0.01). Per step: one pruned
    * scan + one key-sized join + a partial-combining min — never a
    * per-user event list, never a full-history window. The oracle
    * replays the CTE chain and the ppm conversion arithmetic. */
  val x8Funnel = QuerySpec("x8_funnel",
    (s, d) => TimeSeries.funnel(Tables.events(s, d), "user_id",
        "event_type", "ts", Seq("view", "click", "purchase"),
        24L * 3600 * 1000000)
      .orderBy(col("step_idx")),
    Some("""WITH e AS (SELECT user_id AS k, event_type AS t,
           |    epoch_us(ts) AS us FROM events),
           |s1 AS (SELECT k, min(us) AS ts_prev FROM e
           |  WHERE t = 'view' GROUP BY k),
           |s2 AS (SELECT e.k, min(e.us) AS ts_prev FROM e JOIN s1 USING (k)
           |  WHERE e.t = 'click' AND e.us >= s1.ts_prev
           |    AND e.us <= s1.ts_prev + 86400000000 GROUP BY e.k),
           |s3 AS (SELECT e.k, min(e.us) AS ts_prev FROM e JOIN s2 USING (k)
           |  WHERE e.t = 'purchase' AND e.us >= s2.ts_prev
           |    AND e.us <= s2.ts_prev + 86400000000 GROUP BY e.k),
           |c AS (
           |  SELECT 1 AS step_idx, 'view' AS step,
           |    (SELECT count(*) FROM s1) AS n_users
           |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
           |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
           |SELECT CAST(step_idx AS INT) AS step_idx, step,
           |  CAST(n_users AS BIGINT) AS n_users,
           |  CAST(coalesce(floor(n_users * 1000000 /
           |      lag(n_users) OVER (ORDER BY step_idx)),
           |    CASE WHEN step_idx = 1 THEN 1000000 END) AS BIGINT)
           |    AS conv_ppm
           |FROM c ORDER BY step_idx""".stripMargin),
    bench = true)


  /** X8d — cohort retention matrix: first-seen-day cohorts × purchase-day
    * retention. Discriminative at every SF (two day-grain cohorts at
    * sf0.01, per-cell retention 30–70%); the oracle replays the
    * cohort-min / distinct-active-day / ppm arithmetic directly. */
  val x8Retention = QuerySpec("x8_retention",
    (s, d) => TimeSeries.retention(Tables.events(s, d), "user_id", "ts",
        "event_type", Seq("purchase"))
      // dates cross the oracle boundary as strings (SURVEY §7.4)
      .withColumn("cohort", col("cohort").cast("string"))
      .orderBy(col("cohort"), col("age_days")),
    Some("""WITH e AS (SELECT user_id AS k, CAST(ts AS DATE) AS d,
           |    event_type AS t FROM events),
           |c AS (SELECT k, min(d) AS cohort FROM e GROUP BY k),
           |s AS (SELECT cohort, count(*) AS n_cohort FROM c GROUP BY cohort),
           |a AS (SELECT DISTINCT k, d FROM e WHERE t = 'purchase')
           |SELECT CAST(c.cohort AS VARCHAR) AS cohort,
           |  CAST(datediff('day', c.cohort, a.d) AS INT) AS age_days,
           |  count(*) AS n_active, s.n_cohort,
           |  CAST(floor(count(*) * 1000000 / s.n_cohort) AS BIGINT)
           |    AS ret_ppm
           |FROM a JOIN c USING (k) JOIN s USING (cohort)
           |GROUP BY c.cohort, age_days, s.n_cohort
           |ORDER BY cohort, age_days""".stripMargin),
    bench = true)


  /** X8e — first-order Markov transition matrix of the event stream:
    * |types|² cells with conditional ppm, from one key-windowed lag. */
  val x8Transitions = QuerySpec("x8_transitions",
    (s, d) => TimeSeries.transitions(Tables.events(s, d), "user_id", "ts",
        "event_id", "event_type")
      .orderBy(col("prev_t"), col("next_t")),
    Some("""-- nonneg-div(1): counts/rank sums only
           |WITH o AS (SELECT user_id, event_id, event_type,
           |    epoch_us(ts) AS us FROM events),
           |p AS (SELECT lag(event_type) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id) AS prev_t,
           |    event_type AS next_t
           |  FROM o),
           |c AS (SELECT prev_t, next_t, count(*) AS cnt FROM p
           |  WHERE prev_t IS NOT NULL GROUP BY 1, 2),
           |t AS (SELECT prev_t, sum(cnt) AS n_row FROM c GROUP BY 1)
           |SELECT prev_t, next_t, CAST(cnt AS BIGINT) AS cnt,
           |  CAST(cnt * 1000000 // n_row AS BIGINT) AS p_ppm
           |FROM c JOIN t USING (prev_t)
           |ORDER BY prev_t, next_t""".stripMargin),
    bench = true)


  /** X8f — robust rolling anomaly flags (ops/TimeSeries.robustAnomalies):
    * per-user trailing-15 LOWER median + MAD over integer cents, flag =
    * |x − med| > 7·mad. All-integer (lower medians, no even-count
    * halving), so the DuckDB list-window oracle replays bit-exactly.
    * One key-window shuffle; the window array is 15 longs per row. */
  val x8Anomaly = QuerySpec("x8_anomaly",
    (s, d) => TimeSeries.robustAnomalies(Tables.events(s, d), "user_id",
        "ts", "event_id",
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("event_id")),
    Some("""WITH e AS (
           |  SELECT event_id, user_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, ts
           |  FROM events),
           |w AS (
           |  SELECT event_id, user_id, cents,
           |    list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
           |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS win
           |  FROM e),
           |s AS (
           |  SELECT event_id, user_id, cents, list_sort(win) AS l
           |  FROM w WHERE len(win) = 15),
           |m AS (
           |  SELECT event_id, user_id, cents, l[8] AS med,
           |    list_sort(list_transform(l, x -> abs(x - l[8])))[8] AS mad
           |  FROM s)
           |SELECT event_id, user_id, cents, med, mad,
           |  (abs(cents - med) > 7 * mad) AS is_anom
           |FROM m ORDER BY event_id""".stripMargin),
    bench = true)


  /** X8g — per-key maximum drawdown (ops/TimeSeries.maxDrawdown): the
    * deepest peak-to-trough drop of each series, absolute cents and ppm
    * of the peak it fell from. All-integer (running prefix max, integer
    * ppm, positive-peak guard) so the oracle replays bit-exactly; ONE
    * key-window shuffle whose partitioning the final per-key aggregate
    * reuses — no second exchange. */
  val x8Drawdown = QuerySpec("x8_drawdown",
    (s, d) => TimeSeries.maxDrawdown(Tables.events(s, d), "user_id",
        "ts", "event_id",
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("user_id")),
    Some("""-- nonneg-div(1): peak - price >= 0 by prefix max
           |WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |p AS (SELECT user_id, cents,
           |    max(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           |  FROM e),
           |d AS (SELECT user_id, peak, peak - cents AS dd,
           |    CASE WHEN peak > 0 THEN (peak - cents) * 1000000 // peak END
           |      AS dd_ppm
           |  FROM p)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_ticks,
           |  max(peak) AS peak_cents, max(dd) AS max_dd_cents,
           |  max(dd_ppm) AS max_dd_ppm
           |FROM d GROUP BY 1 ORDER BY user_id""".stripMargin),
    bench = true)


  /** X8h — per-key correlation vs the equal-weight market index
    * (ops/TimeSeries.corrVsIndex): hourly closes, integer moment sums,
    * exact BIGINT covariance/variance numerators, and a final double
    * corr whose divide/sqrt chain is textually pinned in the oracle
    * (IEEE-identical cross-engine — the chi-square discipline). Linear
    * against-the-index, never all-pairs. */
  val x8IndexCorr = QuerySpec("x8_index_corr",
    (s, d) => TimeSeries.corrVsIndex(Tables.events(s, d), "user_id",
        "ts", "event_id",
        floor(col("value") * 100 + lit(0.5)).cast("long"), 3600000000L)
      .orderBy(col("user_id")),
    Some("""-- nonneg-div(2): epoch_us of post-1970 fixture timestamps
           |WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us FROM events),
           |b AS (SELECT user_id, cents, us // 3600000000 AS bucket,
           |    row_number() OVER (PARTITION BY user_id, us // 3600000000
           |      ORDER BY us DESC, event_id DESC) AS rn
           |  FROM e),
           |c AS (SELECT user_id, bucket, cents FROM b WHERE rn = 1),
           |i AS (SELECT bucket, CAST(sum(cents) AS BIGINT) AS idx
           |  FROM c GROUP BY 1),
           |m AS (SELECT c.user_id, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(c.cents) AS BIGINT) AS sx,
           |    CAST(sum(i.idx) AS BIGINT) AS sy,
           |    CAST(sum(c.cents * i.idx) AS BIGINT) AS sxy,
           |    CAST(sum(c.cents * c.cents) AS BIGINT) AS sxx,
           |    CAST(sum(i.idx * i.idx) AS BIGINT) AS syy
           |  FROM c JOIN i USING (bucket) GROUP BY 1),
           |v AS (SELECT user_id, n, n * sxy - sx * sy AS cov_num,
           |    n * sxx - sx * sx AS varx_num, n * syy - sy * sy AS vary_num
           |  FROM m)
           |SELECT user_id, n, cov_num, varx_num, vary_num,
           |  CASE WHEN varx_num > 0 AND vary_num > 0 THEN
           |    CAST(cov_num AS DOUBLE) / sqrt(CAST(varx_num AS DOUBLE)) /
           |    sqrt(CAST(vary_num AS DOUBLE)) END AS corr,
           |  CASE WHEN vary_num > 0 THEN
           |    CAST(cov_num AS DOUBLE) / CAST(vary_num AS DOUBLE) END
           |    AS beta
           |FROM v ORDER BY user_id""".stripMargin),
    bench = true)


  /** X8j — truncated exponential moving average
    * (ops/TimeSeries.emaTrunc): α = 1/2 smoothing over a 16-tick
    * trailing window as ONE Horner fold — aggregate(arr, 0, (acc, x) →
    * 2·acc + x) — entirely in integer arithmetic (numerator and
    * milli-scaled quotient are exact BIGINTs; the oracle's list_reduce
    * computes the identical integer). Same one-window-shuffle shape as
    * x8_anomaly. */
  val x8Ema = QuerySpec("x8_ema",
    (s, d) => TimeSeries.emaTrunc(Tables.events(s, d), "user_id",
        "ts", "event_id",
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("event_id")),
    Some("""-- nonneg-div(1): nonneg-weighted sum of nonneg fixture cents
           |WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |w AS (SELECT event_id, user_id, cents,
           |    list(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
           |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS arr
           |  FROM e),
           |f AS (SELECT event_id, user_id, cents,
           |    list_reduce(arr, (a, b) -> a * 2 + b) AS ema_num
           |  FROM w WHERE len(arr) = 16)
           |SELECT event_id, user_id, cents, ema_num,
           |  ema_num * 1000 // 65535 AS ema_milli
           |FROM f ORDER BY event_id""".stripMargin),
    bench = true)


  /** X8i — realized volatility per (key, day)
    * (ops/TimeSeries.realizedVolatility): tick-to-tick integer cent
    * deltas (later-tick day attribution, first tick excluded) rolled
    * into daily net move, Σd² realized-variance numerator, and max
    * single move — exact BIGINTs end to end. One key-window lag whose
    * hash partitioning the (key, day) aggregate reuses (subset
    * clustering — no second exchange, plan-pinned). */
  val x8Volatility = QuerySpec("x8_volatility",
    (s, d) => TimeSeries.realizedVolatility(Tables.events(s, d), "user_id",
        "ts", "event_id",
        floor(col("value") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("user_id"), col("day")),
    Some("""-- nonneg-div(1): epoch_us of post-1970 fixture timestamps
           |WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |l AS (SELECT user_id, us,
           |    cents - lag(cents) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id) AS d
           |  FROM e),
           |f AS (SELECT user_id, us // 86400000000 AS day, d
           |  FROM l WHERE d IS NOT NULL)
           |SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_ret,
           |  CAST(sum(d) AS BIGINT) AS net_cents,
           |  CAST(sum(d * d) AS BIGINT) AS rv_cents2,
           |  max(abs(d)) AS max_abs_cents
           |FROM f GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin),
    bench = true)


  /** X8 — resample + forward-fill (ops/TimeSeries.scala): the irregular
    * tick stream regularized onto a 15-minute grid per user, gaps
    * carrying the last close forward. The oracle rebuilds the spine with
    * generate_series and fills with last_value IGNORE NULLS — the same
    * deterministic (ts, value)-descending close per bucket as the OHLC
    * oracle, and a pure value PASSTHROUGH (no float arithmetic), so
    * hashes match bit-exactly. */
  val x8Resample = QuerySpec("x8_resample_ffill",
    (s, d) => TimeSeries.resampleFfill(
        Tables.events(s, d).filter(col("user_id") < 8)
          .select(col("user_id"), expr("unix_micros(ts)").as("us"),
            col("value")),
        "user_id", "us", "value", 900000000L)
      .orderBy(col("user_id"), col("bucket_us")),
    Some("""-- nonneg-div(1): epoch_us of post-1970 fixture timestamps
           |WITH e AS (
           |  SELECT user_id, epoch_us(ts) AS us, value FROM events
           |  WHERE user_id < 8),
           |b AS (SELECT user_id, (us // 900000000) * 900000000 AS bucket_us,
           |    us, value FROM e),
           |c AS (
           |  SELECT user_id, bucket_us, value AS close,
           |    row_number() OVER (PARTITION BY user_id, bucket_us
           |      ORDER BY us DESC, value DESC) AS rn,
           |    count(*) OVER (PARTITION BY user_id, bucket_us) AS n
           |  FROM b),
           |closes AS (SELECT user_id, bucket_us, close, n FROM c WHERE rn = 1),
           |spine AS (
           |  SELECT user_id,
           |    unnest(generate_series(mn, mx, 900000000)) AS bucket_us
           |  FROM (SELECT user_id, min(bucket_us) AS mn, max(bucket_us) AS mx
           |        FROM b GROUP BY 1))
           |SELECT s.user_id, s.bucket_us,
           |  last_value(c2.close IGNORE NULLS) OVER (PARTITION BY s.user_id
           |    ORDER BY s.bucket_us ROWS UNBOUNDED PRECEDING) AS px,
           |  coalesce(c2.n, 0) AS n_ticks
           |FROM spine s LEFT JOIN closes c2
           |  ON c2.user_id = s.user_id AND c2.bucket_us = s.bucket_us
           |ORDER BY s.user_id, s.bucket_us""".stripMargin),
    bench = true)


  /** X8k — CUSUM changepoint flags (ops/TimeSeries.cusum): the two-sided
    * Page detector over per-key cent deltas, slack 4000 ≈ the corpus
    * median |delta| (the statistic decays on typical moves, accumulates
    * on drifts), alarm at 20000. The prefix recursion runs as a
    * secondary-sort mapPartitions — one key shuffle then a constant-
    * state streaming pass; the oracle replays the identical integers
    * with a DuckDB prefix-list fold. */
  val x8Cusum = QuerySpec("x8_cusum",
    (s, d) => TimeSeries.cusum(Tables.events(s, d), "user_id", "ts",
        "event_id", floor(col("value") * 100 + lit(0.5)).cast("long"),
        4000L, 20000L)
      .orderBy(col("event_id")),
    Some("""WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |l AS (SELECT event_id, user_id, cents, us,
           |    coalesce(cents - lag(cents) OVER (PARTITION BY user_id
           |      ORDER BY us, event_id), 0) AS d
           |  FROM e),
           |w AS (SELECT event_id, user_id, cents, d,
           |    list(d) OVER (PARTITION BY user_id ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
           |  FROM l),
           |f AS (SELECT event_id, user_id, cents, d,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
           |      (a, b) -> greatest(CAST(0 AS BIGINT), a + b - 4000))
           |      AS cusum_up,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
           |      (a, b) -> greatest(CAST(0 AS BIGINT), a - b - 4000))
           |      AS cusum_dn
           |  FROM w)
           |SELECT event_id, user_id, cents, d, cusum_up, cusum_dn,
           |  CAST(CASE WHEN cusum_up > 20000 OR cusum_dn > 20000
           |    THEN 1 ELSE 0 END AS BIGINT) AS alarm
           |FROM f ORDER BY event_id""".stripMargin),
    bench = true)


  /** X8l — seasonal slot profile (ops/TimeSeries.seasonalProfile):
    * hour-of-day activity shape per user — exact per-slot counts/sums,
    * integer-milli means, deviation from the key-wide mean. One
    * (key, slot) shuffle to a ≤ |keys|·24-row frame. */
  val x8Seasonal = QuerySpec("x8_seasonal",
    (s, d) => TimeSeries.seasonalProfile(Tables.events(s, d), "user_id",
        "ts", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("user_id"), col("slot")),
    Some("""-- nonneg-div(4): nonneg fixture cents sums and epoch slots
           |WITH e AS (SELECT user_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    (epoch_us(ts) // 3600000000) % 24 AS slot
           |  FROM events),
           |g AS (SELECT user_id, slot, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(cents) AS BIGINT) AS sum_cents
           |  FROM e GROUP BY 1, 2),
           |k AS (SELECT user_id, slot, n, sum_cents,
           |    CAST(sum(n) OVER (PARTITION BY user_id) AS BIGINT) AS key_n,
           |    CAST(sum(sum_cents) OVER (PARTITION BY user_id) AS BIGINT)
           |      AS key_sum
           |  FROM g)
           |SELECT user_id, slot, n, sum_cents,
           |  sum_cents * 1000 // n AS mean_milli,
           |  sum_cents * 1000 // n - key_sum * 1000 // key_n AS dev_milli
           |FROM k ORDER BY user_id, slot""".stripMargin))


  /** X8m — last-touch conversion attribution
    * (ops/TimeSeries.lastTouchAttribution): every purchase credits the
    * latest preceding non-purchase event type of the same user;
    * touchless conversions credit 'direct'. One key-window shuffle +
    * a |types|-bounded aggregate. */
  val x8Attribution = QuerySpec("x8_attribution",
    (s, d) => TimeSeries.lastTouchAttribution(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type", "purchase")
      .orderBy(col("channel")),
    Some("""WITH e AS (SELECT user_id, event_id, event_type,
           |    epoch_us(ts) AS us
           |  FROM events),
           |w AS (SELECT event_type,
           |    last_value(CASE WHEN event_type <> 'purchase'
           |        THEN event_type END IGNORE NULLS)
           |      OVER (PARTITION BY user_id ORDER BY us, event_id
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |      AS touch
           |  FROM e)
           |SELECT coalesce(touch, 'direct') AS channel,
           |  CAST(count(*) AS BIGINT) AS n_conversions
           |FROM w WHERE event_type = 'purchase'
           |GROUP BY 1 ORDER BY channel""".stripMargin))


  /** X8n — ticks → hourly closes → per-key risk report in one DAG
    * (ops/TimeSeries.closesSummary): the finance-side e2e composite —
    * close-picking window (WindowGroupLimit-bounded shuffle), deltas +
    * running peak on the checkpointed closes frame, one per-key
    * aggregate. Exact BIGINTs; the oracle replays the whole chain. */
  val x8ClosesSummary = QuerySpec("x8_closes_summary",
    (s, d) => TimeSeries.closesSummary(Tables.events(s, d), "user_id",
        "ts", "event_id", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("user_id")),
    Some("""-- nonneg-div(1): epoch_us of post-1970 fixture timestamps
           |WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |b AS (SELECT user_id, event_id, cents, us,
           |    us // 3600000000 AS bucket
           |  FROM e),
           |r AS (SELECT user_id, bucket, cents,
           |    row_number() OVER (PARTITION BY user_id, bucket
           |      ORDER BY us DESC, event_id DESC) AS rn
           |  FROM b),
           |c AS (SELECT user_id, bucket, cents AS close
           |  FROM r WHERE rn = 1),
           |w AS (SELECT user_id, close,
           |    close - lag(close) OVER (PARTITION BY user_id
           |      ORDER BY bucket) AS d,
           |    max(close) OVER (PARTITION BY user_id ORDER BY bucket
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           |  FROM c)
           |SELECT user_id, CAST(count(*) AS BIGINT) AS n_closes,
           |  CAST(sum(d) AS BIGINT) AS net_cents,
           |  CAST(sum(d * d) AS BIGINT) AS rv_cents2,
           |  max(abs(d)) AS max_abs_cents,
           |  CAST(max(peak - close) AS BIGINT) AS max_dd_cents
           |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin),
    bench = true)


  /** X8o — trailing-7-day distinct actives (WAU): the sliding-distinct
    * count a frame aggregate over daily counts CANNOT express (distincts
    * don't sum); contribute-then-count — each active day fans out to 7
    * report days (bounded explode), one (day, key) distinct shuffle. */
  val x8Wau = QuerySpec("x8_wau",
    (s, d) => TimeSeries.trailingActives(Tables.events(s, d), "user_id",
        "ts", 7)
      .orderBy(col("report_day")),
    Some("""-- nonneg-div(1): epoch_us of post-1970 fixture timestamps
           |WITH a AS (SELECT DISTINCT user_id AS k,
           |    epoch_us(ts) // 86400000000 AS day
           |  FROM events),
           |s AS (SELECT max(day) AS max_day FROM a),
           |e AS (SELECT k, unnest(generate_series(day, day + 6))
           |    AS report_day
           |  FROM a)
           |SELECT report_day,
           |  CAST(count(DISTINCT k) AS BIGINT) AS n_active
           |FROM e, s WHERE report_day <= s.max_day
           |GROUP BY report_day ORDER BY report_day""".stripMargin),
    bench = true)


  /** X8p — exact integer time-decayed popularity
    * (ops/TimeSeries.decayedPopularity): half-life 2 days over the
    * 30-day corpus, weights 2^(19−bucket) over the common denominator
    * 2^19 — recency-weighted counts and cent sums as exact BIGINT
    * numerators, no pow(), no doubles. One group shuffle. */
  val x8Decay = QuerySpec("x8_decay",
    (s, d) => TimeSeries.decayedPopularity(Tables.events(s, d),
        "event_type", "ts",
        floor(col("value") * 100 + lit(0.5)).cast("long"),
        172800000000L, maxBuckets = 20)
      .orderBy(col("event_type")),
    Some("""-- nonneg-div(2): age now_us - us >= 0 under the max-ts anchor
           |WITH e AS (SELECT event_type,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |nn AS (SELECT max(us) AS now_us FROM e),
           |b AS (SELECT event_type, cents,
           |    (nn.now_us - us) // 172800000000 AS b
           |  FROM e, nn WHERE (nn.now_us - us) // 172800000000 < 20),
           |w AS (SELECT event_type, cents,
           |    CAST(1 AS BIGINT) << (19 - CAST(b AS INT)) AS w
           |  FROM b)
           |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(sum(w) AS BIGINT) AS decayed_count_num,
           |  CAST(sum(w * cents) AS BIGINT) AS decayed_cents_num,
           |  CAST(19 AS INT) AS denom_log2
           |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin))


  /** X8q — lag-1..3 autocorrelation per key (ops/TimeSeries.acf): exact
    * BIGINT moment numerators per (key, lag) with the one float ACF
    * derived in a parenthesization textually mirrored by the oracle
    * (the corrVsIndex discipline). One key-window sort computes all
    * three lags; stack + a map-side-combined (key, lag) aggregate. */
  val x8Acf = QuerySpec("x8_acf",
    (s, d) => TimeSeries.acf(Tables.events(s, d), "user_id", "ts",
        "event_id", floor(col("value") * 100 + lit(0.5)).cast("long"), 3)
      .orderBy(col("user_id"), col("lag_k")),
    Some("""WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |l AS (SELECT user_id, cents AS x,
           |    lag(cents, 1) OVER w AS lag_1,
           |    lag(cents, 2) OVER w AS lag_2,
           |    lag(cents, 3) OVER w AS lag_3
           |  FROM e
           |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           |p AS (SELECT user_id, 1 AS lag_k, x, lag_1 AS y FROM l
           |      WHERE lag_1 IS NOT NULL
           |  UNION ALL SELECT user_id, 2, x, lag_2 FROM l
           |      WHERE lag_2 IS NOT NULL
           |  UNION ALL SELECT user_id, 3, x, lag_3 FROM l
           |      WHERE lag_3 IS NOT NULL),
           |g AS (SELECT user_id, lag_k, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(x * y) AS BIGINT) AS sxy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx,
           |    CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM p GROUP BY 1, 2)
           |SELECT user_id, lag_k, n,
           |  n * sxy - sx * sy AS cov_num,
           |  n * sxx - sx * sx AS varx_num,
           |  n * syy - sy * sy AS vary_num,
           |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
           |    CAST(n * sxy - sx * sy AS DOUBLE) /
           |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) /
           |    sqrt(CAST(n * syy - sy * sy AS DOUBLE)) END AS acf
           |FROM g ORDER BY user_id, lag_k""".stripMargin),
    bench = true)


  /** X8r — pairwise correlation matrix (ops/TimeSeries.corrMatrix):
    * close-to-close Pearson correlation for every pair of the 8-key
    * watchlist over daily buckets — exact BIGINT moments, pinned float
    * chain, caller-bounded |keys|² (the declared quadratic
    * guardrail). */
  val x8CorrMatrix = QuerySpec("x8_corr_matrix",
    (s, d) => TimeSeries.corrMatrix(
        Tables.events(s, d).filter(col("user_id") < 8),
        "user_id", "ts", "event_id",
        floor(col("value") * 100 + lit(0.5)).cast("long"), 86400000000L)
      .orderBy(col("k1"), col("k2")),
    Some("""-- nonneg-div(1): epoch_us of post-1970 fixture timestamps
           |WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events WHERE user_id < 8),
           |b AS (SELECT *, us // 86400000000 AS bucket FROM e),
           |r AS (SELECT user_id, bucket, cents,
           |    row_number() OVER (PARTITION BY user_id, bucket
           |      ORDER BY us DESC, event_id DESC) AS rn
           |  FROM b),
           |cl AS (SELECT user_id, bucket, cents FROM r WHERE rn = 1),
           |p AS (SELECT a.user_id AS k1, bb.user_id AS k2,
           |    a.cents AS x, bb.cents AS y
           |  FROM cl a JOIN cl bb ON a.bucket = bb.bucket
           |    AND a.user_id < bb.user_id),
           |g AS (SELECT k1, k2, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |    CAST(sum(x * y) AS BIGINT) AS sxy,
           |    CAST(sum(x * x) AS BIGINT) AS sxx,
           |    CAST(sum(y * y) AS BIGINT) AS syy
           |  FROM p GROUP BY 1, 2)
           |SELECT k1, k2, n,
           |  n * sxy - sx * sy AS cov_num,
           |  n * sxx - sx * sx AS varx_num,
           |  n * syy - sy * sy AS vary_num,
           |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
           |    CAST(n * sxy - sx * sy AS DOUBLE) /
           |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) /
           |    sqrt(CAST(n * syy - sy * sy AS DOUBLE)) END AS corr
           |FROM g ORDER BY k1, k2""".stripMargin))


  /** X8s — per-priority Gini coefficient of customer spend
    * (ops/Concentration.giniBy): rank-weighted exact rational in
    * DECIMAL(38,0)/HUGEINT, one pinned floor division to ppm. */
  val x8Gini = QuerySpec("x8_gini",
    (s, d) => Concentration.giniBy(
        T(s, d, "orders")
          .groupBy(col("o_orderpriority").as("prio"), col("o_custkey"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("cents")),
        "prio", "o_custkey", col("cents"))
      .orderBy(col("prio")),
    Some("""-- nonneg-div(1): 2*sum(i*x_asc) >= (n+1)*sum(x), Chebyshev sum inequality
           |WITH cust AS (SELECT o_orderpriority AS prio, o_custkey,
           |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS cents
           |  FROM orders GROUP BY 1, 2),
           |r AS (SELECT prio, cents,
           |    row_number() OVER (PARTITION BY prio
           |      ORDER BY cents, o_custkey) AS i
           |  FROM cust),
           |g AS (SELECT prio, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(cents) AS BIGINT) AS sum_x,
           |    CAST(sum(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS sr
           |  FROM r GROUP BY 1)
           |SELECT prio, n, sum_x,
           |  CASE WHEN sum_x > 0 THEN
           |    CAST((1000000 * (2 * sr - (CAST(n AS HUGEINT) + 1) * sum_x))
           |      // (CAST(n AS HUGEINT) * sum_x) AS BIGINT) END AS gini_ppm
           |FROM g ORDER BY prio""".stripMargin))


  /** X8t — per-nation supplier-revenue HHI (ops/Concentration.hhiBy):
    * market-concentration index as exact share-square sums; ppm of the
    * [0,1] scale (antitrust points = ppm/100). */
  val x8Hhi = QuerySpec("x8_hhi",
    (s, d) => Concentration.hhiBy(
        T(s, d, "lineitem")
          .join(T(s, d, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_nationkey").as("nation"), col("s_suppkey"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
              .as("cents")),
        "nation", "s_suppkey", col("cents"))
      .orderBy(col("nation")),
    Some("""-- nonneg-div(1): squared share mass
           |WITH rev AS (SELECT s_nationkey AS nation, s_suppkey,
           |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
           |      AS BIGINT) AS mx
           |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |  GROUP BY 1, 2),
           |g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n_members,
           |    CAST(sum(mx) AS BIGINT) AS sum_x,
           |    CAST(sum(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS sq
           |  FROM rev GROUP BY 1)
           |SELECT nation, n_members, sum_x,
           |  CASE WHEN sum_x > 0 THEN
           |    CAST((1000000 * sq) // (CAST(sum_x AS HUGEINT) * sum_x)
           |      AS BIGINT) END AS hhi_ppm
           |FROM g ORDER BY nation""".stripMargin))


  /** X8u — seasonal-forecast backtest (ops/TimeSeries.forecastBacktest):
    * hour-of-day slot means trained before the time-range midpoint,
    * scored after it, per-key integer MAE beside the naive key-mean
    * baseline over the SAME covered rows — a leak-free temporal holdout
    * whose every number the oracle replays. */
  val x8ForecastBacktest = QuerySpec("x8_forecast_backtest",
    (s, d) => {
      val ev = Tables.events(s, d)
      val r = ev.agg(min(expr("unix_micros(ts)")).as("lo"),
        max(expr("unix_micros(ts)")).as("hi")).head
      TimeSeries.forecastBacktest(ev, "user_id", "ts",
          floor(col("value") * 100 + lit(0.5)).cast("long"),
          3600000000L, 24, (r.getLong(0) + r.getLong(1)) / 2)
        .orderBy(col("user_id"))
    },
    Some("""-- nonneg-div(6): cents sums, abs errors, midpoint epoch
           |WITH sp AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
           |    AS s FROM events),
           |e AS (SELECT user_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us,
           |    (epoch_us(ts) // 3600000000) % 24 AS slot
           |  FROM events),
           |tr AS (SELECT * FROM e WHERE us < (SELECT s FROM sp)),
           |sm AS (SELECT user_id, slot,
           |    CAST(sum(cents) * 1000 // count(*) AS BIGINT) AS ps
           |  FROM tr GROUP BY 1, 2),
           |km AS (SELECT user_id,
           |    CAST(sum(cents) * 1000 // count(*) AS BIGINT) AS pk,
           |    CAST(count(*) AS BIGINT) AS n_train
           |  FROM tr GROUP BY 1),
           |te AS (SELECT t.user_id, t.cents, sm.ps, km.pk, km.n_train
           |  FROM e t
           |  JOIN sm ON sm.user_id = t.user_id AND sm.slot = t.slot
           |  JOIN km ON km.user_id = t.user_id
           |  WHERE t.us >= (SELECT s FROM sp))
           |SELECT user_id, max(n_train) AS n_train,
           |  CAST(count(*) AS BIGINT) AS n_test,
           |  CAST(sum(abs(cents * 1000 - ps)) // count(*) AS BIGINT)
           |    AS mae_seasonal_milli,
           |  CAST(sum(abs(cents * 1000 - pk)) // count(*) AS BIGINT)
           |    AS mae_naive_milli
           |FROM te GROUP BY user_id ORDER BY user_id""".stripMargin))


  /** X8v — SINGLE CHANGEPOINT per key by largest mean shift (round 16):
    * the AMOC first split of binary segmentation over each user's
    * (ts, event_id)-ordered cent series — regime-change detection. The
    * split score is the exact rational mean difference
    * (S_t·n − S_n·t)/(t·(n−t)) floored to milli; the argmax tie-breaks
    * on the EARLIEST split; segment means use the sign-safe pinned
    * floor. The oracle replays prefix sums, the score at every legal
    * split, and the (score DESC, t ASC) selection. */
  val x8Changepoint = QuerySpec("x8_changepoint",
    (s, d) => TimeSeries.changepoint(Tables.events(s, d), "user_id", "ts",
        "event_id", floor(col("value") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("user_id")),
    Some("""-- nonneg-div(1): the shift numerator is abs(); means carry the
           |-- explicit ((x%y)+y)%y floor guard
           |WITH e AS (SELECT user_id, event_id,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           |    epoch_us(ts) AS us
           |  FROM events),
           |w AS (SELECT user_id, us, cents,
           |    CAST(count(*) OVER ord AS BIGINT) AS t,
           |    CAST(sum(cents) OVER ord AS BIGINT) AS s_t,
           |    CAST(count(*) OVER al AS BIGINT) AS n,
           |    CAST(sum(cents) OVER al AS BIGINT) AS s_n
           |  FROM e
           |  WINDOW ord AS (PARTITION BY user_id ORDER BY us, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |    al AS (PARTITION BY user_id)),
           |sc AS (SELECT user_id, us, t, n,
           |    abs(s_t * n - s_n * t) * 1000 // (t * (n - t))
           |      AS shift_milli,
           |    (s_t * 1000 - ((s_t * 1000 % t) + t) % t) // t AS lm,
           |    ((s_n - s_t) * 1000 - (((s_n - s_t) * 1000 % (n - t))
           |      + (n - t)) % (n - t)) // (n - t) AS rm
           |  FROM w WHERE t >= 3 AND t <= n - 3),
           |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
           |    ORDER BY shift_milli DESC, t ASC) AS rn FROM sc)
           |SELECT user_id, n, t AS split_t, us AS split_us, shift_milli,
           |  lm AS left_mean_milli, rm AS right_mean_milli
           |FROM rk WHERE rn = 1 ORDER BY user_id""".stripMargin))
}
