package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X9b — A/B experiment analysis over an event stream.
  *
  * The measurement half of product experimentation (assignment itself is
  * a deterministic hash — the same md5 discipline every sampling lane
  * uses, so a user's arm is reproducible from their id alone, no
  * assignment table to store or join). Reference scope: the downloader's
  * job pipeline has no experiment surface; this lane exists for the
  * §2.11 analytics mandate alongside funnel/retention/transitions.
  */
object Experiment {

  /** Exact-integer FLOOR division as a SQL fragment — (x − pmod(x, y))
    * div y for positive y, correct for NEGATIVE numerators where bare
    * `div` truncates. The oracle twin is the explicit
    * (x − ((x % y) + y) % y) // y form (DuckDB's `//` truncates like
    * div — the round-15 correction). ONE definition so the idiom has
    * one site to fix, not twelve (round-15 review). */
  private def floorDiv(x: String, y: String): Column =
    expr(s"($x - pmod($x, $y)) div $y")

  /** Two-arm conversion report with a chi-square independence statistic.
    *
    * Arm = md5-bucket parity of the unit id ([[Sketch.shardOf]], the
    * engine-portable twin of hash-mod bucketing) — deterministic,
    * storage-free, oracle-replayable. Conversion = the unit has ≥ 1
    * `convType` event. The contingency table is (a, b; c, d) =
    * (conv_a, n_a−conv_a; conv_b, n_b−conv_b) and
    * chi2_fp = floor(χ² · 10^4) with
    * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — the 2×2 chi-square is
    * RATIONAL (no libm), computed in doubles with a parenthesization
    * kept textually identical in the oracle, so IEEE rounding agrees
    * cross-engine at any magnitude (products can pass 2^53, but both
    * engines round the same way at every step).
    *
    * Scale shape: one unit-keyed partial-combining max (conversion
    * flag), then a single-row conditional aggregate — the entire report
    * is one scan + one key shuffle + a 1-row exchange; the event volume
    * is touched exactly once. lift_ppm is null when the A arm has no
    * conversions (0/0 honestly reported, not fabricated). */
  def abReport(events: DataFrame, keyCol: String, typeCol: String,
      convType: String): DataFrame = {
    val perUnit = events
      .select(col(keyCol).as("unit"), col(typeCol).as("t"))
      .groupBy(col("unit"))
      .agg(max(when(col("t") === convType, 1L).otherwise(0L)).as("conv"))
      .withColumn("arm",
        when(Sketch.shardOf(col("unit"), 2) === 0, "a").otherwise("b"))
    perUnit.agg(
        sum(when(col("arm") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "a", col("conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === "b", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "b", col("conv")).otherwise(0L)).as("conv_b"))
      .withColumn("cr_a_ppm", expr("conv_a * 1000000L div n_a"))
      .withColumn("cr_b_ppm", expr("conv_b * 1000000L div n_b"))
      .withColumn("lift_ppm",
        when(col("conv_a") > 0,
          expr("conv_b * n_a * 1000000L div (conv_a * n_b)")))
      // textually mirrored in the oracle SQL — do not re-parenthesize;
      // degenerate margins (no conversions anywhere, or no
      // non-conversions) have no defined chi-square: null, not a 0/0
      .withColumn("chi2_fp", expr(
        "CASE WHEN conv_a + conv_b > 0 " +
          "AND (n_a - conv_a) + (n_b - conv_b) > 0 THEN " +
          "CAST(floor(((CAST(n_a + n_b AS DOUBLE) * " +
          "((CAST(conv_a AS DOUBLE) * (n_b - conv_b) - " +
          "CAST(n_a - conv_a AS DOUBLE) * conv_b) * " +
          "(CAST(conv_a AS DOUBLE) * (n_b - conv_b) - " +
          "CAST(n_a - conv_a AS DOUBLE) * conv_b))) * 10000.0) / " +
          "(((CAST(n_a AS DOUBLE) * n_b) * (conv_a + conv_b)) * " +
          "((n_a - conv_a) + (n_b - conv_b)))) AS BIGINT) END"))
  }

  /** X9c — exact tie-aware AUC (Mann–Whitney): how well a score column
    * RANKS a binary label, the one-number report card for every scorer
    * this engine ships (LM quality, NB classifier, Gopher gates).
    * AUC = P(score⁺ > score⁻) + ½·P(tie) = U₁/(n₁n₀) with U₁ from the
    * rank-sum — and ties are the whole point of doing it exactly:
    * integer-valued scores (token counts, ppm ratios) tie constantly,
    * and the naive "count concordant pairs, ignore ties" answer is
    * biased by half the tie mass.
    *
    * Integer discipline: average ranks are half-integers, so everything
    * is carried DOUBLED — for a tie group of c rows preceded by `lt`
    * smaller-scored rows, each row's doubled average rank is
    * 2·lt + c + 1 (a+b for the rank span [a, b], exact). Then
    * u2 = 2U₁ = Σ⁺(2·lt + c + 1) − n₁(n₁+1) and
    * auc_ppm = u2·10^6 div (2·n₁·n₀) — integers end to end, the oracle
    * replays bit-identically; degenerate single-class inputs report
    * null, not 0/0.
    *
    * Scale shape: ONE shuffle grouping by score value (map-side
    * combining — the fact volume collapses to |distinct scores| rows
    * before the exchange), then a cumulative count over the
    * score-ordered group frame. That frame is a single-partition
    * window over |distinct scores| rows — the x4 "vocab-sized frame"
    * argument: scores are token counts / ppm ratios with bounded
    * range, NOT row-cardinality, so the frame is KB-scale at any
    * corpus size. A genuinely high-cardinality score (a raw double)
    * should be quantized first (ppm buckets), which is also the
    * statistically honest move. */
  /** X9d — precision/recall threshold sweep: one row per distinct score
    * value s with the confusion counts and exact integer-ppm
    * precision/recall of the rule "predict positive iff score ≥ s".
    * This is THE operational companion to [[aucReport]]: AUC says
    * whether a scorer ranks, the sweep says WHERE to cut it — the
    * question every quality-gate deployment (Gopher rules, LM score,
    * NB posterior) actually asks before filtering a corpus.
    *
    * Same integer discipline and same scale shape as aucReport: one
    * score-grouped map-side-combined shuffle collapses the fact volume
    * to |distinct scores| rows, then one score-DESC cumulative frame
    * (tp/fp are suffix sums from the top) and the totals ride the same
    * window with an unbounded frame — a second pass over the
    * vocab-sized frame, NOT the data. precision_ppm's denominator
    * tp+fp is the count of rows at-or-above the threshold — ≥ 1 at
    * every emitted row by construction; recall_ppm is null on an
    * all-negative input (0/0 honestly reported). */
  def prCurve(rows: DataFrame, scoreCol: Column,
      positiveCol: Column): DataFrame = {
    val byScore = rows
      .select(scoreCol.as("s"),
        when(positiveCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val cum = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byScore
      .withColumn("tp", sum(col("p")).over(cum))
      .withColumn("pred_pos", sum(col("c")).over(cum))
      .withColumn("n_pos", sum(col("p")).over(all))
      .select(col("s"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        expr("tp * 1000000L div pred_pos").as("precision_ppm"),
        when(col("n_pos") > 0,
          expr("tp * 1000000L div n_pos")).as("recall_ppm"))
  }

  def aucReport(rows: DataFrame, scoreCol: Column,
      positiveCol: Column): DataFrame = {
    val byScore = rows
      .select(scoreCol.as("s"),
        when(positiveCol, 1L).otherwise(0L).as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("lt", sum(col("c")).over(w) - col("c"))
      .agg(sum(expr("p * (2L * lt + c + 1L)")).as("r2"),
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        expr("r2 - n_pos * (n_pos + 1L)").as("u2"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("u2 * 1000000L div (2L * n_pos * n_neg)")))
  }

  /** X9f — calibration / reliability table: AUC ([[aucReport]]) says a
    * scorer RANKS well; calibration says its VALUES mean what they
    * claim. Bucket the score into fixed-width bins and compare, per
    * bin, the mean score against the observed positive fraction — the
    * reliability diagram's underlying table, and the input to ECE
    * (expected calibration error: Σ n_i·|mean_i − frac_i| / N, which a
    * consumer computes from these exact columns at the edge).
    *
    * Integer discipline throughout: bin = floor-div of the integer
    * score by `binWidth`; mean score and positive fraction are exact
    * integer-milli/ppm quotients of BIGINT sums — no doubles, so the
    * oracle replays bit-identically. Scale shape: ONE bin-grouped
    * map-side-combined shuffle collapsing the fact volume to |bins|
    * rows; everything downstream is arithmetic on that bounded frame. */
  def calibration(rows: DataFrame, scoreCol: Column, positiveCol: Column,
      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    // FLOOR division, not truncate-toward-zero `div`: floor is the
    // correct binning semantics for a NEGATIVE score (truncation would
    // merge bins −(w−1)..w−1 into bin 0). NOTE the round-15 ADVICE
    // premise was wrong: DuckDB's integer `//` TRUNCATES exactly like
    // Spark's `div` (measured: −7 // 2 = −3) — so the oracle replays
    // this floor with the explicit ((x % y) + y) % y correction (the
    // cuped/modularity discipline), not a bare `//`.
    // (x - pmod(x, y)) div y is exact-integer floor division for
    // positive y — no doubles (the object-level [[floorDiv]]).
    rows
      .select(scoreCol.cast("long").as("s"),
        when(positiveCol, 1L).otherwise(0L).as("y"))
      .withColumn("bin", floorDiv("s", s"${binWidth}L"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("s")).as("sum_s"))
      .select(col("bin"), col("n"), col("n_pos"),
        floorDiv("sum_s * 1000L", "n").as("mean_score_milli"),
        floorDiv("n_pos * 1000000L", "n").as("frac_pos_ppm"))
  }

  /** X9e — [[aucReport]] per group: one AUC row per slice (per source,
    * per language, per model version) — the fairness/debugging cut every
    * eval report needs, since a scorer can rank well in aggregate while
    * failing one slice (Simpson's-paradox territory). Identical doubled-
    * rank integer math; the cumulative frame is PARTITIONED by the
    * group, so unlike the global report nothing funnels through a
    * single partition — the shuffle key is (group, score) for the
    * combine and group for the frame, both bounded-cardinality.
    * Degenerate single-class groups report null, not 0/0. */
  def aucReportBy(rows: DataFrame, scoreCol: Column, positiveCol: Column,
      byCol: String): DataFrame = {
    val byScore = rows
      .select(col(byCol), scoreCol.as("s"),
        when(positiveCol, 1L).otherwise(0L).as("y"))
      .groupBy(col(byCol), col("s"))
      .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
    val w = Window.partitionBy(col(byCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("lt", sum(col("c")).over(w) - col("c"))
      .groupBy(col(byCol))
      .agg(sum(expr("p * (2L * lt + c + 1L)")).as("r2"),
        sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"))
      .select(col(byCol), col("n_pos"), col("n_neg"),
        expr("r2 - n_pos * (n_pos + 1L)").as("u2"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("u2 * 1000000L div (2L * n_pos * n_neg)")))
  }

  /** X9h — the Poisson(1) CDF as 16-bit integer thresholds, computed
    * ONCE driver-side with StrictMath (bit-reproducible — the Benford
    * literal discipline) and spliced into BOTH the Spark plan and the
    * oracle SQL, so no cross-engine libm exp/factorial ever runs:
    * draw d ∈ [0, 65536) replicates a row k times where k is the first
    * bucket with d < t_k. Mass beyond k = 8 (≈ 10⁻⁶) folds into the
    * top bucket. */
  val poissonThresholds: Seq[Long] = {
    val pmf = (0 to 7).scanLeft(StrictMath.exp(-1.0)) {
      (p, k) => p / (k + 1)
    }.take(8) // pmf(k) = e^-1 / k!
    pmf.scanLeft(0.0)(_ + _).drop(1)
      .map(cdf => math.min(65535L, math.floor(cdf * 65536.0).toLong))
  }

  /** X9h — POISSON BOOTSTRAP resample means: the distributed bootstrap
    * (each row is replicated Poisson(1) times per resample,
    * independently of every other row — no with-replacement draw over
    * a global index, so it needs no coordination and is THE bootstrap
    * big-data experimentation systems run). B resample means of an
    * integer-cents metric, from which the consumer reads the CI
    * percentiles. Deterministic: the replication count of row r in
    * resample b is a pure function of md5("r:b") — reproducible across
    * engines/runs, oracle-replayable draw for draw.
    *
    * Exact integers: per resample, n_eff = Σk and sum = Σ c·k are
    * BIGINTs; mean_milli is a FLOOR division (the calibration
    * discipline — (x − pmod(x, y)) div y, which the oracle replays with
    * the explicit ((x % y) + y) % y correction since DuckDB's bare `//`
    * truncates like div; no sign contract needed on the metric). Scale
    * shape: one explode(B) fan-out (a constant ≤ 64×) into a B-row
    * map-side-combined aggregate — no shuffle wider than B rows per
    * partition, metric volume scanned once. */
  def poissonBootstrap(rows: DataFrame, idCol: String,
      valueCents: Column, b: Int): DataFrame = {
    require(b >= 2 && b <= 64, s"B must be in [2, 64], got $b")
    val cases = poissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN draw < ${t}L THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 8L END")
    rows.select(col(idCol).cast("string").as("rid"),
        valueCents.as("cents"))
      .select(col("rid"), col("cents"),
        explode(expr(s"sequence(0L, ${b - 1}L)")).as("b"))
      .withColumn("draw", expr(
        "conv(substring(md5(concat(rid, ':', CAST(b AS STRING))), 1, 4), " +
          "16, 10)").cast("long"))
      .withColumn("k", expr(cases))
      .groupBy(col("b"))
      .agg(sum(col("k")).as("n_eff"),
        sum(col("cents") * col("k")).as("sum_cents"))
      .select(col("b"), col("n_eff"), col("sum_cents"),
        when(col("n_eff") > 0, floorDiv("sum_cents * 1000L", "n_eff"))
          .as("mean_milli"))
  }

  /** Nearest-rank index for quantile q (in ppm) over n items:
    * ceil(q·n) clamped to ≥ 1 — the standard nearest-rank percentile
    * definition, computed driver-side so both engines receive the rank
    * as a literal (no cross-engine ceil). */
  def nearestRank(qPpm: Long, n: Int): Long =
    math.max(1L, (qPpm * n + 999999L) / 1000000L)

  /** X9i — percentile bootstrap confidence interval: the [lo, hi]
    * nearest-rank quantiles (plus the median) of [[poissonBootstrap]]'s
    * B resample means — the actual deliverable an experiment readout
    * quotes ("mean 12.3, 95% CI [11.9, 12.8]"). One row out.
    *
    * Scale: the quantile selection runs over the B-row resample frame —
    * a CONSTANT ≤ 64 rows — so the unpartitioned rank window is a
    * driver-scale no-op, not the single-partition funnel this engine
    * bans on fact frames; all real work is the bootstrap's one
    * map-side-combined aggregate. Ranks are spliced literals
    * ([[nearestRank]]); ties broken by resample id so the selection is
    * total-ordered and oracle-replayable. */
  def bootstrapCi(rows: DataFrame, idCol: String, valueCents: Column,
      b: Int, loPpm: Long = 25000L, hiPpm: Long = 975000L): DataFrame = {
    require(loPpm >= 1L && loPpm < 500000L && 500000L < hiPpm &&
        hiPpm <= 999999L,
      s"CI quantiles must sit in [1, 999999] ppm around the median, " +
        s"got [$loPpm, $hiPpm] — an out-of-range rank would select " +
        "nothing and return a silently-null bound")
    val (rLo, rMed, rHi) =
      (nearestRank(loPpm, b), nearestRank(500000L, b), nearestRank(hiPpm, b))
    poissonBootstrap(rows, idCol, valueCents, b)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("mean_milli"), col("b"))))
      .agg(
        count(lit(1)).as("n_resamples"),
        max(when(col("rnk") === rLo, col("mean_milli"))).as("lo_milli"),
        max(when(col("rnk") === rMed, col("mean_milli"))).as("med_milli"),
        max(when(col("rnk") === rHi, col("mean_milli"))).as("hi_milli"))
  }

  /** X9j — delete-one-group jackknife ("bucket jackknife"): the OTHER
    * standard big-data uncertainty estimator beside the Poisson
    * bootstrap — partition units into G deterministic md5 groups,
    * compute each leave-one-group-out mean, and read the variance of
    * the mean estimator from their spread:
    * v = (G−1)/G · Σ_g (m_g − m̄)². Per-group rows out (grp, n_g,
    * sum_cents, loo_mean_milli) — [[jackknifeVar]] collapses them to
    * the one-row report.
    *
    * Exact integers: group sums are BIGINT; global totals ride an
    * unpartitioned window over the G-row group frame (a constant ≤ 256
    * rows — never the fact volume); each LOO mean is one pinned FLOOR
    * division. Scale shape: ONE unit-grouped map-side-combined shuffle
    * to G rows; the fact volume is scanned once. */
  def jackknife(rows: DataFrame, idCol: String, valueCents: Column,
      g: Int): DataFrame = {
    require(g >= 2 && g <= 256, s"G must be in [2, 256], got $g")
    val grouped = rows
      .select(col(idCol).cast("string").as("rid"), valueCents.as("cents"))
      // first 32 md5 bits of "jk:"-prefixed id, mod G (the Sketch.bucket
      // idiom — unsigned < 2^32, so plain % never goes negative; the
      // prefix decorrelates the grouping from the "0:" arm hash)
      .withColumn("grp", expr(
        s"CAST(conv(substring(md5(concat('jk:', rid)), 1, 8), 16, 10) " +
          s"AS BIGINT) % ${g}L"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(col("cents")).as("sum_cents"))
    val w = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    grouped
      .withColumn("n_all", sum(col("n_g")).over(w))
      .withColumn("s_all", sum(col("sum_cents")).over(w))
      .select(col("grp"), col("n_g"), col("sum_cents"),
        when(col("n_all") > col("n_g"),
          floorDiv("(s_all - sum_cents) * 1000L", "(n_all - n_g)"))
          .as("loo_mean_milli"))
  }

  /** X9j — the jackknife one-row report: n, overall mean, and the
    * delete-one-group variance of the mean in milli² as the exact
    * rational (G−1)·(G·Σm² − (Σm)²) / G² — the expansion of
    * (G−1)/G · Σ(m_g − m̄)², since Σ(m_g − m̄)² = (G·Σm² − (Σm)²)/G —
    * carried in DECIMAL(38,0)
    * (HUGEINT oracle-side, the CUPED discipline) with one pinned FLOOR
    * division at the end. The BIGINT output bound holds unless group
    * means spread over ~10⁹ milli — far beyond any honest metric; a
    * wider spread means the grouping is broken, not the cast.
    * Honesty guards: a null LOO mean (a group holding ALL rows) or an
    * EMPTY group (n_groups < G — the formula's literal G would then
    * overweight the present groups) both null the variance instead of
    * reporting a silently-wrong statistic; with md5 grouping and
    * n ≫ G neither occurs in practice. */
  def jackknifeVar(rows: DataFrame, idCol: String, valueCents: Column,
      g: Int): DataFrame =
    jackknife(rows, idCol, valueCents, g)
      .agg(
        count(lit(1)).as("n_groups"),
        sum(col("n_g")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        sum(when(col("loo_mean_milli").isNull, 1L).otherwise(0L))
          .as("n_null"),
        sum(col("loo_mean_milli").cast("decimal(38,0)")).as("ss"),
        sum(col("loo_mean_milli").cast("decimal(38,0)") *
          col("loo_mean_milli").cast("decimal(38,0)")).as("ss2"))
      .select(
        col("n_groups"), col("n"), col("sum_cents"),
        floorDiv("sum_cents * 1000L", "n").as("mean_milli"),
        when(col("n_null") === 0 && col("n_groups") === g,
          floorDiv(s"($g - 1) * ($g * ss2 - ss * ss)",
            s"(CAST($g AS DECIMAL(38,0)) * $g)"))
          .as("jk_var_milli2"))

  /** X9m — post-stratification adjusted means: re-weight each arm's
    * per-stratum means by the GLOBAL stratum shares, so a stratum
    * imbalance between arms (small-sample noise or a targeting bug)
    * stops masquerading as a treatment effect — the second standard
    * variance-reduction lever beside CUPED (covariates you HAVE at
    * assignment time vs pre-period metrics). Estimator, exact by
    * definition: adj_arm = Σ_s N_s·m_{s,arm} // N with m_{s,arm} the
    * stratum-arm mean ALREADY floored to milli — the per-stratum milli
    * floor is the deterministic contract (the engine-wide integer-milli
    * discipline), not an approximation note: both engines compute the
    * identical value.
    *
    * Scale: one (stratum, arm)-grouped map-side-combined shuffle to
    * |strata|·2 rows; stratum totals ride a stratum-window over that
    * bounded frame; final arm collapse is a 2-row aggregate. */
  def postStratified(rows: DataFrame, idCol: String, strataCol: Column,
      valueCents: Column): DataFrame = {
    val cells = rows
      .select(col(idCol).cast("string").as("rid"), strataCol.as("s"),
        valueCents.as("cents"))
      .withColumn("arm",
        when(Sketch.shardOf(col("rid"), 2) === 0, "a").otherwise("b"))
      .groupBy(col("s"), col("arm"))
      .agg(count(lit(1)).as("n_sa"), sum(col("cents")).as("sum_sa"))
    val wS = Window.partitionBy(col("s"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    cells
      .withColumn("n_s", sum(col("n_sa")).over(wS))
      .withColumn("n", sum(col("n_sa")).over(wAll))
      // stratum-arm mean floored to milli, then share-weighted; both
      // divisions pinned FLOOR (sums are non-negative here only by
      // accident — the pmod form is sign-safe regardless)
      .withColumn("m_sa_milli", floorDiv("sum_sa * 1000L", "n_sa"))
      .groupBy(col("arm"))
      .agg(
        sum(col("n_sa")).as("n_units"),
        sum(col("sum_sa")).as("sum_cents"),
        max(col("n")).as("n_all"),
        // Σ n_s over strata PRESENT in this arm — equals n_all iff every
        // stratum reached both arms; a shortfall means the adjusted mean
        // under-weights the missing strata, exposed, not hidden
        sum(col("n_s")).as("covered_n"),
        sum(col("n_s") * col("m_sa_milli")).as("wsum"))
      .select(col("arm"), col("n_units"), col("covered_n"),
        floorDiv("sum_cents * 1000L", "n_units").as("mean_milli"),
        floorDiv("wsum", "n_all").as("poststrat_mean_milli"))
  }

  /** X9n — difference-in-differences: the pre/post × arm 2×2 of cell
    * means, and DiD = (m_b,post − m_b,pre) − (m_a,post − m_a,pre) — the
    * estimator that nets out both the arms' standing level difference
    * and the shared time trend, the readout for any staged rollout
    * where assignment wasn't randomized per-event. Cell means floored
    * to milli (the deterministic contract); the whole report is one
    * scan + a 1-row conditional aggregate — the abReport shape with a
    * time split riding along (the cuped midpoint discipline: `splitUs`
    * is computed once driver-side and spliced). */
  def diffInDiff(events: DataFrame, unitCol: String, tsCol: String,
      valueCents: Column, splitUs: Long): DataFrame = {
    val tagged = events
      .select(col(unitCol).cast("string").as("unit"),
        expr(s"unix_micros($tsCol)").as("us"), valueCents.as("cents"))
      .withColumn("arm",
        when(Sketch.shardOf(col("unit"), 2) === 0, "a").otherwise("b"))
      .withColumn("post", col("us") >= splitUs)
    def cell(arm: String, post: Boolean, c: Column) =
      sum(when(col("arm") === arm && col("post") === post, c)
        .otherwise(0L))
    def meanMilli(s: String, n: String) =
      when(col(n) > 0, floorDiv(s"$s * 1000L", n))
    tagged.agg(
        cell("a", post = false, lit(1L)).as("n_a_pre"),
        cell("a", post = false, col("cents")).as("s_a_pre"),
        cell("a", post = true, lit(1L)).as("n_a_post"),
        cell("a", post = true, col("cents")).as("s_a_post"),
        cell("b", post = false, lit(1L)).as("n_b_pre"),
        cell("b", post = false, col("cents")).as("s_b_pre"),
        cell("b", post = true, lit(1L)).as("n_b_post"),
        cell("b", post = true, col("cents")).as("s_b_post"))
      .select(
        meanMilli("s_a_pre", "n_a_pre").as("m_a_pre_milli"),
        meanMilli("s_a_post", "n_a_post").as("m_a_post_milli"),
        meanMilli("s_b_pre", "n_b_pre").as("m_b_pre_milli"),
        meanMilli("s_b_post", "n_b_post").as("m_b_post_milli"))
      .withColumn("did_milli",
        (col("m_b_post_milli") - col("m_b_pre_milli")) -
          (col("m_a_post_milli") - col("m_a_pre_milli")))
  }

  /** X9k — sample-ratio-mismatch (SRM) check: the first thing an
    * experiment platform validates before reading ANY metric — do the
    * arm counts match the intended 50/50 split? A skewed ratio means
    * broken assignment/logging and invalidates the readout (Fabijan et
    * al. 2019 — "Diagnosing sample ratio mismatch in online controlled
    * experiments"). For two equal-expectation cells the chi-square
    * collapses to the RATIONAL (n_a − n_b)²/N — exact integer micro
    * units, no libm, no doubles. χ² > 3.84 (micro > 3,841,459) rejects
    * the 50/50 hypothesis at p < 0.05; the flag uses that constant.
    *
    * Scale: one unit-keyed distinct (partial-combining) + a 1-row
    * conditional aggregate — unit volume touched once. */
  def srmCheck(events: DataFrame, keyCol: String): DataFrame =
    events
      .select(col(keyCol).as("unit")).distinct()
      .withColumn("arm",
        when(Sketch.shardOf(col("unit"), 2) === 0, "a").otherwise("b"))
      .agg(
        sum(when(col("arm") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "b", 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        expr("(n_a - n_b) * (n_a - n_b) * 1000000L div (n_a + n_b)")
          .as("srm_chi2_micro"))
      .withColumn("srm_flag", col("srm_chi2_micro") > 3841459L)

  /** X9o — the full experiment READOUT as one DAG: SRM gate,
    * conversion report (rates, lift, chi-square) and the
    * difference-in-differences metric block in a single row — the page
    * an experimentation platform renders per experiment, composed the
    * x9_curation_e2e way but BETTER than naive composition: instead of
    * three separate fact scans ([[srmCheck]] + [[abReport]] +
    * [[diffInDiff]] each rescan events), ONE unit-grouped pass carries
    * every sufficient statistic (conv flag, pre/post event counts and
    * cent sums), and the readout is a single 1-row conditional
    * aggregate over it. Every formula is textually the member
    * operator's (the chi-square double parenthesization is copied
    * verbatim; the cell means use the same pinned floor) — and
    * ExperimentSpec asserts column-for-column equality against the
    * three members, the x7_incr "maintained == direct" contract.
    *
    * Scale: one scan + one unit-keyed partial-combining shuffle +
    * a 1-row exchange; the event volume is touched exactly once. */
  def experimentReadout(events: DataFrame, unitCol: String, tsCol: String,
      typeCol: String, convType: String, valueCents: Column,
      splitUs: Long): DataFrame = {
    val perUnit = events
      .select(col(unitCol).as("unit"),
        expr(s"unix_micros($tsCol)").as("us"),
        col(typeCol).as("t"), valueCents.as("cents"))
      .groupBy(col("unit"))
      .agg(
        max(when(col("t") === convType, 1L).otherwise(0L)).as("conv"),
        sum(when(col("us") < splitUs, 1L).otherwise(0L)).as("n_pre"),
        sum(when(col("us") < splitUs, col("cents")).otherwise(0L))
          .as("s_pre"),
        sum(when(col("us") >= splitUs, 1L).otherwise(0L)).as("n_post"),
        sum(when(col("us") >= splitUs, col("cents")).otherwise(0L))
          .as("s_post"))
      .withColumn("arm",
        when(Sketch.shardOf(col("unit"), 2) === 0, "a").otherwise("b"))
    def a(c: Column) = sum(when(col("arm") === "a", c).otherwise(0L))
    def b(c: Column) = sum(when(col("arm") === "b", c).otherwise(0L))
    def meanMilli(s: String, n: String) =
      when(col(n) > 0, floorDiv(s"$s * 1000L", n))
    perUnit.agg(
        a(lit(1L)).as("n_a"), b(lit(1L)).as("n_b"),
        a(col("conv")).as("conv_a"), b(col("conv")).as("conv_b"),
        a(col("n_pre")).as("n_a_pre"), a(col("s_pre")).as("s_a_pre"),
        a(col("n_post")).as("n_a_post"), a(col("s_post")).as("s_a_post"),
        b(col("n_pre")).as("n_b_pre"), b(col("s_pre")).as("s_b_pre"),
        b(col("n_post")).as("n_b_post"), b(col("s_post")).as("s_b_post"))
      // the SRM gate — [[srmCheck]]'s rational two-cell chi-square
      .withColumn("srm_chi2_micro",
        expr("(n_a - n_b) * (n_a - n_b) * 1000000L div (n_a + n_b)"))
      .withColumn("srm_flag", col("srm_chi2_micro") > 3841459L)
      // the conversion block — [[abReport]]'s exact quotients and its
      // chi-square text VERBATIM (do not re-parenthesize)
      .withColumn("cr_a_ppm", expr("conv_a * 1000000L div n_a"))
      .withColumn("cr_b_ppm", expr("conv_b * 1000000L div n_b"))
      .withColumn("lift_ppm",
        when(col("conv_a") > 0,
          expr("conv_b * n_a * 1000000L div (conv_a * n_b)")))
      .withColumn("chi2_fp", expr(
        "CASE WHEN conv_a + conv_b > 0 " +
          "AND (n_a - conv_a) + (n_b - conv_b) > 0 THEN " +
          "CAST(floor(((CAST(n_a + n_b AS DOUBLE) * " +
          "((CAST(conv_a AS DOUBLE) * (n_b - conv_b) - " +
          "CAST(n_a - conv_a AS DOUBLE) * conv_b) * " +
          "(CAST(conv_a AS DOUBLE) * (n_b - conv_b) - " +
          "CAST(n_a - conv_a AS DOUBLE) * conv_b))) * 10000.0) / " +
          "(((CAST(n_a AS DOUBLE) * n_b) * (conv_a + conv_b)) * " +
          "((n_a - conv_a) + (n_b - conv_b)))) AS BIGINT) END"))
      // the metric block — [[diffInDiff]]'s pinned floor cell means
      .withColumn("m_a_pre_milli", meanMilli("s_a_pre", "n_a_pre"))
      .withColumn("m_a_post_milli", meanMilli("s_a_post", "n_a_post"))
      .withColumn("m_b_pre_milli", meanMilli("s_b_pre", "n_b_pre"))
      .withColumn("m_b_post_milli", meanMilli("s_b_post", "n_b_post"))
      .withColumn("did_milli",
        (col("m_b_post_milli") - col("m_b_pre_milli")) -
          (col("m_a_post_milli") - col("m_a_pre_milli")))
      .select(col("n_a"), col("n_b"), col("srm_chi2_micro"),
        col("srm_flag"), col("conv_a"), col("conv_b"), col("cr_a_ppm"),
        col("cr_b_ppm"), col("lift_ppm"), col("chi2_fp"),
        col("m_a_pre_milli"), col("m_a_post_milli"),
        col("m_b_pre_milli"), col("m_b_post_milli"), col("did_milli"))
  }

  /** X9l — winsorized mean: the robust metric experiment readouts use
    * when a whale order would otherwise own the average — clamp the
    * metric at its p-th percentile, then average. The cut comes from a
    * WIDTH-`bucketCents` HISTOGRAM (the x5_histq sketch shape), so its
    * resolution is the bucket width — the honest 100 TB formulation: an
    * exact global rank selection is a full sort (or a single-partition
    * cumulative window over per-value counts), both banned on fact
    * frames; the bucketed cumulative runs over the BOUNDED bucket frame
    * (value range / width), and a consumer needing a finer cut narrows
    * the width, not the shape.
    *
    * Cut = upper edge of the first bucket whose cumulative count
    * reaches nearest-rank ceil(p·N) — so at least p of the rows are ≤
    * cut by construction. Second pass clamps with the 1-row cut
    * broadcast (the basket-rules total discipline — no driver
    * round-trip, plan stays lazy). Buckets are FLOOR divisions
    * (round-15 review: truncating `div` would double-width bucket 0
    * and mis-edge a negative cut bucket — with floor bucketing a
    * signed metric winsorizes correctly, no sign contract needed).
    * Output: n, cut_cents, mean_milli, win_mean_milli. */
  def winsorizedMean(rows: DataFrame, valueCents: Column, pPpm: Long,
      bucketCents: Long): DataFrame = {
    require(pPpm >= 500000L && pPpm < 1000000L,
      s"p must be in [0.5, 1) ppm, got $pPpm")
    require(bucketCents >= 1, s"bucket width must be >= 1, got $bucketCents")
    val facts = rows.select(valueCents.cast("long").as("cents"))
    val buckets = facts
      .groupBy(floorDiv("cents", s"${bucketCents}L").as("bkt"))
      .agg(count(lit(1)).as("cnt"))
    val wOrd = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // rank = ceil(p·N) in exact integers; cut bucket = first bucket
    // whose running count reaches it. The window frames run over the
    // BOUNDED bucket histogram, never the facts.
    val cut = buckets
      .withColumn("cum", sum(col("cnt")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("rank_needed",
        expr(s"($pPpm * n + 999999L) div 1000000L"))
      .filter(col("cum") >= col("rank_needed"))
      .agg(min(col("bkt")).as("cut_bkt"))
      .select((expr(s"(cut_bkt + 1) * ${bucketCents}L - 1L"))
        .as("cut_cents"))
    facts.crossJoin(broadcast(cut))
      .agg(
        count(lit(1)).as("n"),
        max(col("cut_cents")).as("cut_cents"),
        sum(col("cents")).as("s_raw"),
        sum(least(col("cents"), col("cut_cents"))).as("s_win"))
      .select(col("n"), col("cut_cents"),
        floorDiv("s_raw * 1000L", "n").as("mean_milli"),
        floorDiv("s_win * 1000L", "n").as("win_mean_milli"))
  }

  /** X9g — CUPED variance reduction (Controlled-experiment Using
    * Pre-Experiment Data, Deng et al. 2013): adjust each unit's
    * experiment-period metric Y by its own PRE-period metric X —
    * Y_adj = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X) — so stable
    * between-unit variance (heavy users are heavy in both periods)
    * cancels out of the arm comparison. The industry-standard lever for
    * shrinking A/B confidence intervals without more traffic; the
    * measurement-side sibling of [[abReport]] (same md5-parity arm
    * assignment, same unit-keyed collapse).
    *
    * EXACT-INTEGER discipline: θ is never materialized as a float.
    * With per-unit integer cents x, y and BIGINT sums (n, Σx, Σy, Σxy,
    * Σx²), θ = θnum/θden where θnum = n·Σxy − Σx·Σy and
    * θden = n·Σx² − (Σx)² ≥ 0 (Cauchy–Schwarz), and the adjusted arm
    * mean is the exact rational
    *   mean_adj_v = [n·θden·Σy_v − θnum·(n·Σx_v − n_v·Σx)] / (n_v·n·θden)
    * reported in floored milli-cents. The moment products run in
    * DECIMAL(38,0) (HUGEINT on the oracle side) — n·Σxy brushes 2^63 at
    * realistic volumes — and the one division is an explicit FLOOR
    * division pinned textually on both engines ((a − pmod(a,b)) div b
    * here, the posmod twin in the oracle), because the numerator CAN be
    * negative and truncate-toward-zero would round it the other way.
    *
    * DECLARED ceiling (review finding): the adjusted-mean numerator
    * 10³·n·θden·Σy_v stacks ~n²·per-unit⁴ magnitudes and exceeds even
    * DECIMAL(38,0)/HUGEINT around n ≈ 10⁷ units at dollar scales —
    * both engines fail LOUDLY there (ANSI overflow / HUGEINT error),
    * never silently. Past that population, materialize θ once as a
    * floored θ_micro and adjust with bounded magnitudes — a documented
    * 10⁻⁶-precision tradeoff, traded only when the exact rational
    * physically cannot fit.
    *
    * Scale shape: one unit-keyed partial-combining aggregate collapses
    * the event volume (the only fact shuffle), lazily checkpointed so
    * the global-moment and per-arm branches share one evaluation; the
    * 1-row global frame broadcasts onto the ≤ |arms|-row arm frame.
    * Degenerate var(X) = 0 reports null θ/adjusted means (honest, not
    * 0/0). */
  def cuped(events: DataFrame, unitCol: String, tsCol: String,
      valueCents: Column, splitUs: Long): DataFrame = {
    val perUnit = events
      .select(col(unitCol).as("unit"),
        expr(s"unix_micros($tsCol)").as("us"), valueCents.as("cents"))
      .groupBy(col("unit"))
      .agg(sum(when(col("us") < splitUs, col("cents")).otherwise(0L)).as("x"),
        sum(when(col("us") >= splitUs, col("cents")).otherwise(0L)).as("y"))
      .withColumn("arm",
        when(Sketch.shardOf(col("unit"), 2) === 0, "a").otherwise("b"))
      .localCheckpoint(eager = false)
    val globalM = perUnit.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), col("sx"),
        expr("CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0)) - " +
          "CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))")
          .as("theta_num"),
        expr("CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0)) - " +
          "CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))")
          .as("theta_den"))
    val perArm = perUnit.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_units"), sum(col("x")).as("sx_v"),
        sum(col("y")).as("sy_v"))
    perArm.crossJoin(broadcast(globalM))
      .withColumn("adj_num", expr(
        "1000 * (CAST(n AS DECIMAL(38,0)) * theta_den * CAST(sy_v AS DECIMAL(38,0)) - " +
          "theta_num * (CAST(n AS DECIMAL(38,0)) * CAST(sx_v AS DECIMAL(38,0)) - " +
          "CAST(n_units AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))))"))
      .withColumn("adj_den", expr(
        "CAST(n_units AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) * theta_den"))
      .select(col("arm"), col("n_units"), col("sy_v").as("sum_y_cents"),
        expr("sy_v * 1000L div n_units").as("mean_y_milli"),
        when(col("theta_den") > 0, expr(
          "(adj_num - pmod(adj_num, adj_den)) div adj_den"))
          .as("adj_mean_y_milli"),
        when(col("theta_den") > 0, expr(
          "(1000000 * theta_num - pmod(1000000 * theta_num, theta_den)) " +
            "div theta_den")).as("theta_micro"))
  }
}
