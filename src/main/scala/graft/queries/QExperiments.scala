package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** X9 experiment / eval family.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QExperiments {

  /** X9b — two-arm A/B conversion report with chi-square: arm from
    * md5-bucket parity (reproducible from the id alone), conversion =
    * any purchase; the chi-square double arithmetic is textually
    * identical on both engines. */
  val x9AbTest = QuerySpec("x9_ab_test",
    (s, d) => Experiment.abReport(Tables.events(s, d), "user_id",
        "event_type", "purchase"),
    Some("""-- nonneg-div(3): counts/rank sums only
           |WITH u AS (SELECT user_id,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS conv
           |  FROM events GROUP BY 1),
           |w AS (SELECT CASE WHEN ('0x' || substr(md5('0:' ||
           |      CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
           |    THEN 'a' ELSE 'b' END AS arm, conv FROM u),
           |s AS (SELECT
           |    sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS n_a,
           |    sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END) AS conv_a,
           |    sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS n_b,
           |    sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END) AS conv_b
           |  FROM w)
           |SELECT CAST(n_a AS BIGINT) AS n_a,
           |  CAST(conv_a AS BIGINT) AS conv_a,
           |  CAST(n_b AS BIGINT) AS n_b,
           |  CAST(conv_b AS BIGINT) AS conv_b,
           |  CAST(conv_a * 1000000 // n_a AS BIGINT) AS cr_a_ppm,
           |  CAST(conv_b * 1000000 // n_b AS BIGINT) AS cr_b_ppm,
           |  CASE WHEN conv_a > 0 THEN
           |    CAST(conv_b * n_a * 1000000 // (conv_a * n_b) AS BIGINT)
           |  END AS lift_ppm,
           |  CASE WHEN conv_a + conv_b > 0
           |    AND (n_a - conv_a) + (n_b - conv_b) > 0 THEN
           |    CAST(floor(((CAST(n_a + n_b AS DOUBLE) *
           |    ((CAST(conv_a AS DOUBLE) * (n_b - conv_b) -
           |    CAST(n_a - conv_a AS DOUBLE) * conv_b) *
           |    (CAST(conv_a AS DOUBLE) * (n_b - conv_b) -
           |    CAST(n_a - conv_a AS DOUBLE) * conv_b))) * 10000.0) /
           |    (((CAST(n_a AS DOUBLE) * n_b) * (conv_a + conv_b)) *
           |    ((n_a - conv_a) + (n_b - conv_b)))) AS BIGINT) END
           |    AS chi2_fp
           |FROM s""".stripMargin))


  /** X9c — exact tie-aware AUC (ops/Experiment.aucReport): how well the
    * token-count score ranks the is-English label, doubled-rank integer
    * Mann–Whitney so the heavy tie mass (integer scores) is handled
    * exactly — u2 = 2U₁ and auc_ppm are BIGINTs end to end. One
    * score-grouped shuffle (map-side combined), one vocab-sized
    * cumulative frame, single-row result. */
  val x9Auc = QuerySpec("x9_auc",
    (s, d) => Experiment.aucReport(T(s, d, "documents"),
      size(split(col("text"), " ")).cast("long"), col("lang") === "en"),
    Some("""-- nonneg-div(1): U >= 0 by the rank-sum lower bound
           |WITH r AS (
           |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS s,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM documents),
           |g AS (SELECT s, CAST(count(*) AS BIGINT) AS c,
           |    CAST(sum(y) AS BIGINT) AS p
           |  FROM r GROUP BY 1),
           |w AS (SELECT s, c, p,
           |    CAST(sum(c) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) - c AS BIGINT) AS lt
           |  FROM g),
           |a AS (SELECT CAST(sum(p * (2 * lt + c + 1)) AS BIGINT) AS r2,
           |    CAST(sum(p) AS BIGINT) AS n_pos,
           |    CAST(sum(c - p) AS BIGINT) AS n_neg
           |  FROM w),
           |u AS (SELECT n_pos, n_neg, r2 - n_pos * (n_pos + 1) AS u2
           |  FROM a)
           |SELECT n_pos, n_neg, u2,
           |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
           |    u2 * 1000000 // (2 * n_pos * n_neg) END AS auc_ppm
           |FROM u""".stripMargin))


  /** X9d — precision/recall threshold sweep (ops/Experiment.prCurve):
    * per distinct score s, the confusion counts and integer-ppm
    * precision/recall of "keep iff score ≥ s" — where to CUT the
    * scorer AUC only ranks. Same score-grouped shuffle + vocab-sized
    * DESC cumulative frame as x9_auc. */
  val x9PrCurve = QuerySpec("x9_pr_curve",
    (s, d) => Experiment.prCurve(T(s, d, "documents"),
        size(split(col("text"), " ")).cast("long"), col("lang") === "en")
      .orderBy(col("s").desc),
    Some("""-- nonneg-div(2): counts/rank sums only
           |WITH r AS (
           |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS s,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM documents),
           |g AS (SELECT s, CAST(count(*) AS BIGINT) AS c,
           |    CAST(sum(y) AS BIGINT) AS p
           |  FROM r GROUP BY 1),
           |w AS (SELECT s,
           |    CAST(sum(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
           |    CAST(sum(c) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
           |      PRECEDING AND CURRENT ROW) AS BIGINT) AS pred_pos,
           |    CAST(sum(p) OVER () AS BIGINT) AS n_pos
           |  FROM g)
           |SELECT s, tp, pred_pos - tp AS fp, n_pos - tp AS fn,
           |  tp * 1000000 // pred_pos AS precision_ppm,
           |  CASE WHEN n_pos > 0 THEN tp * 1000000 // n_pos END
           |    AS recall_ppm
           |FROM w ORDER BY s DESC""".stripMargin))


  /** X9e — per-slice AUC (ops/Experiment.aucReportBy): the x9_auc
    * doubled-rank math cut per source — a scorer can rank well in
    * aggregate and fail one slice; the grouped frame is partitioned by
    * source so nothing funnels through a single partition. */
  val x9AucBy = QuerySpec("x9_auc_by",
    (s, d) => Experiment.aucReportBy(T(s, d, "documents"),
        size(split(col("text"), " ")).cast("long"), col("lang") === "en",
        "source")
      .orderBy(col("source")),
    Some("""-- nonneg-div(1): U >= 0 by the rank-sum lower bound
           |WITH r AS (
           |  SELECT source,
           |    CAST(len(string_split(text, ' ')) AS BIGINT) AS s,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM documents),
           |g AS (SELECT source, s, CAST(count(*) AS BIGINT) AS c,
           |    CAST(sum(y) AS BIGINT) AS p
           |  FROM r GROUP BY 1, 2),
           |w AS (SELECT source, s, c, p,
           |    CAST(sum(c) OVER (PARTITION BY source ORDER BY s
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
           |      AS BIGINT) AS lt
           |  FROM g),
           |a AS (SELECT source,
           |    CAST(sum(p * (2 * lt + c + 1)) AS BIGINT) AS r2,
           |    CAST(sum(p) AS BIGINT) AS n_pos,
           |    CAST(sum(c - p) AS BIGINT) AS n_neg
           |  FROM w GROUP BY 1),
           |u AS (SELECT source, n_pos, n_neg,
           |    r2 - n_pos * (n_pos + 1) AS u2
           |  FROM a)
           |SELECT source, n_pos, n_neg, u2,
           |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
           |    u2 * 1000000 // (2 * n_pos * n_neg) END AS auc_ppm
           |FROM u ORDER BY source""".stripMargin))


  /** X3f — two-stage retrieval: quantized (int8) candidate cut at 30,
    * exact re-rank to top-5. The oracle replays BOTH stages — the
    * quantized ranking that defines the candidate boundary and the
    * full-precision re-rank — with the same 6dp rounding + vec_id
    * tie-breaks. */
  /** X9 — the CURATION PIPELINE composed end to end (round 11): the
    * LLM-corpus flagship, mirroring what e2_pipeline is for the
    * reference's REST lane. Four stages as ONE declarative DAG —
    * (1) quality gate (>= 5 tokens), (2) near-dup collapse to the
    * min-doc_id representative per 5-gram min-shingle family (21 real
    * planted families at sf0.01 — the x4_fingerprint recipe), (3)
    * temperature-balanced language resampling (alpha = 0.5, the
    * exact-integer x5_temperature draw, rates computed over the
    * SURVIVORS, as a real pipeline must), (4) 512-token sequence
    * packing per language (the x5_pack window). Every stage is a
    * previously-proven oracle recipe, so the COMPOSITION is judged —
    * each stage's output feeds the next with no materialization
    * boundary, exactly how the engine would run it at 100 TB: narrow
    * projections fused into the scan, one window shuffle per keyed
    * stage, histogram broadcast back, no collect anywhere. */
  val x9Curation = QuerySpec("x9_curation_e2e",
    (s, d) => {
      val docs = T(s, d, "documents")
      val quality = TextOps.withFingerprints(docs, "text")
        .filter(col("n_lt") >= 5)
        .select(col("doc_id"), col("lang"), col("text"), col("minshingle"))
      val reps = quality
        .withColumn("rep",
          min(col("doc_id")).over(Window.partitionBy(col("minshingle"))))
        .filter(col("doc_id") === col("rep"))
        .select(col("doc_id"), col("lang"), col("text"))
      val balanced = Scale.temperatureSample(reps, "doc_id", "lang")
      TextOps.packSequences(balanced, "text", "doc_id", Seq("lang"), 512)
        .select(col("doc_id"), col("lang"), col("n_tok"), col("bin"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (
           |  SELECT doc_id, lang, text,
           |    string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS n
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, lang, text,
           |    list_min(list_transform(range(1, n - 3),
           |      i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |        || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS ms
           |  FROM d WHERE n >= 5),
           |r AS (
           |  SELECT doc_id, lang, text,
           |    min(doc_id) OVER (PARTITION BY ms) AS rep
           |  FROM q),
           |reps AS (SELECT doc_id, lang, text FROM r WHERE doc_id = rep),
           |n AS (SELECT lang, count(*) AS n_l FROM reps GROUP BY lang),
           |m AS (SELECT min(n_l) AS n_min FROM n),
           |bal AS (
           |  SELECT doc_id, lang, text
           |  FROM (SELECT reps.*, n.n_l,
           |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           |        AS hv
           |    FROM reps JOIN n USING (lang)) k, m
           |  WHERE hv * hv * n_l < 4294967296 * m.n_min),
           |p AS (
           |  SELECT doc_id, lang,
           |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
           |    sum(len(string_split(text, ' '))) OVER (
           |      PARTITION BY lang ORDER BY doc_id) AS cum
           |  FROM bal)
           |SELECT doc_id, lang, n_tok,
           |  CAST(floor((cum - n_tok) / 512) AS BIGINT) AS bin
           |FROM p ORDER BY doc_id""".stripMargin),
    bench = true)


  /** X9f — calibration table (ops/Experiment.calibration): token-count
    * score vs is-English label in width-25 bins — mean score and
    * observed positive fraction per bin, the reliability-diagram table
    * AUC (x9_auc) cannot see. One bin-grouped shuffle to |bins| rows. */
  val x9Calibration = QuerySpec("x9_calibration",
    (s, d) => Experiment.calibration(T(s, d, "documents"),
        size(split(col("text"), " ")).cast("long"), col("lang") === "en",
        25L)
      .orderBy(col("bin")),
    Some("""-- nonneg-div(1): counts/rank sums only
           |WITH r AS (
           |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS s,
           |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           |  FROM documents),
           |g AS (SELECT (s - ((s % 25) + 25) % 25) // 25 AS bin,
           |    CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(y) AS BIGINT) AS n_pos,
           |    CAST(sum(s) AS BIGINT) AS sum_s
           |  FROM r GROUP BY 1)
           |SELECT bin, n, n_pos,
           |  (sum_s * 1000 - ((sum_s * 1000 % n) + n) % n) // n
           |    AS mean_score_milli,
           |  n_pos * 1000000 // n AS frac_pos_ppm
           |FROM g ORDER BY bin""".stripMargin))


  /** X9h — Poisson bootstrap resample means
    * (ops/Experiment.poissonBootstrap): 16 deterministic resamples of
    * the order-value metric, each row replicated Poisson(1) times by an
    * md5 draw against StrictMath-derived CDF thresholds. */
  val x9Bootstrap = QuerySpec("x9_bootstrap",
    (s, d) => Experiment.poissonBootstrap(T(s, d, "orders"), "o_orderkey",
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"), 16)
      .orderBy(col("b")),
    Some(s"""-- nonneg-div(0): midpoint epoch and resample counts
           |WITH $bootstrapOracleCtes
            |SELECT b, n_eff, sum_cents, mean_milli
            |FROM m ORDER BY b""".stripMargin),
    bench = true)


  /** X9i — percentile bootstrap CI (ops/Experiment.bootstrapCi): the
    * nearest-rank 2.5%/50%/97.5% quantiles of the 16 resample means —
    * the readout an experiment report quotes. Ranks are spliced
    * literals (Experiment.nearestRank); the selection window runs over
    * the constant 16-row resample frame, never the facts. */
  val x9BootstrapCi = QuerySpec("x9_bootstrap_ci",
    (s, d) => Experiment.bootstrapCi(T(s, d, "orders"), "o_orderkey",
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"), 16),
    Some {
      val (rLo, rMed, rHi) = (Experiment.nearestRank(25000L, 16),
        Experiment.nearestRank(500000L, 16),
        Experiment.nearestRank(975000L, 16))
      s"""-- nonneg-div(0): midpoint epoch and resample counts
         |WITH $bootstrapOracleCtes,
         |rk AS (SELECT b, mean_milli,
         |    row_number() OVER (ORDER BY mean_milli, b) AS rnk FROM m)
         |SELECT CAST(count(*) AS BIGINT) AS n_resamples,
         |  max(CASE WHEN rnk = $rLo THEN mean_milli END) AS lo_milli,
         |  max(CASE WHEN rnk = $rMed THEN mean_milli END) AS med_milli,
         |  max(CASE WHEN rnk = $rHi THEN mean_milli END) AS hi_milli
         |FROM rk""".stripMargin
    })


  /** X9j — delete-one-group jackknife variance
    * (ops/Experiment.jackknifeVar): 16 md5 groups of orders; the
    * spread of the leave-one-group-out means gives the variance of the
    * mean estimator — exact HUGEINT/DECIMAL(38,0) chain, one pinned
    * floor division (the cuped discipline). */
  val x9Jackknife = QuerySpec("x9_jackknife",
    (s, d) => Experiment.jackknifeVar(T(s, d, "orders"), "o_orderkey",
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"), 16),
    Some("""-- nonneg-div(1): G*ss2 - ss^2 >= 0 by Cauchy-Schwarz
           |WITH r AS (
           |  SELECT CAST(o_orderkey AS VARCHAR) AS rid,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           |  FROM orders),
           |g AS (SELECT
           |    ('0x' || substr(md5('jk:' || rid), 1, 8))::BIGINT % 16
           |      AS grp,
           |    CAST(count(*) AS BIGINT) AS n_g,
           |    CAST(sum(cents) AS BIGINT) AS sum_cents
           |  FROM r GROUP BY 1),
           |t AS (SELECT CAST(sum(n_g) AS BIGINT) AS n_all,
           |    CAST(sum(sum_cents) AS BIGINT) AS s_all FROM g),
           |lm AS (SELECT grp, n_g, sum_cents,
           |    CASE WHEN t.n_all > n_g THEN
           |      ((t.s_all - sum_cents) * 1000 -
           |        (((t.s_all - sum_cents) * 1000 % (t.n_all - n_g)) +
           |          (t.n_all - n_g)) % (t.n_all - n_g))
           |        // (t.n_all - n_g) END
           |      AS loo_mean_milli
           |  FROM g, t),
           |a AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
           |    CAST(sum(n_g) AS BIGINT) AS n,
           |    CAST(sum(sum_cents) AS BIGINT) AS sum_cents,
           |    sum(CASE WHEN loo_mean_milli IS NULL THEN 1 ELSE 0 END)
           |      AS n_null,
           |    CAST(sum(CAST(loo_mean_milli AS HUGEINT)) AS HUGEINT) AS ss,
           |    CAST(sum(CAST(loo_mean_milli AS HUGEINT) * loo_mean_milli)
           |      AS HUGEINT) AS ss2
           |  FROM lm)
           |SELECT n_groups, n, sum_cents,
           |  (sum_cents * 1000 - ((sum_cents * 1000 % n) + n) % n) // n
           |    AS mean_milli,
           |  CASE WHEN n_null = 0 AND n_groups = 16 THEN
           |    CAST((15 * (16 * ss2 - ss * ss)) //
           |      (CAST(16 AS HUGEINT) * 16) AS BIGINT) END
           |    AS jk_var_milli2
           |FROM a""".stripMargin),
    bench = false)


  /** X9m — post-stratification adjusted means
    * (ops/Experiment.postStratified): arm means re-weighted by the
    * GLOBAL customer-nation shares — stratum imbalance between md5
    * arms stops reading as a treatment effect. Per-stratum milli floor
    * is the deterministic contract; covered_n exposes any stratum
    * missing from an arm. */
  val x9Poststrat = QuerySpec("x9_poststrat",
    (s, d) => Experiment.postStratified(
        T(s, d, "orders").join(broadcast(T(s, d, "customer")),
          col("o_custkey") === col("c_custkey")),
        "o_orderkey", col("c_nationkey"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .orderBy(col("arm")),
    Some("""-- nonneg-div(0): midpoint epoch and nonneg cell sums
           |WITH r AS (
           |  SELECT CAST(o.o_orderkey AS VARCHAR) AS rid,
           |    c.c_nationkey AS s,
           |    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
           |w AS (SELECT s, cents, CASE WHEN ('0x' ||
           |      substr(md5('0:' || rid), 1, 8))::BIGINT % 2 = 0
           |    THEN 'a' ELSE 'b' END AS arm FROM r),
           |cells AS (SELECT s, arm, CAST(count(*) AS BIGINT) AS n_sa,
           |    CAST(sum(cents) AS BIGINT) AS sum_sa
           |  FROM w GROUP BY 1, 2),
           |t AS (SELECT s, arm, n_sa, sum_sa,
           |    CAST(sum(n_sa) OVER (PARTITION BY s) AS BIGINT) AS n_s,
           |    CAST(sum(n_sa) OVER () AS BIGINT) AS n,
           |    (sum_sa * 1000 - ((sum_sa * 1000 % n_sa) + n_sa) % n_sa)
           |      // n_sa AS m_sa_milli
           |  FROM cells),
           |f AS (SELECT arm, CAST(sum(n_sa) AS BIGINT) AS n_units,
           |    CAST(sum(n_s) AS BIGINT) AS covered_n,
           |    CAST(sum(sum_sa) AS BIGINT) AS sum_c,
           |    CAST(sum(n_s * m_sa_milli) AS BIGINT) AS wsum,
           |    max(n) AS n_all
           |  FROM t GROUP BY arm)
           |SELECT arm, n_units, covered_n,
           |  (sum_c * 1000 - ((sum_c * 1000 % n_units) + n_units)
           |    % n_units) // n_units AS mean_milli,
           |  (wsum - ((wsum % n_all) + n_all) % n_all) // n_all
           |    AS poststrat_mean_milli
           |FROM f ORDER BY arm""".stripMargin))


  /** X9n — difference-in-differences (ops/Experiment.diffInDiff): the
    * pre/post × arm 2×2 of event-value cell means at the cuped
    * midpoint split; DiD nets out the arms' standing level difference
    * and the shared time trend. One scan, one 1-row aggregate. */
  val x9Did = QuerySpec("x9_did",
    (s, d) => {
      val ev = Tables.events(s, d)
      val r = ev.agg(min(expr("unix_micros(ts)")).as("lo"),
        max(expr("unix_micros(ts)")).as("hi")).head
      val split = (r.getLong(0) + r.getLong(1)) / 2
      Experiment.diffInDiff(ev, "user_id", "ts",
        floor(col("value") * 100 + lit(0.5)).cast("long"), split)
    },
    Some("""-- nonneg-div(1): midpoint epoch
           |WITH sp AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
           |    AS s FROM events),
           |r AS (SELECT CAST(user_id AS VARCHAR) AS unit, epoch_us(ts) AS us,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           |  FROM events),
           |w AS (SELECT cents, CASE WHEN ('0x' ||
           |      substr(md5('0:' || unit), 1, 8))::BIGINT % 2 = 0
           |    THEN 'a' ELSE 'b' END AS arm,
           |    us >= (SELECT s FROM sp) AS post FROM r),
           |a AS (SELECT
           |    CAST(sum(CASE WHEN arm = 'a' AND NOT post THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_a_pre,
           |    CAST(sum(CASE WHEN arm = 'a' AND NOT post THEN cents ELSE 0
           |      END) AS BIGINT) AS s_a_pre,
           |    CAST(sum(CASE WHEN arm = 'a' AND post THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_a_post,
           |    CAST(sum(CASE WHEN arm = 'a' AND post THEN cents ELSE 0
           |      END) AS BIGINT) AS s_a_post,
           |    CAST(sum(CASE WHEN arm = 'b' AND NOT post THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_b_pre,
           |    CAST(sum(CASE WHEN arm = 'b' AND NOT post THEN cents ELSE 0
           |      END) AS BIGINT) AS s_b_pre,
           |    CAST(sum(CASE WHEN arm = 'b' AND post THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_b_post,
           |    CAST(sum(CASE WHEN arm = 'b' AND post THEN cents ELSE 0
           |      END) AS BIGINT) AS s_b_post
           |  FROM w),
           |m AS (SELECT
           |    CASE WHEN n_a_pre > 0 THEN (s_a_pre * 1000 -
           |      ((s_a_pre * 1000 % n_a_pre) + n_a_pre) % n_a_pre)
           |      // n_a_pre END AS m_a_pre_milli,
           |    CASE WHEN n_a_post > 0 THEN (s_a_post * 1000 -
           |      ((s_a_post * 1000 % n_a_post) + n_a_post) % n_a_post)
           |      // n_a_post END AS m_a_post_milli,
           |    CASE WHEN n_b_pre > 0 THEN (s_b_pre * 1000 -
           |      ((s_b_pre * 1000 % n_b_pre) + n_b_pre) % n_b_pre)
           |      // n_b_pre END AS m_b_pre_milli,
           |    CASE WHEN n_b_post > 0 THEN (s_b_post * 1000 -
           |      ((s_b_post * 1000 % n_b_post) + n_b_post) % n_b_post)
           |      // n_b_post END AS m_b_post_milli
           |  FROM a)
           |SELECT m_a_pre_milli, m_a_post_milli, m_b_pre_milli,
           |  m_b_post_milli,
           |  (m_b_post_milli - m_b_pre_milli) -
           |    (m_a_post_milli - m_a_pre_milli) AS did_milli
           |FROM m""".stripMargin))


  /** X9o — the full experiment readout as ONE DAG
    * (ops/Experiment.experimentReadout): SRM gate + conversion report +
    * DiD metric block in a single row from a single unit-grouped fact
    * pass — the per-experiment page an experimentation platform
    * renders. Every formula is the member operator's verbatim;
    * ExperimentSpec pins column-for-column equality to the members. */
  val x9ReadoutE2e = QuerySpec("x9_readout_e2e",
    (s, d) => {
      val ev = Tables.events(s, d)
      val r = ev.agg(min(expr("unix_micros(ts)")).as("lo"),
        max(expr("unix_micros(ts)")).as("hi")).head
      val split = (r.getLong(0) + r.getLong(1)) / 2
      Experiment.experimentReadout(ev, "user_id", "ts", "event_type",
        "purchase", floor(col("value") * 100 + lit(0.5)).cast("long"),
        split)
    },
    Some("""-- nonneg-div(5): counts and squared count diffs
           |WITH sp AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
           |    AS s FROM events),
           |pu AS (SELECT user_id AS unit,
           |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |      AS conv,
           |    CAST(sum(CASE WHEN epoch_us(ts) < (SELECT s FROM sp)
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
           |    CAST(sum(CASE WHEN epoch_us(ts) < (SELECT s FROM sp)
           |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
           |      AS BIGINT) AS s_pre,
           |    CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT s FROM sp)
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
           |    CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT s FROM sp)
           |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
           |      AS BIGINT) AS s_post
           |  FROM events GROUP BY 1),
           |w AS (SELECT *, CASE WHEN ('0x' || substr(md5('0:' ||
           |      CAST(unit AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
           |    THEN 'a' ELSE 'b' END AS arm FROM pu),
           |g AS (SELECT
           |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_a,
           |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_b,
           |    CAST(sum(CASE WHEN arm = 'a' THEN conv ELSE 0 END)
           |      AS BIGINT) AS conv_a,
           |    CAST(sum(CASE WHEN arm = 'b' THEN conv ELSE 0 END)
           |      AS BIGINT) AS conv_b,
           |    CAST(sum(CASE WHEN arm = 'a' THEN n_pre ELSE 0 END)
           |      AS BIGINT) AS n_a_pre,
           |    CAST(sum(CASE WHEN arm = 'a' THEN s_pre ELSE 0 END)
           |      AS BIGINT) AS s_a_pre,
           |    CAST(sum(CASE WHEN arm = 'a' THEN n_post ELSE 0 END)
           |      AS BIGINT) AS n_a_post,
           |    CAST(sum(CASE WHEN arm = 'a' THEN s_post ELSE 0 END)
           |      AS BIGINT) AS s_a_post,
           |    CAST(sum(CASE WHEN arm = 'b' THEN n_pre ELSE 0 END)
           |      AS BIGINT) AS n_b_pre,
           |    CAST(sum(CASE WHEN arm = 'b' THEN s_pre ELSE 0 END)
           |      AS BIGINT) AS s_b_pre,
           |    CAST(sum(CASE WHEN arm = 'b' THEN n_post ELSE 0 END)
           |      AS BIGINT) AS n_b_post,
           |    CAST(sum(CASE WHEN arm = 'b' THEN s_post ELSE 0 END)
           |      AS BIGINT) AS s_b_post
           |  FROM w),
           |m AS (SELECT *,
           |    (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
           |      AS srm_chi2_micro,
           |    conv_a * 1000000 // n_a AS cr_a_ppm,
           |    conv_b * 1000000 // n_b AS cr_b_ppm,
           |    CASE WHEN conv_a > 0 THEN
           |      conv_b * n_a * 1000000 // (conv_a * n_b) END AS lift_ppm,
           |    CASE WHEN conv_a + conv_b > 0
           |      AND (n_a - conv_a) + (n_b - conv_b) > 0 THEN
           |      CAST(floor(((CAST(n_a + n_b AS DOUBLE) *
           |      ((CAST(conv_a AS DOUBLE) * (n_b - conv_b) -
           |      CAST(n_a - conv_a AS DOUBLE) * conv_b) *
           |      (CAST(conv_a AS DOUBLE) * (n_b - conv_b) -
           |      CAST(n_a - conv_a AS DOUBLE) * conv_b))) * 10000.0) /
           |      (((CAST(n_a AS DOUBLE) * n_b) * (conv_a + conv_b)) *
           |      ((n_a - conv_a) + (n_b - conv_b)))) AS BIGINT) END
           |      AS chi2_fp,
           |    CASE WHEN n_a_pre > 0 THEN (s_a_pre * 1000 -
           |      ((s_a_pre * 1000 % n_a_pre) + n_a_pre) % n_a_pre)
           |      // n_a_pre END AS m_a_pre_milli,
           |    CASE WHEN n_a_post > 0 THEN (s_a_post * 1000 -
           |      ((s_a_post * 1000 % n_a_post) + n_a_post) % n_a_post)
           |      // n_a_post END AS m_a_post_milli,
           |    CASE WHEN n_b_pre > 0 THEN (s_b_pre * 1000 -
           |      ((s_b_pre * 1000 % n_b_pre) + n_b_pre) % n_b_pre)
           |      // n_b_pre END AS m_b_pre_milli,
           |    CASE WHEN n_b_post > 0 THEN (s_b_post * 1000 -
           |      ((s_b_post * 1000 % n_b_post) + n_b_post) % n_b_post)
           |      // n_b_post END AS m_b_post_milli
           |  FROM g)
           |SELECT n_a, n_b, srm_chi2_micro,
           |  srm_chi2_micro > 3841459 AS srm_flag,
           |  conv_a, conv_b, cr_a_ppm, cr_b_ppm, lift_ppm, chi2_fp,
           |  m_a_pre_milli, m_a_post_milli, m_b_pre_milli,
           |  m_b_post_milli,
           |  (m_b_post_milli - m_b_pre_milli) -
           |    (m_a_post_milli - m_a_pre_milli) AS did_milli
           |FROM m""".stripMargin),
    bench = false)


  /** X9k — sample-ratio-mismatch check (ops/Experiment.srmCheck): do
    * the md5-parity arm counts over distinct event users match 50/50?
    * The rational two-cell chi-square (n_a−n_b)²/N in exact micro
    * units; > 3.84 (p < 0.05) flags broken assignment. */
  val x9Srm = QuerySpec("x9_srm",
    (s, d) => Experiment.srmCheck(Tables.events(s, d), "user_id"),
    Some("""-- nonneg-div(2): squared count diffs
           |WITH u AS (SELECT DISTINCT user_id AS unit FROM events),
           |w AS (SELECT CASE WHEN ('0x' ||
           |      substr(md5('0:' || CAST(unit AS VARCHAR)), 1, 8))
           |      ::BIGINT % 2 = 0 THEN 'a' ELSE 'b' END AS arm FROM u),
           |a AS (SELECT
           |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_a,
           |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_b
           |  FROM w)
           |SELECT n_a, n_b,
           |  (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
           |    AS srm_chi2_micro,
           |  (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b) > 3841459
           |    AS srm_flag
           |FROM a""".stripMargin))


  /** X9l — winsorized mean (ops/Experiment.winsorizedMean): order value
    * clamped at the bucketed-histogram p99 cut ($100 buckets), then
    * averaged — the robust metric beside the raw mean. The cumulative
    * window runs over the bounded bucket frame (the x5_histq shape),
    * never the facts; the cut rides a 1-row broadcast into the clamp
    * pass. */
  val x9Winsorized = QuerySpec("x9_winsorized",
    (s, d) => Experiment.winsorizedMean(T(s, d, "orders"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"),
        990000L, 10000L),
    Some("""-- nonneg-div(1): ceil numerator and rank cut
           |WITH r AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |    AS cents FROM orders),
           |h AS (SELECT (cents - ((cents % 10000) + 10000) % 10000) // 10000
           |      AS bkt,
           |    CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY 1),
           |c AS (SELECT bkt,
           |    CAST(sum(cnt) OVER (ORDER BY bkt) AS BIGINT) AS cum,
           |    CAST(sum(cnt) OVER () AS BIGINT) AS n FROM h),
           |k AS (SELECT min(bkt) AS cut_bkt FROM c
           |  WHERE cum >= (990000 * n + 999999) // 1000000),
           |x AS (SELECT (cut_bkt + 1) * 10000 - 1 AS cut_cents FROM k)
           |SELECT CAST(count(*) AS BIGINT) AS n,
           |  max(x.cut_cents) AS cut_cents,
           |  (CAST(sum(cents) AS BIGINT) * 1000 -
           |    ((CAST(sum(cents) AS BIGINT) * 1000 % count(*)) + count(*))
           |    % count(*)) // count(*) AS mean_milli,
           |  (CAST(sum(least(cents, x.cut_cents)) AS BIGINT) * 1000 -
           |    ((CAST(sum(least(cents, x.cut_cents)) AS BIGINT) * 1000
           |      % count(*)) + count(*)) % count(*)) // count(*)
           |    AS win_mean_milli
           |FROM r, x""".stripMargin),
    bench = false)


  /** X9g — CUPED variance reduction (ops/Experiment.cuped): pre-period
    * spend adjusts experiment-period spend per md5-parity arm; θ and
    * the adjusted means are exact rationals in DECIMAL(38,0)/HUGEINT
    * with one pinned FLOOR division at the milli edge. The split point
    * is the (min+max)/2 midpoint of the event time range — computed
    * once driver-side here and replayed as a scalar subquery by the
    * oracle. */
  val x9Cuped = QuerySpec("x9_cuped",
    (s, d) => {
      val ev = Tables.events(s, d)
      val r = ev.agg(min(expr("unix_micros(ts)")).as("lo"),
        max(expr("unix_micros(ts)")).as("hi")).head
      val split = (r.getLong(0) + r.getLong(1)) / 2
      Experiment.cuped(ev, "user_id", "ts",
          floor(col("value") * 100 + lit(0.5)).cast("long"), split)
        .orderBy(col("arm"))
    },
    Some("""-- nonneg-div(2): midpoint epoch; nonneg fixture cents sums
           |WITH sp AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
           |    AS s FROM events),
           |u AS (SELECT user_id AS unit,
           |    CAST(sum(CASE WHEN epoch_us(ts) < (SELECT s FROM sp)
           |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
           |      ELSE 0 END) AS BIGINT) AS x,
           |    CAST(sum(CASE WHEN epoch_us(ts) >= (SELECT s FROM sp)
           |      THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
           |      ELSE 0 END) AS BIGINT) AS y
           |  FROM events GROUP BY 1),
           |w AS (SELECT *, CASE WHEN ('0x' || substr(md5('0:' ||
           |      CAST(unit AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
           |    THEN 'a' ELSE 'b' END AS arm FROM u),
           |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
           |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
           |  FROM w),
           |t AS (SELECT n, sx, n * sxy - sx * sy AS tn,
           |    n * sxx - sx * sx AS td FROM g),
           |a AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n_v,
           |    CAST(sum(x) AS HUGEINT) AS sx_v,
           |    CAST(sum(y) AS HUGEINT) AS sy_v
           |  FROM w GROUP BY 1),
           |j AS (SELECT arm, n_v, sx_v, sy_v, n, sx, tn, td,
           |    1000 * (n * td * sy_v - tn * (n * sx_v - n_v * sx)) AS an,
           |    n_v * n * td AS ad
           |  FROM a, t)
           |SELECT arm, CAST(n_v AS BIGINT) AS n_units,
           |  CAST(sy_v AS BIGINT) AS sum_y_cents,
           |  CAST(sy_v * 1000 // n_v AS BIGINT) AS mean_y_milli,
           |  CASE WHEN td > 0 THEN
           |    CAST((an - ((an % ad) + ad) % ad) // ad AS BIGINT) END
           |    AS adj_mean_y_milli,
           |  CASE WHEN td > 0 THEN
           |    CAST((1000000 * tn - ((1000000 * tn % td) + td) % td) // td
           |      AS BIGINT) END AS theta_micro
           |FROM j ORDER BY arm""".stripMargin))
}
