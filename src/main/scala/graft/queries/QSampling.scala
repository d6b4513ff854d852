package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** X5 sampling / sketch family: samplers, CMS, HLL, KMV, heavy hitters, histograms, Bloom.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QSampling {

  /** X5o — LEAKAGE-FREE SPLIT (round 14): the near-dup-aware train/val/
    * test assignment — the split draw hashes the duplicate-component id,
    * so near-dup pairs can never straddle train/test (the in-corpus twin
    * of x4_decontaminate's eval-set guard). The oracle rebuilds the
    * whole chain: minhash → LSH pairs → recursive closure → md5-prefix
    * threshold on the CLUSTER id (80% → 0xcccd, 90% → 0xe666 — the
    * round(pct·65536/100) thresholds leakFreeSplit derives). Hash-match
    * proves both the component inheritance AND the draw. */
  val x5SplitLeakfree = QuerySpec("x5_split_leakfree",
    (s, d) => {
      val docs = T(s, d, "documents")
      val pairs = Dedup.lshCandidates(
        Dedup.minhash(docs, "text", "doc_id"), "doc_id")
      // componentsStar (round 15): identical min-reachable-id contract
      // (oracle unchanged) — the split's component id now comes from the
      // logarithmic-round resolver the e2e pipelines use
      Scale.leakFreeSplit(Dedup.componentsStar(docs, pairs, "doc_id"),
          "cluster", 80, 10)
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(componentsOracleCte +
      """
        |SELECT dd.doc_id,
        |  coalesce(c.cluster, dd.doc_id) AS cluster,
        |  CASE WHEN substr(md5('leak:' ||
        |      CAST(coalesce(c.cluster, dd.doc_id) AS VARCHAR)), 1, 4)
        |      < 'cccd' THEN 'train'
        |    WHEN substr(md5('leak:' ||
        |      CAST(coalesce(c.cluster, dd.doc_id) AS VARCHAR)), 1, 4)
        |      < 'e666' THEN 'val'
        |    ELSE 'test' END AS split
        |FROM documents dd LEFT JOIN comp c ON c.id = dd.doc_id
        |ORDER BY dd.doc_id""".stripMargin))


  /** X5n — exact heavy hitters through a Misra–Gries candidate pass
    * (round 14): every token with count·(k+1) > N over the corpus token
    * stream, k = 32. The per-partition MG summaries (mapPartitions, k
    * counters) guarantee a candidate SUPERSET of every true heavy hitter
    * — summed MG loss is ≤ N/(k+1) — and the exact broadcast-semi-join
    * recount plus the exact integer threshold make the final rows
    * partitioning-independent, which is what lets an approximate-sketch
    * lane be hash-judged: the oracle computes the same answer the naive
    * way (full-vocabulary groupBy), the engine never shuffles more than
    * k·partitions candidate values. */
  val x5HeavyHitters = QuerySpec("x5_heavy_hitters",
    (s, d) => Sketch.heavyHitters(
        T(s, d, "documents").select(
          explode(split(lower(col("text")), " ")).as("tok")),
        "tok", k = 32)
      .orderBy(col("value")),
    Some("""WITH t AS (
           |  SELECT unnest(string_split(lower(text), ' ')) AS value
           |  FROM documents),
           |n AS (SELECT count(*) AS n FROM t)
           |SELECT value, CAST(count(*) AS BIGINT) AS cnt
           |FROM t, n
           |GROUP BY value, n.n
           |HAVING count(*) * 33 > n.n
           |ORDER BY value""".stripMargin),
    bench = true)


  /** X5p — PER-GROUP heavy hitters (round 14): tokens exceeding 1/33 of
    * their LANGUAGE's token stream — the per-language top-token report a
    * multilingual corpus needs (a token hot in a small language is
    * invisible to the global x5_heavy_hitters stream). Same
    * candidates-only shuffle argument, per (partition, group) MG maps;
    * the exact (group, value) recount makes the result
    * partitioning-independent — the oracle recounts directly. */
  val x5HeavyHittersBy = QuerySpec("x5_heavy_hitters_by",
    (s, d) => Sketch.heavyHittersBy(
        T(s, d, "documents").select(col("lang"),
          explode(split(lower(col("text")), " ")).as("tok")),
        "tok", "lang", k = 32)
      .orderBy(col("grp"), col("value")),
    Some("""WITH t AS (
           |  SELECT lang AS grp,
           |    unnest(string_split(lower(text), ' ')) AS value
           |  FROM documents),
           |n AS (SELECT grp, count(*) AS n FROM t GROUP BY grp)
           |SELECT t.grp AS grp, value, CAST(count(*) AS BIGINT) AS cnt
           |FROM t JOIN n ON n.grp = t.grp
           |GROUP BY t.grp, value, n.n
           |HAVING count(*) * 33 > n.n
           |ORDER BY t.grp, value""".stripMargin))


  /** X5 — deterministic portable hash sampling (train/val splits): the
    * md5-prefix threshold reproduces bit-identically in any engine. */
  val x5Sample = QuerySpec("x5_sample",
    (s, d) => Scale.hashSample(T(s, d, "documents"), "doc_id", 0.125)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang, source FROM documents
           |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '2000'
           |ORDER BY doc_id""".stripMargin))


  /** X5c — stratified deterministic sampling: per-source keep rates (the
    * "downsample noisy sources" corpus op), reproduced exactly by the
    * oracle's CASE over the same md5 prefixes. */
  val x5SampleBy = QuerySpec("x5_sample_by",
    (s, d) => Scale.hashSampleBy(T(s, d, "documents"), "doc_id", "source",
        Map("src0" -> 0.125, "src1" -> 0.5), defaultRate = 0.25)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang, source FROM documents
           |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
           |  CASE source WHEN 'src0' THEN '2000' WHEN 'src1' THEN '8000'
           |    ELSE '4000' END
           |ORDER BY doc_id""".stripMargin))


  /** X5q — deterministic EXACT-k per-group sample (round 15): exactly
    * 20 docs per language — the eval-set drawing primitive where the
    * threshold samplers only hit k in expectation. The draw is the
    * salted-md5 permutation (id tie-break), so the oracle replays WHICH
    * docs win, not just the count. */
  val x5ExactK = QuerySpec("x5_exact_k",
    (s, d) => Scale.exactKSample(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          col("n_chars")),
        "doc_id", "lang", 20)
      .orderBy(col("doc_id")),
    Some("""WITH r AS (
           |  SELECT doc_id, lang, n_chars,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY md5('xk:' || CAST(doc_id AS VARCHAR)), doc_id)
           |      AS rk
           |  FROM documents)
           |SELECT doc_id, lang, n_chars FROM r WHERE rk <= 20
           |ORDER BY doc_id""".stripMargin))


  /** X5g — temperature-scaled multilingual resampling (round 11): the
    * corpus-balancing alpha-sampling of multilingual pretraining — keep
    * stratum l at rate sqrt(n_min/n_l) (alpha = 0.5), so the head
    * language (en, 218 docs at this sf) is sqrt-compressed toward the
    * rarest (fr, 64) while fr itself is kept whole. The keep rule is the
    * exact-integer form `h² · n_l < 65536² · n_min` over the md5 16-bit
    * uniform — no float pow/sqrt — which is what lets the oracle replay
    * the DRAW (which docs), not just the rates. Histogram = one tiny
    * partial-agg shuffle broadcast back; the filter is map-side. */
  val x5Temperature = QuerySpec("x5_temperature",
    (s, d) => Scale.temperatureSample(T(s, d, "documents"), "doc_id", "lang")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id")),
    Some("""WITH n AS (SELECT lang, count(*) AS n_l FROM documents
           |  GROUP BY lang),
           |m AS (SELECT min(n_l) AS n_min FROM n),
           |h AS (SELECT doc_id, lang, source,
           |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
           |      AS hv
           |  FROM documents)
           |SELECT doc_id, lang, source
           |FROM h JOIN n USING (lang), m
           |WHERE hv * hv * n.n_l < 4294967296 * m.n_min
           |ORDER BY doc_id""".stripMargin))


  /** X5b — per-shard sequence packing (contiguous ~512-token bins in
    * doc_id order within each lang). */
  val x5Pack = QuerySpec("x5_pack",
    (s, d) => TextOps.packSequences(T(s, d, "documents"), "text", "doc_id",
        Seq("lang"), 512)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("bin"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang, CAST(n_tok AS INT) AS n_tok,
           |  CAST(floor((cum - n_tok) / 512) AS BIGINT) AS bin
           |FROM (
           |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok,
           |    sum(len(string_split(text, ' '))) OVER (
           |      PARTITION BY lang ORDER BY doc_id) AS cum
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin))


  /** X5e — count-min sketch over the corpus vocabulary (round 11): build
    * a sketch from the token stream, then point-estimate every distinct
    * token against it, alongside the exact count so the overcount-only
    * guarantee (est >= exact, always) is visible in the judged rows. The
    * md5-derived bucket hashing makes the ENTIRE sketch — cell counters
    * included — bit-replayable in DuckDB, so this is an oracle-checked
    * sketch, not a rows-only one like HLL (whose cell layout is
    * engine-defined). The sketch is sized 2×16 BELOW this corpus's
    * 31-token vocabulary on purpose: the driver corpus is frequency-flat
    * (every token ≈ 880 occurrences), so only a cramped sketch makes the
    * collision overcounts the judge should see nonzero; production sizes
    * w ≈ e/eps against the true key cardinality, and the build cost does
    * not change shape — the groupBy key space is d×w, so partial agg
    * bounds the shuffle at d×w rows per partition regardless of corpus
    * size, and the probe side broadcasts the sketch. */
  val x5Cms = QuerySpec("x5_cms_estimate",
    (s, d) => {
      val toks = T(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val cms = Sketch.cmsBuild(toks, "tok", 2, 16)
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      Sketch.cmsEstimate(cms, toks.distinct(), "tok", 2, 16)
        .join(exact, Seq("tok"))
        .select(col("tok"), col("est"), col("exact"))
        .orderBy(col("tok"))
    },
    Some("""WITH toks AS (
           |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
           |rws AS (SELECT unnest(range(0, 2)) AS r),
           |cells AS (
           |  SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok),
           |      1, 8))::BIGINT % 16 AS b,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM toks, rws GROUP BY r, b),
           |probes AS (SELECT DISTINCT tok FROM toks),
           |fan AS (
           |  SELECT p.tok, rws.r,
           |    ('0x' || substr(md5(CAST(rws.r AS VARCHAR) || ':' || p.tok),
           |      1, 8))::BIGINT % 16 AS b
           |  FROM probes p, rws),
           |est AS (
           |  SELECT f.tok, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
           |  FROM fan f LEFT JOIN cells c ON c.r = f.r AND c.b = f.b
           |  GROUP BY f.tok),
           |exact AS (
           |  SELECT tok, CAST(count(*) AS BIGINT) AS exact
           |  FROM toks GROUP BY tok)
           |SELECT e.tok, e.est, x.exact
           |FROM est e JOIN exact x USING (tok)
           |ORDER BY tok""".stripMargin),
    bench = true)


  /** X5d — weighted sampling without replacement (round 11): 64 docs
    * drawn with probability proportional to token count, the "spend the
    * token budget where the tokens are" sampling a curriculum builder
    * uses. Integer ticket-min race (see [[Sketch.weightedSample]]): no
    * log/pow in the key, so the draw — not just the mechanism — replays
    * bit-identically in the oracle. */
  val x5Weighted = QuerySpec("x5_weighted",
    (s, d) => Sketch.weightedSample(
        T(s, d, "documents").select(col("doc_id"),
          size(split(col("text"), " ")).as("n_tok")),
        "doc_id", "n_tok", 64)
      .orderBy(col("sample_key"), col("doc_id")),
    Some("""WITH d AS (
           |  SELECT doc_id,
           |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok
           |  FROM documents),
           |t AS (
           |  SELECT doc_id, n_tok, unnest(range(1, n_tok + 1)) AS tick
           |  FROM d),
           |r AS (
           |  SELECT doc_id, n_tok,
           |    min(md5(CAST(doc_id AS VARCHAR) || ':' ||
           |      CAST(tick AS VARCHAR))) AS sample_key
           |  FROM t GROUP BY doc_id, n_tok)
           |SELECT doc_id, n_tok, sample_key FROM r
           |ORDER BY sample_key, doc_id LIMIT 64""".stripMargin),
    bench = true)


  /** X5j — per-group weighted sampling (round 13): the x5_weighted race
    * within each language — Sketch.weightedSampleBy. Deterministic
    * integer tickets, rank window per stratum; the oracle replays the
    * identical race and rank. */
  val x5WeightedBy = QuerySpec("x5_weighted_by",
    (s, d) => Sketch.weightedSampleBy(
        T(s, d, "documents").select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("n_tok")),
        "doc_id", "n_tok", "lang", 8)
      .orderBy(col("lang"), col("sample_key"), col("doc_id")),
    Some("""WITH d AS (
           |  SELECT doc_id, lang,
           |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok
           |  FROM documents),
           |t AS (
           |  SELECT doc_id, lang, n_tok,
           |    unnest(range(1, n_tok + 1)) AS tick
           |  FROM d),
           |r AS (
           |  SELECT lang, doc_id, n_tok,
           |    min(md5(CAST(doc_id AS VARCHAR) || ':' ||
           |      CAST(tick AS VARCHAR))) AS sample_key
           |  FROM t GROUP BY lang, doc_id, n_tok),
           |rk AS (
           |  SELECT *, row_number() OVER (PARTITION BY lang
           |    ORDER BY sample_key, doc_id) AS rn
           |  FROM r)
           |SELECT lang, doc_id, n_tok, sample_key FROM rk
           |WHERE rn <= 8 ORDER BY lang, sample_key, doc_id""".stripMargin))


  /** X5h — histogram-quantile estimate (round 11): the mergeable
    * equi-width histogram answers quantiles from one pass + nBins
    * counters — the distributed alternative to the exact percentile's
    * sort-the-world semantics — with est and exact side by side like
    * x5_cms_estimate, so the one-bin-width error bound is visible in
    * the judged rows. The whole chain (exact bounds, bin floor
    * arithmetic, cumulative pick, linear interpolation) replays in
    * DuckDB because the expression shapes are pinned: width computed
    * first then one divide, 6dp rounding only at the end. */
  val x5HistQ = QuerySpec("x5_histq",
    (s, d) => {
      val v = T(s, d, "orders").select(col("o_totalprice"))
      val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
      val est = Sketch.histQuantile(
        Sketch.histBuild(v, "o_totalprice", 32), 32, qs)
      val ex = v.select(col("o_totalprice").cast("double").as("x"))
        .agg(expr("percentile(x, array(0.25D, 0.5D, 0.75D, 0.9D, 0.99D))")
          .as("es"))
        .select(posexplode(col("es")).as(Seq("i", "e")))
        .select(element_at(array(qs.map(lit): _*), col("i").cast("int") + 1)
          .as("q"), round(col("e"), 6).as("q_exact"))
      est.join(ex, "q").orderBy(col("q"))
    },
    Some("""WITH v AS (SELECT o_totalprice::DOUBLE AS x FROM orders),
           |b AS (SELECT min(x) AS lo, max(x) AS hi FROM v),
           |h AS (
           |  SELECT greatest(0, least(31,
           |      CAST(floor((x - lo) / ((hi - lo) / 32)) AS INT))) AS bin,
           |    count(*) AS cnt, min(lo) AS lo, min(hi) AS hi
           |  FROM v, b GROUP BY 1),
           |c AS (
           |  SELECT bin, cnt, lo, hi,
           |    sum(cnt) OVER (ORDER BY bin) AS cum,
           |    sum(cnt) OVER (ORDER BY bin) - cnt AS below,
           |    sum(cnt) OVER () AS n
           |  FROM h),
           |qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q),
           |pick AS (
           |  SELECT q, min(bin) AS bin FROM qs JOIN c ON c.cum >= q * c.n
           |  GROUP BY q),
           |ex AS (SELECT
           |    round(percentile_cont(0.25) WITHIN GROUP (ORDER BY x), 6) AS e1,
           |    round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY x), 6) AS e2,
           |    round(percentile_cont(0.75) WITHIN GROUP (ORDER BY x), 6) AS e3,
           |    round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY x), 6) AS e4,
           |    round(percentile_cont(0.99) WITHIN GROUP (ORDER BY x), 6) AS e5
           |  FROM v),
           |exl AS (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
           |    unnest([e1, e2, e3, e4, e5]) AS q_exact FROM ex)
           |SELECT p.q,
           |  round(c.lo + ((c.hi - c.lo) / 32) * (p.bin
           |    + (p.q * c.n - c.below) / c.cnt), 6) AS q_est,
           |  exl.q_exact
           |FROM pick p JOIN c ON c.bin = p.bin JOIN exl ON exl.q = p.q
           |ORDER BY p.q""".stripMargin))


  /** X5h' — GROUPED histogram quantiles (round 11): per-event-type
    * distribution sketches answering p50/p90/p99 — the serving-layer
    * "latency percentiles per endpoint" shape — with exact percentiles
    * alongside (the a5 recipe) so the error bound is visible per group.
    * Shuffle key space is |groups|×nBins; the rank windows partition by
    * group, so serving parallelizes across groups. */
  val x5HistQBy = QuerySpec("x5_histq_by",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val qs = Seq(0.5, 0.9, 0.99)
      val est = Sketch.histQuantileBy(
        Sketch.histBuildBy(ev, "value", "event_type", 32),
        "event_type", 32, qs)
      val ex = ev.select(col("event_type"), col("value").cast("double").as("x"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(x, array(0.5D, 0.9D, 0.99D))").as("es"))
        .select(col("event_type"), posexplode(col("es")).as(Seq("i", "e")))
        .select(col("event_type"),
          element_at(array(qs.map(lit): _*), col("i").cast("int") + 1)
            .as("q"),
          round(col("e"), 6).as("q_exact"))
      est.join(ex, Seq("event_type", "q"))
        .orderBy(col("event_type"), col("q"))
    },
    Some("""WITH v AS (SELECT event_type AS g, value::DOUBLE AS x FROM events),
           |b AS (SELECT g, min(x) AS lo, max(x) AS hi FROM v GROUP BY g),
           |h AS (
           |  SELECT v.g, greatest(0, least(31,
           |      CAST(floor((x - lo) / ((hi - lo) / 32)) AS INT))) AS bin,
           |    count(*) AS cnt, min(lo) AS lo, min(hi) AS hi
           |  FROM v JOIN b USING (g) GROUP BY 1, 2),
           |c AS (
           |  SELECT g, bin, cnt, lo, hi,
           |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) AS cum,
           |    sum(cnt) OVER (PARTITION BY g ORDER BY bin) - cnt AS below,
           |    sum(cnt) OVER (PARTITION BY g) AS n
           |  FROM h),
           |qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
           |pick AS (
           |  SELECT g, q, min(bin) AS bin FROM qs JOIN c ON c.cum >= q * c.n
           |  GROUP BY 1, 2),
           |ex AS (SELECT g,
           |    round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY x), 6) AS e1,
           |    round(percentile_cont(0.9)  WITHIN GROUP (ORDER BY x), 6) AS e2,
           |    round(percentile_cont(0.99) WITHIN GROUP (ORDER BY x), 6) AS e3
           |  FROM v GROUP BY g),
           |exl AS (SELECT g, unnest([0.5, 0.9, 0.99]) AS q,
           |    unnest([e1, e2, e3]) AS q_exact FROM ex)
           |SELECT p.g AS event_type, p.q,
           |  round(c.lo + ((c.hi - c.lo) / 32) * (p.bin
           |    + (p.q * c.n - c.below) / c.cnt), 6) AS q_est,
           |  exl.q_exact
           |FROM pick p JOIN c ON c.g = p.g AND c.bin = p.bin
           |JOIN exl ON exl.g = p.g AND exl.q = p.q
           |ORDER BY event_type, p.q""".stripMargin))


  /** X5i — shard materialization (round 11): packSequences' bins become
    * actual training shards — docs concatenated in id order per
    * (lang, bin), judged by count, token total and the shard's content
    * md5. The fingerprint is the artifact a downstream tokenizer
    * verifies; hash-matching the oracle's independently-ordered
    * string_agg proves both the membership AND the byte order of every
    * shard. */
  val x5Shard = QuerySpec("x5_shard",
    (s, d) => TextOps.materializeShards(
        TextOps.packSequences(T(s, d, "documents"), "text", "doc_id",
          Seq("lang"), 512),
        "text", "doc_id", Seq("lang"))
      .orderBy(col("lang"), col("bin")),
    Some("""WITH p AS (
           |  SELECT doc_id, lang, text, len(string_split(text, ' ')) AS n_tok,
           |    sum(len(string_split(text, ' '))) OVER (
           |      PARTITION BY lang ORDER BY doc_id) AS cum
           |  FROM documents),
           |a AS (
           |  SELECT doc_id, lang, text, n_tok,
           |    CAST(floor((cum - n_tok) / 512) AS BIGINT) AS bin
           |  FROM p)
           |SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |  md5(string_agg(text, ' ' ORDER BY doc_id)) AS shard_md5
           |FROM a GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin))


  /** X5n — exact-proportion stratified split (Scale.stratifiedSplit):
    * salted-md5 rank within each language, integer rank thresholds —
    * 80/10/10 holds per stratum to ±1 row, and both engines derive the
    * identical assignment (the whole point of a deterministic split:
    * re-running the pipeline cannot shuffle eval docs into train). */
  val x5Split = QuerySpec("x5_split",
    (s, d) => Scale.stratifiedSplit(T(s, d, "documents"),
        "doc_id", "lang", 80, 10)
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id")),
    Some("""WITH r AS (
           |  SELECT doc_id, lang,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id)
           |      AS rk,
           |    count(*) OVER (PARTITION BY lang) AS n
           |  FROM documents)
           |SELECT doc_id, lang,
           |  CASE WHEN rk * 100 <= n * 80 THEN 'train'
           |       WHEN rk * 100 <= n * 90 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM r ORDER BY doc_id""".stripMargin))


  /** X5m — token-budget corpus mixing (ops/Scale.tokenBudgetSample): fill
    * per-language token budgets in deterministic md5 order, keep whole
    * docs while the running total stays under the line. The mixture dim
    * (3 languages with en weighted 2.7×) broadcasts; the fill is one
    * window cumsum per group. */
  val x5BudgetMix = QuerySpec("x5_budget_mix",
    (s, d) => Scale.tokenBudgetSample(Tables.documents(s, d), "doc_id",
        "text", "lang",
        Seq("en" -> 4000L, "de" -> 1500L, "fr" -> 1500L))
      .orderBy(col("lang"), col("cum_toks")),
    Some("""WITH b(lang, budget) AS (VALUES
           |    ('en', CAST(4000 AS BIGINT)), ('de', CAST(1500 AS BIGINT)),
           |    ('fr', CAST(1500 AS BIGINT))),
           |t AS (
           |  SELECT d.doc_id, d.lang, b.budget,
           |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS toks,
           |    md5(CAST(d.doc_id AS VARCHAR)) AS h
           |  FROM documents d JOIN b ON d.lang = b.lang),
           |c AS (
           |  SELECT doc_id, lang, toks, budget,
           |    CAST(sum(toks) OVER (PARTITION BY lang ORDER BY h, doc_id)
           |      AS BIGINT) AS cum_toks
           |  FROM t)
           |SELECT doc_id, lang, toks, cum_toks
           |FROM c WHERE cum_toks <= budget
           |ORDER BY lang, cum_toks""".stripMargin))


  /** X5m — PORTABLE BLOOM FILTER BUILD (round 13): the benchmark split's
    * 5-gram keys compressed to a k=3, m=1024-bit filter, judged as its
    * set-bit-position SET — the md5-twin discipline (a2_hll_md5,
    * x5_cms_estimate) applied to Bloom: engine-portable hash math means
    * the filter CONTENTS are oracle-replayable, not just its verdicts.
    * Output is bounded at m rows whatever the corpus; per-shard filters
    * union-merge (SketchSpec pins merge == whole-build). */
  val x5Bloom = QuerySpec("x5_bloom",
    (s, d) => {
      val bench = T(s, d, "documents").filter(col("doc_id") % 17 === 3)
      Sketch.bloomBuild(
          TextOps.benchmarkShingles(bench, "text", 5), "sh", 3, 1024)
        .orderBy(col("pos"))
    },
    Some("""WITH b AS (
           |  SELECT string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS nt
           |  FROM documents WHERE doc_id % 17 = 3),
           |bsh AS (
           |  SELECT DISTINCT unnest(list_transform(range(1, nt - 3),
           |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS sh
           |  FROM b WHERE nt >= 5),
           |ks AS (SELECT unnest(range(0, 3)) AS i)
           |SELECT DISTINCT
           |  ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || sh), 1, 8))
           |    ::BIGINT % 1024 AS pos
           |FROM bsh, ks ORDER BY pos""".stripMargin))


  /** X5d — weighted source interleave: deterministic training-order
    * schedule (src0 2x dense, src1 1x, others 0.5x). Power-of-two weights
    * make the schedule key exact in binary — no rounding on either side. */
  val x5Interleave = QuerySpec("x5_interleave",
    (s, d) => TextOps.interleaveBySource(T(s, d, "documents"), "doc_id",
        "source", Map("src0" -> 2.0, "src1" -> 1.0), defaultWeight = 0.5)
      .select(col("doc_id"), col("source"), col("src_rank"), col("sched"))
      .orderBy(col("sched"), col("source"), col("doc_id")),
    Some("""WITH r AS (
           |  SELECT doc_id, source,
           |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
           |      AS INT) AS src_rank
           |  FROM documents)
           |SELECT doc_id, source, src_rank,
           |  -- ::DOUBLE: DECIMAL literals would make this DECIMAL division
           |  src_rank / (CASE source WHEN 'src0' THEN 2.0 WHEN 'src1' THEN 1.0
           |    ELSE 0.5 END)::DOUBLE AS sched
           |FROM r ORDER BY sched, source, doc_id""".stripMargin))


  /** X5n — self-join-size (F2) estimate from the CMS
    * (ops/Sketch.cmsSelfJoinSize): Σ_b cnt² per row, min over rows —
    * the size a token self-join WOULD be, answered from d·w counters
    * without paying for the join; judged beside the exact Σ_k f_k² so
    * the overcount is visible and bounded. The token stream's hot
    * boilerplate words make F2 ≫ F1 — the regime where this estimate
    * earns its keep. w=16 against the ~45-word vocabulary forces real
    * collisions, so the judged artifact shows the OVERCOUNT (est > exact)
    * the min-over-rows bound then caps — not a collision-free identity. */
  val x5CmsSelfJoin = QuerySpec("x5_cms_selfjoin",
    (s, d) => {
      val toks = T(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
      val est = Sketch.cmsSelfJoinSize(Sketch.cmsBuild(toks, "tok", 4, 16))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("exact_f2"))
      est.crossJoin(exact)
    },
    Some("""WITH toks AS (
           |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
           |rws AS (SELECT unnest(range(0, 4)) AS r),
           |cells AS (
           |  SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || tok),
           |      1, 8))::BIGINT % 16 AS b,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM toks, rws GROUP BY r, b),
           |rowf2 AS (SELECT r, CAST(sum(cnt * cnt) AS BIGINT) AS row_f2
           |  FROM cells GROUP BY r),
           |est AS (SELECT CAST(min(row_f2) AS BIGINT) AS est_f2 FROM rowf2),
           |exact AS (
           |  SELECT CAST(sum(c * c) AS BIGINT) AS exact_f2 FROM (
           |    SELECT CAST(count(*) AS BIGINT) AS c FROM toks
           |    GROUP BY tok) t)
           |SELECT est.est_f2, exact.exact_f2 FROM est, exact""".stripMargin))


  /** X5o — cross-period join-size estimate (ops/Sketch.cmsJoinSize):
    * |1996-parts ⋈ 1997-parts| from two CMS inner products — the
    * optimizer's broadcast-vs-shuffle cardinality call, and the dedup
    * planner's "how many candidate pairs across snapshots" sizing,
    * answered from 2·d·w counters; judged beside the exact
    * Σ_k fA(k)·fB(k). Width sizing is the lane's real lesson: the
    * inner product's error floor is F1A·F1B/w PER ROW, so w must be
    * sized to the stream masses (w=4096 here puts the floor near the
    * true size; the w=64 first cut measured est 32× over — on-model,
    * useless — exactly the sizing rule BASELINE.md's Bloom/CMS notes
    * pin). */
  val x5CmsJoinSize = QuerySpec("x5_cms_joinsize",
    (s, d) => {
      val li = T(s, d, "lineitem")
      def period(y: Int) = li.filter(
          col("l_shipdate") >= lit(s"$y-01-01").cast("timestamp") &&
          col("l_shipdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select(col("l_partkey").cast("string").as("pk"))
      val estDf = Sketch.cmsJoinSize(
        Sketch.cmsBuild(period(1996), "pk", 4, 4096),
        Sketch.cmsBuild(period(1997), "pk", 4, 4096))
      val exact = period(1996).groupBy(col("pk"))
        .agg(count(lit(1)).as("fa"))
        .join(period(1997).groupBy(col("pk"))
          .agg(count(lit(1)).as("fb")), Seq("pk"))
        .agg(sum(col("fa") * col("fb")).as("exact_join"))
      estDf.crossJoin(exact)
    },
    Some("""WITH a AS (
           |  SELECT CAST(l_partkey AS VARCHAR) AS pk FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
           |bb AS (
           |  SELECT CAST(l_partkey AS VARCHAR) AS pk FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
           |rws AS (SELECT unnest(range(0, 4)) AS r),
           |ca AS (SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':'
           |      || pk), 1, 8))::BIGINT % 4096 AS b,
           |    CAST(count(*) AS BIGINT) AS ca
           |  FROM a, rws GROUP BY r, b),
           |cb AS (SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':'
           |      || pk), 1, 8))::BIGINT % 4096 AS b,
           |    CAST(count(*) AS BIGINT) AS cb
           |  FROM bb, rws GROUP BY r, b),
           |j AS (SELECT ca.r, ca.ca * cb.cb AS p
           |  FROM ca JOIN cb ON ca.r = cb.r AND ca.b = cb.b),
           |rowj AS (SELECT rws.r,
           |    CAST(coalesce(sum(j.p), 0) AS BIGINT) AS row_j
           |  FROM rws LEFT JOIN j ON j.r = rws.r GROUP BY rws.r),
           |est AS (SELECT CAST(min(row_j) AS BIGINT) AS est_join FROM rowj),
           |exact AS (
           |  SELECT CAST(sum(fa.f * fb.f) AS BIGINT) AS exact_join
           |  FROM (SELECT pk, CAST(count(*) AS BIGINT) AS f FROM a
           |        GROUP BY pk) fa
           |  JOIN (SELECT pk, CAST(count(*) AS BIGINT) AS f FROM bb
           |        GROUP BY pk) fb USING (pk))
           |SELECT est.est_join, exact.exact_join FROM est, exact""".stripMargin))


  // ===========================================================================
  // Round-15 second batch: KMV set sketches, ACF, CUPED, LPA communities,
  // referential-integrity audit
  // ===========================================================================

  /** X5q — KMV distinct sketch (ops/Sketch.kmvSketch): keep the 64
    * smallest 44-bit md5 hashes of the click-price set; est_distinct =
    * ⌊63·2^44 / h_64⌋, judged beside the exact count so the artifact
    * records estimator quality, not just mechanism. The sketch build is
    * a map-side-combined distinct + per-task k-minima merge
    * (TakeOrderedAndProject) — nothing value-set-sized crosses the
    * exchange except once for the judged exact twin. */
  val x5Kmv = QuerySpec("x5_kmv",
    (s, d) => {
      val cents = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      val exact = cents.agg(count_distinct(col("v")).as("exact_distinct"))
      Sketch.kmvEstimate(Sketch.kmvSketch(cents, "v", 64), 64)
        .crossJoin(broadcast(exact))
    },
    Some("""-- nonneg-div(1): md5-derived unsigned hashes and counts
           |WITH v AS (SELECT DISTINCT CAST(floor(value * 100 + 0.5) AS BIGINT)
           |    AS v FROM events WHERE event_type = 'click'),
           |h AS (SELECT DISTINCT
           |    ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 11))::BIGINT + 1
           |      AS h FROM v),
           |k AS (SELECT h FROM h ORDER BY h LIMIT 64),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_kept,
           |    max(h) AS kth_h FROM k)
           |SELECT n_kept, kth_h,
           |  CAST(CASE WHEN n_kept < 64 THEN n_kept
           |    ELSE 63 * 17592186044416 // kth_h END AS BIGINT)
           |    AS est_distinct,
           |  (SELECT CAST(count(*) AS BIGINT) FROM v) AS exact_distinct
           |FROM agg""".stripMargin))


  /** X5r — KMV set algebra (ops/Sketch.kmvCompare): click-price vs
    * purchase-price value sets — union/Jaccard/intersection estimated
    * from two 64-hash sketches (the set operation HLL registers cannot
    * express), judged beside the exact set counts. All the estimator
    * arithmetic runs over two ≤64-row broadcast frames; only the exact
    * twins scan the fact data. */
  val x5KmvJaccard = QuerySpec("x5_kmv_jaccard",
    (s, d) => {
      def cents(t: String) = Tables.events(s, d)
        .filter(col("event_type") === t)
        .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      val a = cents("click")
      val b = cents("purchase")
      val exact = a.distinct().select(col("v"), lit(1L).as("ia"))
        .join(b.distinct().select(col("v"), lit(1L).as("ib")),
          Seq("v"), "full_outer")
        .agg(count(lit(1)).as("exact_union"),
          sum(expr("coalesce(ia, 0L) * coalesce(ib, 0L)")).as("exact_inter"))
      Sketch.kmvCompare(Sketch.kmvSketch(a, "v", 64),
          Sketch.kmvSketch(b, "v", 64), 64)
        .crossJoin(broadcast(exact))
    },
    Some("""-- nonneg-div(3): md5-derived unsigned hashes and counts
           |WITH av AS (SELECT DISTINCT CAST(floor(value * 100 + 0.5)
           |    AS BIGINT) AS v FROM events WHERE event_type = 'click'),
           |bv AS (SELECT DISTINCT CAST(floor(value * 100 + 0.5) AS BIGINT)
           |    AS v FROM events WHERE event_type = 'purchase'),
           |ah AS (SELECT DISTINCT
           |    ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 11))::BIGINT + 1
           |      AS h FROM av),
           |ak AS (SELECT h FROM ah ORDER BY h LIMIT 64),
           |bh AS (SELECT DISTINCT
           |    ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 11))::BIGINT + 1
           |      AS h FROM bv),
           |bk AS (SELECT h FROM bh ORDER BY h LIMIT 64),
           |u AS (SELECT coalesce(ak.h, bk.h) AS h,
           |    CASE WHEN ak.h IS NULL THEN 0 ELSE 1 END AS ia,
           |    CASE WHEN bk.h IS NULL THEN 0 ELSE 1 END AS ib
           |  FROM ak FULL JOIN bk ON ak.h = bk.h),
           |uk AS (SELECT * FROM u ORDER BY h LIMIT 64),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS k_used,
           |    max(h) AS kth_h, CAST(sum(ia * ib) AS BIGINT) AS n_both
           |  FROM uk),
           |est AS (SELECT k_used, n_both,
           |    CAST(CASE WHEN k_used < 64 THEN k_used
           |      ELSE 63 * 17592186044416 // kth_h END AS BIGINT)
           |      AS est_union
           |  FROM agg),
           |ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_union,
           |    CAST(sum(CASE WHEN av.v IS NOT NULL AND bv.v IS NOT NULL
           |      THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
           |  FROM av FULL JOIN bv ON av.v = bv.v)
           |SELECT est.k_used, est.n_both, est.est_union,
           |  CAST(n_both * 1000000 // k_used AS BIGINT) AS jacc_ppm,
           |  CAST(n_both * est_union // k_used AS BIGINT) AS est_inter,
           |  ex.exact_union, ex.exact_inter
           |FROM est, ex""".stripMargin))


  /** X5s — per-group KMV (ops/Sketch.kmvSketchBy): one bottom-64 sketch
    * per language over the token stream — per-language vocabulary
    * estimates judged beside the exact distinct counts. The per-group k
    * minima come from a rank window Spark plans as WindowGroupLimit (≤ k
    * candidates per group per map task). */
  val x5KmvBy = QuerySpec("x5_kmv_by",
    (s, d) => {
      val toks = T(s, d, "documents")
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      val exact = toks.groupBy(col("lang").as("grp"))
        .agg(count_distinct(col("tok")).as("exact_distinct"))
      Sketch.kmvEstimateBy(Sketch.kmvSketchBy(toks, "tok", "lang", 64), 64)
        .join(broadcast(exact), Seq("grp"))
        .orderBy(col("grp"))
    },
    Some("""-- nonneg-div(1): md5-derived unsigned hashes and counts
           |WITH t AS (SELECT lang AS grp,
           |    unnest(string_split(text, ' ')) AS tok FROM documents),
           |dh AS (SELECT DISTINCT grp,
           |    ('0x' || substr(md5(tok), 1, 11))::BIGINT + 1 AS h FROM t),
           |r AS (SELECT grp, h,
           |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
           |  FROM dh),
           |k AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_kept,
           |    max(h) AS kth_h FROM r WHERE rn <= 64 GROUP BY grp),
           |x AS (SELECT grp, CAST(count(DISTINCT tok) AS BIGINT)
           |    AS exact_distinct FROM t GROUP BY grp)
           |SELECT k.grp, k.n_kept, k.kth_h,
           |  CAST(CASE WHEN n_kept < 64 THEN n_kept
           |    ELSE 63 * 17592186044416 // kth_h END AS BIGINT)
           |    AS est_distinct,
           |  x.exact_distinct
           |FROM k JOIN x USING (grp) ORDER BY grp""".stripMargin))


  /** X5t — KMV merge closure as a JUDGED claim (ops/Sketch.kmvMerge):
    * the Spark side sketches the two user-parity shards separately and
    * MERGES; the oracle computes the global bottom-64 directly — equal
    * results prove the closure property the per-shard maintenance lane
    * (x7_incr_kmv) relies on, the cmsMerge/hllMerge discipline. */
  val x5KmvMerge = QuerySpec("x5_kmv_merge",
    (s, d) => {
      def shard(p: Int) = Sketch.kmvSketch(
        Tables.events(s, d)
          .filter(col("event_type") === "click" && col("user_id") % 2 === p)
          .select(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v")),
        "v", 64)
      Sketch.kmvEstimate(Sketch.kmvMerge(64, shard(0), shard(1)), 64)
    },
    Some("""-- nonneg-div(1): md5-derived unsigned hashes and counts
           |WITH v AS (SELECT DISTINCT CAST(floor(value * 100 + 0.5) AS BIGINT)
           |    AS v FROM events WHERE event_type = 'click'),
           |h AS (SELECT DISTINCT
           |    ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 11))::BIGINT + 1
           |      AS h FROM v),
           |k AS (SELECT h FROM h ORDER BY h LIMIT 64)
           |SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth_h,
           |  CAST(CASE WHEN count(*) < 64 THEN count(*)
           |    ELSE 63 * 17592186044416 // max(h) END AS BIGINT)
           |    AS est_distinct
           |FROM k""".stripMargin))
}
