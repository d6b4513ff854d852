package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** X4 text analysis / curation family: BPE, LM score, classifiers, scrub, decontaminate, corpus report.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QText {

  /** X4n — integer-ppm Naive-Bayes classifier (round 14): add-one
    * smoothed class-conditional token stats fit on the doc_id % 5 <> 0
    * split, label predicted for the held-out rest by argmax of the
    * SUMMED per-token conditional probability in ppm (integer div end to
    * end — the lmScore portability discipline; ties to the smallest
    * label). The fastText-quality-classifier slot of a curation
    * pipeline, as pure dataflow. */
  val x4NbClassify = QuerySpec("x4_nb_classify",
    (s, d) => TextOps.nbClassify(T(s, d, "documents"), "text", "doc_id",
        "lang", trainFilter = col("doc_id") % 5 =!= 0)
      .orderBy(col("doc_id")),
    Some("""-- nonneg-div(1): add-one-smoothed counts
           |WITH tr AS (
           |  SELECT doc_id, lang,
           |    unnest(string_split(lower(text), ' ')) AS w
           |  FROM documents WHERE doc_id % 5 <> 0),
           |te AS (
           |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
           |  FROM documents WHERE doc_id % 5 = 0),
           |v AS (SELECT count(DISTINCT w) AS v FROM tr),
           |ct AS (
           |  SELECT lang AS cls, count(*) + (SELECT v FROM v) AS denom
           |  FROM tr GROUP BY 1),
           |sc AS (
           |  SELECT te.doc_id, ct.cls,
           |    sum(((coalesce(wc.c_wc, 0) + 1) * 1000000) // ct.denom)
           |      AS score_ppm
           |  FROM te CROSS JOIN ct
           |  LEFT JOIN (
           |    SELECT w, lang AS cls, count(*) AS c_wc
           |    FROM tr GROUP BY 1, 2) wc
           |    ON wc.w = te.w AND wc.cls = ct.cls
           |  GROUP BY 1, 2),
           |r AS (
           |  SELECT doc_id, cls AS predicted, score_ppm,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY score_ppm DESC, cls) AS rk
           |  FROM sc)
           |SELECT doc_id, predicted, CAST(score_ppm AS BIGINT) AS score_ppm
           |FROM r WHERE rk = 1
           |ORDER BY doc_id""".stripMargin))


  /** X4u — char-trigram language identification (round 20, r19 verdict
    * item 6): Cavnar–Trenkle-class langid as the integer-ppm NB argmax
    * over character 3-grams of the space-padded lowercased text,
    * trained on the doc_id % 5 <> 0 split, every held-out doc
    * classified — ties to the smallest label, judged to the last ppm
    * (the oracle replays the same gram extraction and smoothing). */
  val x4LangIdNgram = QuerySpec("x4_langid_ngram",
    (s, d) => TextOps.langId(T(s, d, "documents"), "text", "doc_id",
        "lang", trainFilter = col("doc_id") % 5 =!= 0, n = 3)
      .orderBy(col("doc_id")),
    Some("""-- nonneg-div(1): add-one-smoothed counts
           |WITH src AS (
           |  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS t
           |  FROM documents WHERE len(' ' || lower(text) || ' ') >= 3),
           |tr AS (
           |  SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS w
           |  FROM (SELECT doc_id, lang, t,
           |          unnest(range(1, len(t) - 1)) AS i FROM src)
           |  WHERE doc_id % 5 <> 0),
           |te AS (
           |  SELECT doc_id, substr(t, CAST(i AS INT), 3) AS w
           |  FROM (SELECT doc_id, lang, t,
           |          unnest(range(1, len(t) - 1)) AS i FROM src)
           |  WHERE doc_id % 5 = 0),
           |v AS (SELECT count(DISTINCT w) AS v FROM tr),
           |ct AS (
           |  SELECT lang AS cls, count(*) + (SELECT v FROM v) AS denom
           |  FROM tr GROUP BY 1),
           |sc AS (
           |  SELECT te.doc_id, ct.cls,
           |    sum(((coalesce(wc.c_wc, 0) + 1) * 1000000) // ct.denom)
           |      AS score_ppm
           |  FROM te CROSS JOIN ct
           |  LEFT JOIN (
           |    SELECT w, lang AS cls, count(*) AS c_wc
           |    FROM tr GROUP BY 1, 2) wc
           |    ON wc.w = te.w AND wc.cls = ct.cls
           |  GROUP BY 1, 2),
           |r AS (
           |  SELECT doc_id, cls AS predicted, score_ppm,
           |    row_number() OVER (PARTITION BY doc_id
           |      ORDER BY score_ppm DESC, cls) AS rk
           |  FROM sc)
           |SELECT doc_id, predicted, CAST(score_ppm AS BIGINT) AS score_ppm
           |FROM r WHERE rk = 1
           |ORDER BY doc_id""".stripMargin),
    bench = true)


  /** X4m — corpus-LM quality score (round 11): train bigram statistics
    * on the corpus and score every document's average conditional
    * probability in ppm, all-integer (see TextOps.lmScore) — the
    * engine-portable stand-in for CCNet's perplexity filter, judged to
    * the last ppm. */
  val x4LmScore = QuerySpec("x4_lm_score",
    (s, d) => TextOps.lmScore(T(s, d, "documents"), "text", "doc_id")
      .orderBy(col("doc_id")),
    Some("""-- nonneg-div(2): bigram counts and ppm probabilities
           |WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
           |  FROM documents),
           |b AS (
           |  SELECT doc_id, toks[i] AS w, toks[i+1] AS w2
           |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |    FROM t)),
           |c2 AS (SELECT w, w2, count(*) AS c2 FROM b GROUP BY 1, 2),
           |c1 AS (SELECT w, count(*) AS c1 FROM b GROUP BY 1),
           |s AS (
           |  SELECT b.doc_id, (c2.c2 * 1000000) // c1.c1 AS p_ppm
           |  FROM b JOIN c2 USING (w, w2) JOIN c1 USING (w))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
           |FROM s GROUP BY 1 ORDER BY doc_id""".stripMargin),
    bench = true)


  /** X4m' — HELD-OUT corpus-LM scoring (round 12): fit the bigram
    * statistics on one deterministic hash-split of the corpus and score
    * the DISJOINT other split — the honest CCNet shape (self-training
    * inflates repetitive documents' scores; see TextOps.lmScore).
    * Split = md5(doc_id) 4-nibble prefix vs '8000' (Scale.hashSample at
    * rate 0.5 — engine-portable, so the oracle reproduces the exact
    * membership). Eval bigrams unseen in training score 0 ppm (LEFT
    * join + coalesce on both engines). */
  val x4LmScoreHoldout = QuerySpec("x4_lm_score_holdout",
    (s, d) => {
      val docs = T(s, d, "documents")
      val train = Scale.hashSample(docs, "doc_id", 0.5)
      val eval = docs.filter(
        substring(md5(col("doc_id").cast("string")), 1, 4) >= lit("8000"))
      TextOps.lmScore(eval, "text", "doc_id", train = Some(train))
        .orderBy(col("doc_id"))
    },
    Some("""-- nonneg-div(2): bigram counts and ppm probabilities
           |WITH tr AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'),
           |ev AS (
           |  SELECT doc_id, text FROM documents
           |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) >= '8000'),
           |tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM tr),
           |tb AS (
           |  SELECT toks[i] AS w, toks[i+1] AS w2
           |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |    FROM tt)),
           |c2 AS (SELECT w, w2, count(*) AS c2 FROM tb GROUP BY 1, 2),
           |c1 AS (SELECT w, count(*) AS c1 FROM tb GROUP BY 1),
           |et AS (SELECT doc_id, string_split(text, ' ') AS toks FROM ev),
           |eb AS (
           |  SELECT doc_id, toks[i] AS w, toks[i+1] AS w2
           |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
           |    FROM et)),
           |s AS (
           |  SELECT eb.doc_id,
           |    coalesce((c2.c2 * 1000000) // c1.c1, 0) AS p_ppm
           |  FROM eb LEFT JOIN c2 USING (w, w2) LEFT JOIN c1 USING (w))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS score_ppm
           |FROM s GROUP BY 1 ORDER BY doc_id""".stripMargin))


  val x4TextStats = QuerySpec("x4_text_stats",
    (s, d) => TextOps.withTextStats(T(s, d, "documents"), "text")
      .select(col("doc_id"), col("n_tokens").cast("int").as("n_tokens"),
        col("n_stop").cast("int").as("n_stop"), col("avg_token_len"),
        col("stop_ratio"), col("quality"))
      .orderBy(col("doc_id")),
    Some("""WITH d AS (
           |  SELECT doc_id, length(text) AS n_chars2,
           |    string_split(text, ' ') AS toks
           |  FROM documents),
           |t AS (
           |  SELECT doc_id, n_chars2,
           |    CAST(len(toks) AS INT) AS n_tokens,
           |    CAST(len(list_filter(toks,
           |      x -> x IN ('the','a','of','and'))) AS INT) AS n_stop
           |  FROM d)
           |SELECT doc_id, n_tokens, n_stop,
           |  round((n_chars2 - (n_tokens - 1)) / n_tokens, 6) AS avg_token_len,
           |  round(n_stop / n_tokens, 6) AS stop_ratio,
           |  round(least(1.0, n_tokens / 100.0) * 0.5 +
           |        least(1.0, n_stop / 10.0) * 0.5, 6) AS quality
           |FROM t ORDER BY doc_id""".stripMargin)
    )


  /** X4o — the Gopher-style rule gate (TextOps.withQualityRules): every
    * ratio threshold via integer cross-multiplication, one narrow
    * projection, per-rule booleans so curation keeps an audit trail.
    * minTokens=20 so the driver corpus genuinely splits on r_len. */
  val x4GopherRules = QuerySpec("x4_gopher_rules",
    (s, d) => TextOps.withQualityRules(T(s, d, "documents"), "text",
        minTokens = 20)
      .select(col("doc_id"), col("r_len"), col("r_word_len"),
        col("r_symbol"), col("r_alpha"), col("r_stop"), col("keep_rules"))
      .orderBy(col("doc_id")),
    Some("""WITH d AS (
           |  SELECT doc_id, lower(text) AS lt,
           |    string_split(lower(text), ' ') AS toks
           |  FROM documents),
           |s AS (
           |  SELECT doc_id,
           |    len(toks) AS ntok,
           |    length(lt) - (len(toks) - 1) AS wchars,
           |    length(lt) - length(regexp_replace(lt, '[^a-z0-9 ]', '', 'g'))
           |      AS nsym,
           |    len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
           |      AS nalpha,
           |    len(list_filter(toks, t -> t IN ('the','a','of','and')))
           |      AS nstop
           |  FROM d)
           |SELECT doc_id,
           |  ntok >= 20 AND ntok <= 100000 AS r_len,
           |  3 * ntok <= wchars AND wchars <= 10 * ntok AS r_word_len,
           |  10 * nsym <= ntok AS r_symbol,
           |  5 * nalpha >= 4 * ntok AS r_alpha,
           |  nstop >= 2 AS r_stop,
           |  (ntok >= 20 AND ntok <= 100000)
           |    AND (3 * ntok <= wchars AND wchars <= 10 * ntok)
           |    AND (10 * nsym <= ntok)
           |    AND (5 * nalpha >= 4 * ntok)
           |    AND (nstop >= 2) AS keep_rules
           |FROM s ORDER BY doc_id""".stripMargin))


  val x4LangId = QuerySpec("x4_langid",
    (s, d) => TextOps.withLangId(T(s, d, "documents"), "text")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("predicted_lang") === col("lang"), 1).otherwise(0))
          .as("n_correct"),
        sum(when(col("predicted_lang") === "en", 1).otherwise(0))
          .as("n_pred_en"))
      .orderBy(col("lang")),
    Some("""WITH p AS (
           |  SELECT lang,
           |    CASE WHEN len(list_filter(string_split(text, ' '),
           |      x -> x IN ('the','a','of','and'))) >= 2
           |    THEN 'en' ELSE 'und' END AS predicted_lang
           |  FROM documents)
           |SELECT lang, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_correct,
           |  CAST(sum(CASE WHEN predicted_lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_pred_en
           |FROM p GROUP BY lang ORDER BY lang""".stripMargin))


  /** X4q — per-language domain-shift (total-variation) report. TV is
    * rational, so floored-ppm probabilities make the whole statistic
    * exact integer arithmetic — hash-checkable where KL/JS would drift
    * on cross-engine libm logs. */
  val x4DomainShift = QuerySpec("x4_domain_shift",
    (s, d) => TextOps.domainShift(T(s, d, "documents"), "text", "lang")
      .orderBy(col("grp")),
    Some("""-- nonneg-div(3): token counts and abs TV mass
           |WITH t AS (SELECT lang AS grp,
           |    unnest(string_split(lower(text), ' ')) AS tok
           |  FROM documents),
           |gc AS (SELECT grp, tok, count(*) AS cnt_s FROM t GROUP BY 1, 2),
           |gt AS (SELECT grp, sum(cnt_s) AS n_s FROM gc GROUP BY 1),
           |c AS (SELECT tok, count(*) AS cnt_g FROM t GROUP BY 1),
           |n AS (SELECT sum(cnt_g) AS n_g FROM c),
           |pg AS (SELECT tok, cnt_g * 1000000 // n_g AS p_g FROM c, n),
           |pt AS (SELECT sum(p_g) AS pg_total FROM pg)
           |SELECT gc.grp, CAST(gt.n_s AS BIGINT) AS n_toks,
           |  CAST((sum(abs(cnt_s * 1000000 // gt.n_s - p_g))
           |      + pt.pg_total - sum(p_g)) // 2 AS BIGINT) AS tv_ppm
           |FROM gc JOIN pg USING (tok) JOIN gt USING (grp), pt
           |GROUP BY gc.grp, gt.n_s, pt.pg_total
           |ORDER BY grp""".stripMargin))


  /** X4s — co-occurrence lift (PMI-ordered) over doc frequencies. The
    * planted near-dup family makes 'dup' pairs stand far from
    * independence; lift is exact integer ppm (PMI without the log). */
  val x4Pmi = QuerySpec("x4_pmi",
    (s, d) => TextOps.pmiPairs(T(s, d, "documents"), "text", "doc_id",
        minDf = 1, maxDf = 1000000, minSupport = 5)
      .orderBy(col("t1"), col("t2")),
    Some("""-- nonneg-div(1): count-lift numerators
           |WITH dt AS (SELECT DISTINCT doc_id AS doc,
           |    unnest(string_split(lower(text), ' ')) AS tok
           |  FROM documents),
           |df AS (SELECT tok, count(*) AS n_t FROM dt GROUP BY 1
           |  HAVING count(*) BETWEEN 1 AND 1000000),
           |k AS (SELECT doc, tok, n_t FROM dt JOIN df USING (tok)),
           |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
           |p AS (SELECT a.tok AS t1, b.tok AS t2, a.n_t AS n_x,
           |    b.n_t AS n_y, count(*) AS n_xy
           |  FROM k a JOIN k b USING (doc) WHERE a.tok < b.tok
           |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 5)
           |SELECT t1, t2, CAST(n_xy AS BIGINT) AS n_xy,
           |  CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y,
           |  CAST(n_xy * n_docs * 1000000 // (n_x * n_y) AS BIGINT)
           |    AS lift_ppm
           |FROM p, nd ORDER BY t1, t2""".stripMargin))


  /** X4t — Heaps'-law vocabulary-growth curve in 50-doc ingestion
    * buckets: cumulative distinct vocab vs cumulative token volume. */
  val x4VocabGrowth = QuerySpec("x4_vocab_growth",
    (s, d) => TextOps.vocabGrowth(T(s, d, "documents"), "text", "doc_id",
        bucketWidth = 50L)
      .orderBy(col("bucket")),
    Some("""-- nonneg-div(2): counts/rank sums only
           |WITH t AS (SELECT doc_id AS doc,
           |    unnest(string_split(lower(text), ' ')) AS tok
           |  FROM documents),
           |nt AS (SELECT tok, min(doc) AS first_doc FROM t GROUP BY 1),
           |nb AS (SELECT first_doc // 50 AS bucket, count(*) AS new_tokens
           |  FROM nt GROUP BY 1),
           |v AS (SELECT doc // 50 AS bucket, count(*) AS n_tokens
           |  FROM t GROUP BY 1)
           |SELECT CAST(v.bucket AS BIGINT) AS bucket,
           |  CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(coalesce(new_tokens, 0) AS BIGINT) AS new_tokens,
           |  CAST(sum(n_tokens) OVER (ORDER BY v.bucket) AS BIGINT)
           |    AS cum_tokens,
           |  CAST(sum(coalesce(new_tokens, 0)) OVER (ORDER BY v.bucket)
           |    AS BIGINT) AS cum_vocab
           |FROM v LEFT JOIN nb USING (bucket)
           |ORDER BY bucket""".stripMargin))


  val x4Fingerprint = QuerySpec("x4_fingerprint",
    (s, d) => TextOps.withFingerprints(T(s, d, "documents"), "text")
      .filter(col("n_lt") >= 5)
      .select(col("doc_id"), col("fp"), col("minshingle"))
      .orderBy(col("doc_id")),
    Some("""WITH d AS (
           |  SELECT doc_id, md5(lower(text)) AS fp,
           |    string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS n
           |  FROM documents)
           |SELECT doc_id, fp,
           |  list_min(list_transform(range(1, n - 3),
           |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS minshingle
           |FROM d WHERE n >= 5 ORDER BY doc_id""".stripMargin))


  /** X4j — benchmark decontamination (round 10): every 17th document
    * plays the held-out eval set; the remaining corpus is flagged when it
    * shares any word 5-gram with it (documents carries planted near-dup
    * families, so real hits exist). The match is one md5-shingle
    * equi-join — the oracle replays the identical shingling with
    * explicit token concatenation (the x4_fingerprint-proven md5 twin),
    * so engine and oracle cannot drift on tokenization. */
  val x4Decontaminate = QuerySpec("x4_decontaminate",
    (s, d) => {
      val docs = T(s, d, "documents")
      TextOps.decontaminate(
          docs.filter(col("doc_id") % 17 =!= 3),
          docs.filter(col("doc_id") % 17 === 3).select(col("text")),
          "text", "doc_id", n = 5)
        .select(col("doc_id"), col("n_contaminated"), col("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tr AS (
           |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS nt
           |  FROM documents WHERE doc_id % 17 <> 3),
           |b AS (
           |  SELECT string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS nt
           |  FROM documents WHERE doc_id % 17 = 3),
           |tsh AS (
           |  SELECT doc_id, unnest(list_transform(range(1, nt - 3),
           |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS sh
           |  FROM tr WHERE nt >= 5),
           |bsh AS (
           |  SELECT DISTINCT unnest(list_transform(range(1, nt - 3),
           |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS sh
           |  FROM b WHERE nt >= 5),
           |hits AS (
           |  SELECT doc_id, count(DISTINCT sh) AS n_contaminated
           |  FROM tsh JOIN bsh USING (sh) GROUP BY doc_id)
           |SELECT tr.doc_id,
           |  CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
           |  coalesce(h.n_contaminated, 0) > 0 AS contaminated
           |FROM tr LEFT JOIN hits h USING (doc_id)
           |ORDER BY doc_id""".stripMargin))


  /** X4r — graded contamination disclosure: per-doc ppm fraction of
    * distinct 5-grams shared with the held-out benchmark split — the
    * "how much", where x4_decontaminate is the "whether". */
  val x4ContamFrac = QuerySpec("x4_contam_frac",
    (s, d) => {
      val docs = T(s, d, "documents")
      TextOps.contaminationReport(
          docs.filter(col("doc_id") % 17 =!= 3),
          docs.filter(col("doc_id") % 17 === 3).select(col("text")),
          "text", "doc_id", n = 5)
        .filter(col("n_hit") > 0)
        .orderBy(col("doc_id"))
    },
    Some("""-- nonneg-div(1): counts/rank sums only
           |WITH tr AS (
           |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS nt
           |  FROM documents WHERE doc_id % 17 <> 3),
           |b AS (
           |  SELECT string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS nt
           |  FROM documents WHERE doc_id % 17 = 3),
           |tsh AS (
           |  SELECT DISTINCT doc_id,
           |    unnest(list_transform(range(1, nt - 3),
           |      i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |        || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS sh
           |  FROM tr WHERE nt >= 5),
           |bsh AS (
           |  SELECT DISTINCT unnest(list_transform(range(1, nt - 3),
           |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS sh
           |  FROM b WHERE nt >= 5),
           |tot AS (SELECT doc_id, count(*) AS n_grams FROM tsh GROUP BY 1),
           |hits AS (SELECT doc_id, count(*) AS n_hit
           |  FROM tsh SEMI JOIN bsh USING (sh) GROUP BY 1)
           |SELECT doc_id, CAST(tot.n_grams AS BIGINT) AS n_grams,
           |  CAST(hits.n_hit AS BIGINT) AS n_hit,
           |  CAST(hits.n_hit * 1000000 // tot.n_grams AS BIGINT)
           |    AS contam_ppm
           |FROM tot JOIN hits USING (doc_id)
           |ORDER BY doc_id""".stripMargin))


  /** X4f — BLOOM-GATED DECONTAMINATION (round 13): the x4_decontaminate
    * semantics re-expressed as the 100 TB plan — the benchmark's shingle
    * set compresses to an m-bit filter that rides into the corpus scan
    * as an array literal, so corpus shingles are membership-tested
    * MAP-SIDE (codegen'd element_at + shifts, zero join, zero shuffle of
    * corpus shingles; the exact lane shuffles every one of them into an
    * equi-join). The only shuffle left is the per-doc count agg. False
    * positives are deterministic md5 math, so the oracle replays the
    * same verdicts bit for bit — and a curation gate tolerates them in
    * the safe direction (may drop a clean doc, never leaks a
    * contaminated one). m=2^16, k=3 puts the judged corpus in a
    * realistic sub-1% FP regime. */
  val x4DecontaminateBloom = QuerySpec("x4_decontaminate_bloom",
    (s, d) => {
      val docs = T(s, d, "documents")
      TextOps.decontaminateBloom(
          docs.filter(col("doc_id") % 17 =!= 3),
          docs.filter(col("doc_id") % 17 === 3).select(col("text")),
          "text", "doc_id", n = 5, k = 3, m = 1 << 16)
        .select(col("doc_id"), col("n_flagged"), col("contaminated"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH tr AS (
           |  SELECT doc_id, string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS nt
           |  FROM documents WHERE doc_id % 17 <> 3),
           |b AS (
           |  SELECT string_split(lower(text), ' ') AS toks,
           |    len(string_split(lower(text), ' ')) AS nt
           |  FROM documents WHERE doc_id % 17 = 3),
           |tsh AS (
           |  SELECT DISTINCT doc_id,
           |    unnest(list_transform(range(1, nt - 3),
           |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS sh
           |  FROM tr WHERE nt >= 5),
           |bsh AS (
           |  SELECT DISTINCT unnest(list_transform(range(1, nt - 3),
           |    i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           |      || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS sh
           |  FROM b WHERE nt >= 5),
           |ks AS (SELECT unnest(range(0, 3)) AS i),
           |bpos AS (
           |  SELECT DISTINCT
           |    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || sh), 1, 8))
           |      ::BIGINT % 65536 AS pos
           |  FROM bsh, ks),
           |dp AS (
           |  SELECT doc_id, sh, i,
           |    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || sh), 1, 8))
           |      ::BIGINT % 65536 AS pos
           |  FROM tsh, ks),
           |hit AS (
           |  SELECT doc_id, sh FROM dp JOIN bpos USING (pos)
           |  GROUP BY doc_id, sh HAVING count(*) = 3),
           |flag AS (
           |  SELECT doc_id, count(*) AS n_flagged FROM hit GROUP BY doc_id)
           |SELECT tr.doc_id,
           |  CAST(coalesce(f.n_flagged, 0) AS BIGINT) AS n_flagged,
           |  coalesce(f.n_flagged, 0) > 0 AS contaminated
           |FROM tr LEFT JOIN flag f USING (doc_id)
           |ORDER BY doc_id""".stripMargin),
    bench = true)


  val x4TokenBpe = QuerySpec("x4_token_bpe",
    (s, d) => TextOps.withBpeCount(T(s, d, "documents"), "text")
      .select(col("doc_id"), col("n_bpe").cast("int").as("n_bpe"),
        size(split(col("text"), " ")).as("n_ws"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
           |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
           |    AS n_bpe,
           |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws
           |FROM documents ORDER BY doc_id""".stripMargin))


  val x4BpeEncode = QuerySpec("x4_bpe_encode",
    (s, d) => TextOps.bpeEncode(T(s, d, "documents"), "text",
        TextOps.defaultMerges)
      .select(col("doc_id"), col("n_bpe"), col("enc"))
      .orderBy(col("doc_id")),
    Some(bpeEncodeSql(TextOps.defaultMerges)))


  /** X4e — repetition-ratio quality signals (Gopher-style repetitious-text
    * filter): duplicate-token and duplicate-3-gram fractions per doc.
    * Tie-safe floor-rounding on both sides (power-of-two gram counts land
    * exactly on .5 ulps where HALF_UP vs HALF_EVEN would diverge). */
  val x4Repetition = QuerySpec("x4_repetition",
    (s, d) => TextOps.withRepetition(T(s, d, "documents"), "text")
      .select(col("doc_id"), col("n_tok"),
        col("dup_token_frac"), col("dup_3gram_frac"))
      .orderBy(col("doc_id")),
    Some("""WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks,
           |    len(string_split(text, ' ')) AS n
           |  FROM documents)
           |SELECT doc_id, CAST(n AS INT) AS n_tok,
           |  floor((1 - len(list_distinct(toks)) / n) * 1e6 + 0.5) / 1e6
           |    AS dup_token_frac,
           |  CASE WHEN n >= 3 THEN
           |    floor((1 - len(list_distinct(list_transform(range(1, n - 1),
           |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
           |      / (n - 2)) * 1e6 + 0.5) / 1e6
           |  END AS dup_3gram_frac
           |FROM d ORDER BY doc_id""".stripMargin))


  /** X4h — corpus quality report: the per-(lang, source) rollup a curation
    * pipeline runs before choosing mixture weights — doc counts, token
    * mass, stopword mass, high-repetition share. Composes withTextStats +
    * withRepetition, then aggregates ONLY exact integer sums (ratios are
    * derived from them afterwards) so cross-partition float summation
    * order can't move the result on either engine. */
  val x4CorpusReport = QuerySpec("x4_corpus_report",
    (s, d) => TextOps.withRepetition(
        TextOps.withTextStats(T(s, d, "documents"), "text"), "text")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_stop")).as("total_stop"),
        sum(when(col("dup_token_frac") > 0.2, 1).otherwise(0))
          .as("n_high_rep"))
      .withColumn("avg_tokens",
        expr("floor(total_tokens / n_docs * 1e6 + 0.5) / 1e6"))
      .orderBy(col("lang"), col("source")),
    Some("""WITH d AS (
           |  SELECT lang, source, string_split(text, ' ') AS toks,
           |    len(string_split(text, ' ')) AS n
           |  FROM documents),
           |e AS (
           |  SELECT lang, source, n,
           |    len(list_filter(toks, x -> x IN ('the','a','of','and')))
           |      AS n_stop,
           |    floor((1 - len(list_distinct(toks)) / n) * 1e6 + 0.5) / 1e6
           |      AS dtf
           |  FROM d)
           |SELECT lang, source, count(*) AS n_docs,
           |  CAST(sum(n) AS BIGINT) AS total_tokens,
           |  CAST(sum(n_stop) AS BIGINT) AS total_stop,
           |  CAST(sum(CASE WHEN dtf > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_high_rep,
           |  floor(CAST(sum(n) AS BIGINT) / count(*) * 1e6 + 0.5) / 1e6
           |    AS avg_tokens
           |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))


  /** X4g — PII scrub: placeholder substitution + per-doc redaction
    * counts. Patterns stay in the Java/RE2-common regex subset so the
    * oracle's regexp functions produce the identical scrub. */
  val x4Scrub = QuerySpec("x4_scrub",
    (s, d) => TextOps.scrubPii(T(s, d, "documents"), "text")
      .select(col("doc_id"), col("n_emails"), col("n_longnums"),
        md5(col("scrubbed")).as("scrub_fp"))
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
            |  CAST(len(regexp_extract_all(text, '${TextOps.emailPattern}'))
            |    AS INT) AS n_emails,
            |  CAST(len(regexp_extract_all(text, '${TextOps.longNumPattern}'))
            |    AS INT) AS n_longnums,
            |  md5(regexp_replace(regexp_replace(text,
            |    '${TextOps.emailPattern}', '<EMAIL>', 'g'),
            |    '${TextOps.longNumPattern}', '<NUM>', 'g')) AS scrub_fp
            |FROM documents ORDER BY doc_id""".stripMargin))


  /** X4f — TF-IDF top-3 terms per document. The oracle replays tf, df,
    * corpus size, ln scoring (same association and tie-safe floor
    * rounding), and the (score desc, term) ranking. */
  val x4Tfidf = QuerySpec("x4_tfidf",
    (s, d) => TextOps.tfidfTopTerms(T(s, d, "documents"), "text", "doc_id", 3)
      .select(col("doc_id"), col("term"), col("tf").cast("int").as("tf"),
        col("df").cast("int").as("df"), col("tfidf"), col("term_rank"))
      .orderBy(col("doc_id"), col("term_rank")),
    Some("""WITH terms AS (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf
           |       FROM terms GROUP BY 1, 2),
           |df AS (SELECT term, count(DISTINCT doc_id) AS df
           |       FROM terms GROUP BY 1),
           |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
           |sc AS (
           |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
           |    floor(tf.tf * ln(n_docs / df.df) * 1e6 + 0.5) / 1e6 AS tfidf
           |  FROM tf JOIN df USING (term), n),
           |r AS (
           |  SELECT doc_id, term, tf, df, tfidf,
           |    CAST(row_number() OVER (PARTITION BY doc_id
           |      ORDER BY tfidf DESC, term) AS INT) AS term_rank
           |  FROM sc)
           |SELECT doc_id, term, CAST(tf AS INT) AS tf, CAST(df AS INT) AS df,
           |  tfidf, term_rank
           |FROM r WHERE term_rank <= 3
           |ORDER BY doc_id, term_rank""".stripMargin),
    bench = true)


  /** X4i — overlapping document chunking (round 9): split each document
    * into fixed-size token windows with overlap (size 64, stride 48) —
    * the preprocessing every RAG index and long-context pretraining mix
    * runs. One narrow pass: tokenize, explode the stride-spaced start
    * offsets (sequence — distributed, no driver loop), slice the token
    * array per start. Chunk count per doc = ceil(tokens/stride), so
    * output scales linearly with corpus tokens; no shuffle at all before
    * the declared output sort. */
  val x4Chunk = QuerySpec("x4_chunk",
    (s, d) => {
      val toks = split(col("text"), " ")
      T(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("toks")) - 1, lit(48)))
            .as("start"), col("toks"))
        .select(col("doc_id"), (col("start") / 48).cast("int").as("chunk_idx"),
          least(lit(64), size(col("toks")) - col("start")).as("n_tokens"),
          concat_ws(" ", slice(col("toks"), col("start") + 1, lit(64)))
            .as("chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some("""WITH t AS (
           |  SELECT doc_id, string_split(text, ' ') AS toks
           |  FROM documents WHERE doc_id < 200),
           |st AS (
           |  SELECT doc_id, toks,
           |    unnest(generate_series(0, len(toks) - 1, 48)) AS start
           |  FROM t)
           |SELECT doc_id, CAST(start / 48 AS INT) AS chunk_idx,
           |  CAST(least(64, len(toks) - start) AS INT) AS n_tokens,
           |  array_to_string(toks[start + 1 : start + 64], ' ') AS chunk
           |FROM st ORDER BY doc_id, chunk_idx""".stripMargin))


  /** X4q — cross-document boilerplate removal (ops/TextOps.boilerplate):
    * width-3 word chunks occurring verbatim in ≥ 5 distinct documents
    * are template text; per doc, the chunk counts and the reassembled
    * clean text. One explode ∝ corpus words / 3, one hash-keyed
    * count-distinct, one doc-keyed reassembly. */
  val x4Boilerplate = QuerySpec("x4_boilerplate",
    (s, d) => TextOps.boilerplate(T(s, d, "documents"), "doc_id", "text",
        3, 5L)
      .orderBy(col("doc_id")),
    Some("""-- nonneg-div(1): counts/rank sums only
           |WITH d AS (
           |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |n AS (SELECT doc_id, ws, (len(ws) + 2) // 3 AS nch
           |  FROM d WHERE len(ws) >= 1),
           |u AS (SELECT doc_id, ws,
           |    unnest(generate_series(0, nch - 1)) AS i
           |  FROM n),
           |c AS (SELECT doc_id, i AS idx,
           |    array_to_string(ws[(i * 3 + 1):(i * 3 + 3)], ' ') AS chunk
           |  FROM u),
           |hh AS (SELECT doc_id, idx, chunk, md5(chunk) AS h FROM c),
           |f AS (SELECT h FROM hh GROUP BY h
           |  HAVING count(DISTINCT doc_id) >= 5),
           |v AS (SELECT hh.doc_id, hh.idx, hh.chunk,
           |    CASE WHEN f.h IS NULL THEN 0 ELSE 1 END AS boiler
           |  FROM hh LEFT JOIN f ON hh.h = f.h)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           |  CAST(sum(boiler) AS BIGINT) AS n_boiler,
           |  coalesce(string_agg(CASE WHEN boiler = 0 THEN chunk END,
           |    ' ' ORDER BY idx), '') AS clean_text
           |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    bench = true)


  /** X4v — deterministic token masking (ops/TextOps.maskTokens): ~15%
    * of tokens (9830/65536) replaced by md5-position draws; the oracle
    * replays every draw and the masked text's md5 — byte-identical
    * augmentation proven through the fingerprint. */
  val x4MaskTokens = QuerySpec("x4_mask_tokens",
    (s, d) => TextOps.maskTokens(T(s, d, "documents"), "text", "doc_id",
        9830)
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
           |  md5(array_to_string(list_transform(string_split(text, ' '),
           |    (t, i) -> CASE WHEN ('0x' || substr(md5(
           |        CAST(doc_id AS VARCHAR) || ':' ||
           |        CAST(i - 1 AS VARCHAR)), 1, 4))::BIGINT < 9830
           |      THEN '<mask>' ELSE t END), ' ')) AS masked_md5,
           |  CAST(len(list_filter(string_split(text, ' '),
           |    (t, i) -> ('0x' || substr(md5(
           |        CAST(doc_id AS VARCHAR) || ':' ||
           |        CAST(i - 1 AS VARCHAR)), 1, 4))::BIGINT < 9830))
           |    AS BIGINT) AS n_masked,
           |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           |FROM documents ORDER BY doc_id""".stripMargin))
}
