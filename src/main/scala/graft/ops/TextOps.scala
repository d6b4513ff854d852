package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X4 — text analysis operators for a training-data pipeline (driver north
  * star): token statistics, quality scoring, language-ID heuristic,
  * BPE-ish regex tokenization, and content fingerprinting.
  *
  * Everything is built-in column expressions over one scan — at 100 TB
  * these run as a single narrow projection stage with no shuffle at all
  * (the groupBys in the derived queries aggregate tiny outputs).
  */
object TextOps {

  /** English stopword markers used by the quality score and language-ID
    * heuristic (tiny on purpose — deterministic and oracle-portable). */
  val enStopwords: Seq[String] = Seq("the", "a", "of", "and")

  private val stopList = enStopwords.map(s => s"'$s'").mkString("(", ",", ")")

  /** Whitespace token count, stopword count, average token length, stopword
    * ratio, and a [0,1] quality score (length component + stopword
    * component). Adds columns; keeps the input columns. */
  def withTextStats(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        expr(s"size(filter(toks, t -> t IN $stopList))"))
      .withColumn("avg_token_len",
        round((length(col(textCol)) - (col("n_tokens") - 1)) / col("n_tokens"), 6))
      .withColumn("stop_ratio", round(col("n_stop") / col("n_tokens"), 6))
      .withColumn("quality",
        round(least(lit(1.0), col("n_tokens") / 100.0) * 0.5 +
          least(lit(1.0), col("n_stop") / 10.0) * 0.5, 6))

  /** Language-ID n-gram heuristic: stopword-marker vote. With >= 2 English
    * marker hits the doc is called 'en', else 'und' (ISO 639-3
    * undetermined). Real corpora would extend the marker lists per
    * language; the operator shape (pure projection) is what matters. */
  def withLangId(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("en_score", expr(
        s"size(filter(split($textCol, ' '), t -> t IN $stopList))"))
      .withColumn("predicted_lang",
        when(col("en_score") >= 2, "en").otherwise("und"))

  /** BPE-ish regex token count: letter runs, digit runs, single
    * punctuation — the classic pre-tokenizer split. */
  def withBpeCount(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("n_bpe",
      expr(s"size(regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))"))

  /** X5b — sequence packing for training batches: assign documents to
    * ~`capacity`-token bins in deterministic (`idCol`) order within each
    * `partKeys` shard. A doc lands in the bin its RUNNING token total
    * (exclusive of itself) falls into — contiguous chunking, so bins fill
    * to capacity and only the straddling doc overflows. Per-shard window
    * (shuffle on partKeys, sort by id), never a global sort: at 100 TB the
    * shard key is the parallelism unit, exactly how packing shards a real
    * corpus. Adds n_tok and bin. */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
      partKeys: Seq[String], capacity: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partKeys.map(col): _*).orderBy(col(idCol))
    docs
      .withColumn("n_tok", size(split(col(textCol), " ")))
      .withColumn("bin",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / capacity))
  }

  /** X4e — repetition-ratio quality signals (the Gopher/RefinedWeb-style
    * repetitious-text filters): fraction of duplicate tokens and duplicate
    * word 3-grams per document. High values flag boilerplate/spam that a
    * training pipeline drops before dedup even runs. Pure narrow
    * projection — no shuffle at any scale. `dup_3gram_frac` is null below
    * 3 tokens (no 3-grams exist; also keeps sequence() from descending).
    * Rounding uses floor(x*1e6+0.5)/1e6 on both engine and oracle: ratios
    * with power-of-two denominators land exactly on .5 ulps where
    * HALF_UP/HALF_EVEN would diverge. */
  def withRepetition(docs: DataFrame, textCol: String): DataFrame = {
    def r6(e: String) = s"floor(($e) * 1e6 + 0.5d) / 1e6"
    docs
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("dup_token_frac",
        expr(r6("1.0d - size(array_distinct(toks)) / n_tok")))
      .withColumn("grams", when(col("n_tok") >= 3, expr(
        "transform(sequence(1, n_tok - 2), " +
          "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))")))
      .withColumn("dup_3gram_frac", when(col("n_tok") >= 3,
        expr(r6("1.0d - size(array_distinct(grams)) / (n_tok - 2)"))))
      .drop("grams")
  }

  /** X4g — PII scrubbing: replace email addresses and long digit runs
    * (card/phone-shaped) with typed placeholder tokens, and count what was
    * redacted per doc (the audit signal a redaction pass must emit).
    * Patterns deliberately use the regex subset Java and RE2 interpret
    * identically (char classes, +, {n,} — no lookaround, no backrefs) and
    * NO backslash escapes ([.] instead of \.): Spark SQL string literals
    * consume backslashes, DuckDB's don't, so an escaped pattern means a
    * DIFFERENT regex on each side. Pure narrow projection — no shuffle at
    * any scale. */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
  val longNumPattern = "[0-9]{9,}"

  def scrubPii(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_emails",
        size(expr(s"regexp_extract_all($textCol, '$emailPattern', 0)")))
      .withColumn("n_longnums",
        size(expr(s"regexp_extract_all($textCol, '$longNumPattern', 0)")))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(col(textCol), emailPattern, "<EMAIL>"),
          longNumPattern, "<NUM>"))

  /** X5d — deterministic weighted source interleaving: the training-order
    * schedule for a multi-source corpus. Each source's i-th document
    * (1-based, ordered by `idCol`) is scheduled at position i/weight, so a
    * weight-2 source appears twice as densely in the merged order as a
    * weight-1 source and sampling ratios hold in every prefix of the
    * schedule — the curriculum-mixing op (cf. the mixture weighting in
    * GPT-3/Pile-style training-data recipes). Deterministic: no RNG, the
    * same schedule on every engine. One per-source window; consumers sort
    * by (sched, source, id) — the same output-sort shape as any
    * write-in-training-order job, which at 100 TB is a range-partitioned
    * sort, not a single-node one. */
  def interleaveBySource(docs: DataFrame, idCol: String, srcCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col(idCol))
    val weightCase = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (s, wt)) => when(col(srcCol) === s, lit(wt)).otherwise(acc)
    }
    docs.withColumn("src_rank", row_number().over(w))
      .withColumn("sched", col("src_rank").cast("double") / weightCase)
  }

  /** X4f — TF-IDF top terms per document: tf = in-doc term count, idf =
    * ln(N/df) over the corpus, keep the `topK` highest-scoring terms per
    * doc (score desc, term asc tie-break — deterministic across engines).
    *
    * Shape at scale: one explode → (doc, term) aggregate, then df as a
    * COUNT window over the same rows (tf rows ARE the distinct (doc,
    * term) pairs) — a single lineage with no self-join, so the corpus is
    * scanned and exploded exactly once (a separate df aggregate branch
    * recomputes the whole chain: Catalyst prunes tf's count out of it,
    * which also defeats AQE exchange reuse — observed, not theoretical).
    * The corpus size N is broadcast as a one-row cross join (never
    * collected to the driver); final per-doc ranking window. Every
    * shuffle key's cardinality grows with the corpus — no all-pairs, no
    * global sort. */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String,
      topK: Int): DataFrame = {
    val terms = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val wDf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", expr(
        "floor(tf * ln(n_docs / df) * 1e6 + 0.5) / 1e6"))
      .withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= topK)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("term_rank"))
  }

  /** Benchmark DECONTAMINATION: flag training documents that share any
    * word n-gram with a held-out benchmark/eval set — the preprocessing
    * step that keeps eval answers out of a training mix (what C4/Llama
    * pipelines run with 8-13-gram overlap). Both sides are reduced to
    * md5 shingle keys and matched with ONE hash equi-join — never a
    * doc × benchmark text comparison: at 100 TB the corpus side shuffles
    * (or Spark broadcasts the benchmark's distinct shingles, which for a
    * real eval suite are tiny), the per-doc hit count is a partial agg,
    * and docs shorter than n tokens are clean by construction. Returns
    * the docs with `n_contaminated` (distinct matching shingles) and a
    * boolean `contaminated`. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, textCol: String,
      idCol: String, n: Int = 8): DataFrame = {
    require(n >= 2 && n <= 32, s"shingle width must be in [2, 32], got $n")
    def shingles(df: DataFrame, keep: Seq[org.apache.spark.sql.Column]) = df
      .withColumn("_ltoks", split(lower(col(textCol)), " "))
      .withColumn("_nlt", size(col("_ltoks")))
      .withColumn("sh", explode(when(col("_nlt") >= n, expr(
        s"transform(sequence(1, _nlt - ${n - 1}), " +
          s"i -> md5(array_join(slice(_ltoks, i, $n), ' ')))"))
        .otherwise(array())))
      .select(keep :+ col("sh"): _*)
    val benchShingles = shingles(benchmark, Seq.empty).distinct()
    // md5-per-shingle is compute-heavy; spread few-split corpus inputs
    val hits = shingles(Scale.fanOut(docs), Seq(col(idCol)))
      .join(benchShingles, "sh")
      .groupBy(col(idCol))
      .agg(countDistinct(col("sh")).as("n_contaminated"))
    docs.join(hits, Seq(idCol), "left")
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contaminated", col("n_contaminated") > 0)
  }

  /** Document fingerprints: md5 of the normalized text (exact-dup key) and
    * the minimum md5 over word 5-gram shingles (rolling-hash analog —
    * stable under small suffix/prefix edits). */
  def withFingerprints(docs: DataFrame, textCol: String): DataFrame =
    Scale.fanOut(docs) // md5-per-shingle is compute-heavy; spread few-split inputs
      .withColumn("fp", md5(lower(col(textCol))))
      .withColumn("ltoks", split(lower(col(textCol)), " "))
      .withColumn("n_lt", size(col("ltoks")))
      .withColumn("minshingle", when(col("n_lt") >= 5, expr(
        "array_min(transform(sequence(1, n_lt - 4), " +
          "i -> md5(concat_ws(' ', ltoks[i-1], ltoks[i], ltoks[i+1], ltoks[i+2], ltoks[i+3]))))")))
}
