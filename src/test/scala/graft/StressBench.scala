package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev/bench-aux main (round 12): measure the text/dedup lanes at REAL
  * row counts. The driver's `documents` fixture is 500 rows at every sf
  * (TESTDATA.md), so every judged x2/x4/x9 wall-time is job overhead and
  * a skew defect in candidate generation is invisible — the r11 judge's
  * capped-generator finding was exactly such a bug. This harness
  * generates a >= 100k-doc synthetic corpus from pure exprs (no data
  * files, no RNG — md5-of-id words, so the corpus is bit-identical on
  * every run) with the three adversarial plants the lanes exist for:
  *
  *  - BOILERPLATE HOT BUCKET: ids % 20 == 0 (5%) share ONE identical
  *    text, so every band/block/shingle bucket they produce is
  *    corpus-wide — the degenerate case the caps must drop streaming.
  *  - NEAR-DUPS: ids % 20 == 6 repeat id-1's text with the last word
  *    changed — must SURVIVE the caps and surface as candidate pairs.
  *  - VERBATIM SPANS: ids % 20 in {7, 8} open with the same unique
  *    12-token span per 20-block (two carriers per span) — the Lee-et-al
  *    case spanPairs must find while boilerplate shingles are capped.
  *
  * Run: `sbt "Test/runMain graft.StressBench [nDocs] [outDir]"`.
  * Emits one JSON line (times, shuffle bytes, result counts); results
  * are recorded in BASELINE.md. Stage list: the four capped candidate
  * generators plus the two judged end-to-end pipelines (x2_dedup_e2e,
  * x9_curation_e2e) replayed over the synthetic corpus via their real
  * QuerySpec fns (the corpus is written as <tmp>/documents.parquet so
  * the judged code paths run unmodified).
  */
object StressBench {

  private final class Listener extends org.apache.spark.scheduler.SparkListener {
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) { shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); () }
    }
  }

  /** k-word deterministic pseudo-text: md5-derived 6-hex-char words. */
  private def words(seed: String, k: Int): String =
    s"array_join(transform(sequence(1, $k), j -> " +
      s"substring(md5(concat($seed, '_', cast(j as string))), 1, 6)), ' ')"

  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val boiler = Seq.tabulate(40)(j => s"boil$j").mkString(" ")
    spark.range(0, n).selectExpr(
      "id as doc_id",
      s"""CASE
         |  WHEN id % 20 = 0 THEN '$boiler'
         |  WHEN id % 20 = 6 THEN concat(array_join(slice(transform(
         |    sequence(1, 40), j -> substring(md5(concat(
         |    cast(id - 1 as string), '_', cast(j as string))), 1, 6)),
         |    1, 39), ' '), ' nearly')
         |  WHEN id % 20 = 7 OR id % 20 = 8 THEN concat(
         |    ${words("concat('sp', cast(id div 20 as string))", 12)},
         |    ' ', ${words("cast(id as string)", 28)})
         |  ELSE ${words("cast(id as string)", 40)}
         |END as text""".stripMargin,
      // lang is constant per 20-block so planted near-dup pairs share
      // their jaccard block (a per-id rule split every pair across langs)
      "CASE WHEN (id div 20) % 10 < 6 THEN 'en' " +
        "WHEN (id div 20) % 10 < 9 THEN 'de' ELSE 'fr' END as lang",
      "concat('s', cast(id % 4 as string)) as source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    // Memory honesty gate (round 20, r19 verdict item 8): the n=1M text
    // lanes hold ~40 standing localCheckpoint frames and OOM a default
    // 8g driver deep into the run (measured, r19). Refuse AT STARTUP
    // with the documented requirement instead — n=100k (the canonical
    // text scale) is unaffected. 20 GiB measured-heap threshold ≈ the
    // usable heap of -Xmx24g after GC reserve.
    if (n > 100000L) {
      val heapGiB = Runtime.getRuntime.maxMemory.toDouble / (1L << 30)
      require(heapGiB >= 20.0,
        f"StressBench at n=$n needs SPARK_DRIVER_MEM>=24g (32g for the " +
          f"1M-node reach stage); this JVM has $heapGiB%.1f GiB heap. " +
          "Re-run with a bigger -Xmx or at n<=100000 — failing fast " +
          "here instead of OOMing mid-run.")
    }
    val out = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_stress").toString
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    corpus(spark, n).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")

    val listener = new Listener
    spark.sparkContext.addSparkListener(listener)
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Long, Long)]
    def stage(name: String)(df: => DataFrame): Unit = {
      listener.shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val cnt = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      results(name) = (dt, cnt, listener.shuffleBytes.get())
      System.err.println(f"[stress] $name%-16s ${dt}%8.2f s  rows=$cnt  " +
        f"shuffle=${listener.shuffleBytes.get() / 1e6}%.1f MB")
    }

    stage("lsh_capped")(ops.Dedup.lshCandidates(
      ops.Dedup.minhash(docs, "text", "doc_id"), "doc_id", maxBucket = 64))
    stage("simhash_capped")(ops.Dedup.simhashCandidates(
      ops.Dedup.simhash(docs, "text", "doc_id"), "doc_id", maxBucket = 64))
    stage("jaccard_capped")(ops.Dedup.jaccardPairs(
      docs, "text", "doc_id", Seq("lang"), maxDf = 64)
      .filter(col("jac") >= 0.5))
    stage("span_capped")(ops.Dedup.spanPairs(
      docs, "text", "doc_id", n = 8, maxOcc = 64))
    stage("dedup_e2e")(Queries.byName("x2_dedup_e2e").fn(spark, out))
    stage("curation_e2e")(Queries.byName("x9_curation_e2e").fn(spark, out))

    // ---- round-14 lanes ----
    // winnowing: near-dup plants share a 39-token verbatim prefix and
    // span plants a 12-token run — both >= w+k-1 = 11, so each MUST
    // share a fingerprint; boilerplate fingerprints occur n/20 > maxOcc
    // times and are capped out of the pair join
    stage("winnow_fp")(ops.Dedup.winnow(docs, "text", "doc_id", k = 4, w = 8))
    stage("winnow_pairs")(ops.Dedup.winnowPairs(docs, "text", "doc_id",
      k = 4, w = 8, maxOcc = 64, minShared = 1))
    // prefix-filtered EXACT threshold Jaccard join: run over the corpus
    // minus the boilerplate clique (an exact join's output on a 5%
    // identical-text clique is C(n/20, 2) pairs — correct but quadratic
    // BY CONTRACT; real pipelines collapse exact dups first, see
    // dedupPipeline). The remaining expected output is the planted
    // near-dup pairs.
    val noBoiler = docs.filter(col("doc_id") % 20 =!= 0)
    stage("jaccard_prefix")(ops.Dedup.prefixJaccardPairs(
      noBoiler, "text", "doc_id", k = 4, tNum = 1, tDen = 2))
    // heavy hitters over the full token stream: vocabulary ~3.4M distinct
    // md5 words at n=100k (the naive groupBy's shuffle), 41 planted hot
    // tokens (40 boilerplate words + 'nearly', each n/20 = N/800
    // occurrences); k=1024 puts the threshold at N/1025 just under the
    // plant count, so the exact answer is precisely the 41 plants
    val tokStream = docs.select(
      explode(split(lower(col("text")), " ")).as("tok"))
    stage("heavy_hitters")(ops.Sketch.heavyHitters(tokStream, "tok", 1024))
    stage("hh_naive")(tokStream.groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tokStream.groupBy().agg(count(lit(1)).as("n"))))
      .filter(col("cnt") * 1025 > col("n")))

    // per-group heavy hitters (round 14 cont.): same plant, same
    // threshold ratio PER LANGUAGE (boilerplate docs spread evenly over
    // the 3 langs, so each plant is ~1/800 of ITS lang's stream too) —
    // the grouped lane must find exactly the 41 plants in each of the 3
    // langs while keeping the shuffle candidates-only per (partition,
    // group)
    stage("hh_by")(ops.Sketch.heavyHittersBy(
      docs.select(col("lang"),
        explode(split(lower(col("text")), " ")).as("tok")),
      "tok", "lang", 1024))
    // domain-shift TV per lang at stress vocabulary (~3.4M distinct
    // md5 words at n=100k): the token-keyed count/join frames ARE the
    // vocabulary — the measured cost of the fold that avoids the
    // |groups|x|vocab| completion
    stage("domain_shift")(ops.TextOps.domainShift(docs, "text", "lang"))
    // PMI with the df gate doing its job: boilerplate + 'nearly' tokens
    // have df = n/20 >> 64 and MUST be gated out BEFORE the self-join
    // (the d-squared fan-out kill); what survives is the planted family
    // structure — the span plants' 12 shared sp-words (df = 2, C(12,2)
    // pairs per block) and the near-dup plants' 39 shared words
    // (C(39,2) per block), each co-occurring exactly twice
    stage("pmi_gated")(ops.TextOps.pmiPairs(
      docs, "text", "doc_id", minDf = 2, maxDf = 64, minSupport = 2))
    // the SAME corpus and eval set (docs with id % 1000 == 3, ~n/1000).
    // The measured contrast is the point: the exact lane shuffles every
    // corpus shingle into the join; the bloom lane's only shuffle is the
    // per-doc count agg.
    val evalSet = docs.filter(col("doc_id") % 1000 === 3).select(col("text"))
    val trainSet = docs.filter(col("doc_id") % 1000 =!= 3)
    stage("decon_exact")(ops.TextOps.decontaminate(
      trainSet, evalSet, "text", "doc_id", n = 5).filter(col("contaminated")))
    // m=2^16 is DELIBERATELY undersized for this eval set (18 bits per
    // benchmark shingle): the measured doc-level false-drop rate is the
    // evidence behind decontaminateBloom's m-sizing rule. m=2^20 is the
    // sized filter (~290 bits/shingle) — flags must match exact.
    stage("decon_bloom_u16")(ops.TextOps.decontaminateBloom(
      trainSet, evalSet, "text", "doc_id", n = 5, k = 3, m = 1 << 16)
      .filter(col("contaminated")))
    // the SIZED filter scales with the corpus (round 19): m = 2^20 was
    // sized for the n=100k eval set (~291 bits/shingle); a fixed m
    // probed at 10x the load is off-model BY THE MODEL (measured at
    // n=1M: 31,607 doc FPs = probes*(k*S/m)^3 exactly) — the operator's
    // own m-sizing rule says grow m with the eval set, which keeps
    // bits/shingle and the per-probe FP constant so doc FPs stay
    // proportional to probes (~40 at n=1M). n=100k behavior unchanged.
    val mSized = {
      val want = (1L << 20) * math.max(1L, n / 100000L)
      var mm = 1L << 20
      while (mm < want) mm <<= 1
      // r19 ADVICE: past 2^30 the Int narrowing below would wrap
      // negative (n > ~100G docs at this sizing rule) and hand
      // decontaminateBloom a nonsense width — fail loudly instead
      require(mm <= (1L << 30),
        s"bloom width $mm exceeds Int-safe 2^30 at n=$n; shard the " +
          "filter or raise bits-per-shingle before scaling further")
      mm.toInt
    }
    stage("decon_bloom_20")(ops.TextOps.decontaminateBloom(
      trainSet, evalSet, "text", "doc_id", n = 5, k = 3, m = mSized)
      .filter(col("contaminated")))

    // ---- char-trigram langid at corpus scale (round 20, r19 verdict
    // item 6): the synthetic md5 text carries no language signal, so
    // the corpus is salted with a deterministic per-lang character
    // marker — which makes ACCURACY a contract, not a hope: the NB
    // trigram stats trained on the 80% split must classify EVERY
    // held-out doc's language correctly, and the held-out row count
    // must equal the split size exactly. The stream is ~240 chars/doc
    // of trigrams (~24M gram rows at n=100k) — the ONE corpus-sized
    // shuffle the operator's scale contract allows.
    stage("langid_100k") {
      val salted = docs.withColumn("text",
        concat(col("text"), expr("repeat(concat(' q', lang, 'tag'), 4)")))
      ops.TextOps.langId(salted, "text", "doc_id", "lang",
        trainFilter = col("doc_id") % 5 =!= 0, n = 3)
    }
    locally {
      val salted = docs.withColumn("text",
        concat(col("text"), expr("repeat(concat(' q', lang, 'tag'), 4)")))
      val pred = ops.TextOps.langId(salted, "text", "doc_id", "lang",
        trainFilter = col("doc_id") % 5 =!= 0, n = 3)
      val r = pred.join(docs.select(col("doc_id"), col("lang")),
          Seq("doc_id"))
        .agg(count(lit(1)),
          sum(when(col("predicted") === col("lang"), 1L).otherwise(0L)))
        .collect().head
      val (total, correct) = (r.getLong(0), r.getLong(1))
      require(total == (n + 4) / 5,
        s"langid must classify every held-out doc: $total of ${(n + 4) / 5}")
      require(correct == total,
        s"langid missed the planted language marker: $correct/$total")
      System.err.println(s"[stress] langid_contract  acc=$correct/$total")
    }

    // ---- triangle counting on a deliberately skewed graph: one hub of
    // degree n/2 (spokes + a leaf chain closing ~n/2 hub triangles) plus
    // (n/2)/10 disjoint 10-cliques (120 triangles each). The orientation
    // sends every spoke INTO the hub, so the hub generates ZERO wedges —
    // naive center-joined wedges would be C(n/2, 2) rows at the hub
    // alone (12.5M at n=10k, 1.25G at n=100k), which is why the naive
    // stage runs at a fixed small n while the oriented one runs at full n.
    def skewGraph(m: Long): DataFrame = {
      val spokes = spark.range(1, m / 2)
        .selectExpr("cast(0 as long) as src", "id as dst")
      val chain = spark.range(1, m / 2 - 1)
        .selectExpr("id as src", "id + 1 as dst")
      // clique-top ids (and a possible last id) are filtered OUT before
      // the sequence: for them start > stop, and Spark's sequence()
      // defaults to step -1 — emitting a self-loop plus a bridge edge
      // into the NEXT clique (review finding; the same inverted-sequence
      // trap weightedSample's weight filter guards against)
      val cliques = spark.range(m / 2, m)
        .filter(s"id % 10 <> 9 AND id < ${m - 1}")
        .selectExpr("id as src",
          s"explode(sequence(id + 1, least((id div 10) * 10 + 9, ${m - 1}))) as dst")
      spokes.unionAll(chain).unionAll(cliques)
    }
    def naiveTriangles(edges: DataFrame): DataFrame = {
      val und = edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val adj = und.unionAll(und.select(col("b").as("a"), col("a").as("b")))
      val wedges = adj.select(col("a").as("c"), col("b").as("x"))
        .join(adj.select(col("a").as("c"), col("b").as("y")), Seq("c"))
        .filter(col("x") < col("y"))
      // each triangle closes exactly ONE wedge per corner, so counting
      // the CENTER (not all three nodes) yields per-node participation
      // identical to Graph.triangles — exploding all corners would
      // triple-count (review finding)
      wedges.join(und.select(col("a").as("x"), col("b").as("y")),
          Seq("x", "y"))
        .select(col("c").as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
    }
    stage("tri_oriented")(ops.Graph.triangles(skewGraph(n)))
    stage("tri_oriented_10k")(ops.Graph.triangles(skewGraph(10000L)))
    stage("tri_naive_10k")(naiveTriangles(skewGraph(10000L)))

    // ---- tick-series lanes (round 14 cont.): the driver's events
    // fixture is 10k rows at sf0.01, so the judged x8 wall-times are job
    // overhead; this corpus is 10·n one-second ticks over 150 keys with
    // a DELIBERATE hot key holding HALF the stream (window skew rides
    // the key distribution — the claim the drawdown/anomaly scaladocs
    // make, measured here). Even ids → key 0; odd ids spread over 149
    // keys (consecutive odd ids cover all residues mod 149, so every
    // key is in every hourly bucket, deterministically).
    val nTicks = 10L * n
    def ticks(centsExpr: String): DataFrame =
      spark.range(0, nTicks).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 0L ELSE 1L + id % 149 END AS k",
        "id AS tie", "id * 1000000L AS us", s"$centsExpr AS cents")
        .withColumn("ts", timestamp_micros(col("us")))
    // sawtooth with a planted spike every 100k ticks: the hot key ramps
    // 1000→1490 step 10 (its even ids walk the even residues), the
    // other keys ramp 1001→1099 over the odd residues — so each key's
    // max drawdown is its own sawtooth reset, EXACTLY 490 (hot) / 98
    // (each of the 149 others): sum over keys = 490 + 149·98 = 15092.
    val saw = ticks("1000L + (id % 100) * (CASE WHEN id % 2 = 0 " +
      "THEN 5L ELSE 1L END) + (CASE WHEN id % 100000 = 50000 " +
      "THEN 10000L ELSE 0L END)")
    stage("drawdown")(ops.TimeSeries.maxDrawdown(
      saw.filter(col("tie") % 100000 =!= 50000), // spikes out: pure saw
      "k", "ts", "tie", col("cents")))
    // anomaly: the 15-tick trailing median/MAD must recover every
    // planted +10000 spike; sawtooth RESETS (a 33% local crash) also
    // flag — correctly, that IS a local anomaly — so the assert is
    // recovery, not equality
    stage("anomaly_ticks")(ops.TimeSeries.robustAnomalies(
      saw, "k", "ts", "tie", col("cents")).filter(col("is_anom")))
    // corr vs index: cents depend on the BUCKET alone, so every key's
    // hourly close equals v(b) = 1000 + (b % 100), the index is
    // |keys|·v(b), and every key is EXACTLY affine in the index →
    // corr must be 1.0 (up to the final double normalization) for all
    // 150 keys
    stage("index_corr")(ops.TimeSeries.corrVsIndex(
      ticks("1000L + (id div 3600) % 100"),
      "k", "ts", "tie", col("cents"), 3600000000L))

    // ---- k-core on the same skewed graph: the 10-cliques are each a
    // complete 9-core (every member degree 9); chain/spoke nodes carry
    // degree <= 3 and peel in round 1, stranding the degree-n/2 HUB with
    // zero surviving edges — it peels in round 2. Synchronous peeling
    // removes the whole under-k frontier per round, so the hub's raw
    // degree buys it exactly ONE extra round, not n/2 — and the result
    // must be exactly the n/2 clique nodes at core_deg 9.
    stage("kcore_9")(ops.Graph.kCore(skewGraph(n), 9, 3))

    // ---- ANN at 10·n vectors (dim 16): the similarity-search scale
    // story MEASURED, not argued. Corpus vectors are integer-hash
    // deterministic; each of 200 queries is a corpus vector with one
    // component nudged +0.001 — its exact nearest neighbor is its
    // source (nudge ≪ typical NN distance at this density), so IVF
    // recall@1 of the planted source is a hard, checkable number. The
    // exact brute-force pass over the same queries gives the honest
    // exact-vs-IVF wall ratio at corpus scale.
    val nVec = 10L * n
    // murmur3 hash(id, d): nonlinear, so vectors are unique w.h.p. —
    // a modular-linear formula here has period 1000 in id and floods
    // the corpus with exact duplicates, destroying the plant
    def vecSql(idExpr: String, nudge: Boolean) = {
      val bump = if (nudge) " + if(d = 0, 0.001d, 0.0d)" else ""
      s"transform(sequence(0, 15), d -> cast((pmod(hash($idExpr, d), " +
        s"1000) - 500) / 1000.0$bump as float))"
    }
    val corpusV = spark.range(0, nVec)
      .selectExpr("id AS vec_id", s"${vecSql("id", nudge = false)} AS embedding")
    val qStep = nVec / 200
    val queriesV = spark.range(0, 200)
      .selectExpr(s"id * $qStep AS src_id")
      .selectExpr(s"src_id + $nVec AS vec_id",
        s"${vecSql("src_id", nudge = true)} AS embedding")
    stage("ann_ivf_hits")(ops.Similarity.ivfTopK(
      queriesV, corpusV, 1, nCentroids = 64, nProbe = 8)
      .filter(col("vec_id") === col("query_id") - nVec))
    stage("ann_exact_hits")(ops.Similarity.bruteForceTopK(
      queriesV, corpusV, 1)
      .filter(col("vec_id") === col("query_id") - nVec))
    // the compressed tier: IVF-PQ at m=8/ks=16 (4 bytes of code per
    // vector, 4x compression over int8, 16x over float32). PQ's
    // contract is a COARSE CUT, not a final ranking: at m=4 the
    // quantization radius on this CLUSTERLESS corpus (uniform hash
    // vectors — PQ's worst case, nothing for the codebook to exploit)
    // swamps the 0.001 plant entirely (measured recall@1 = 9/200,
    // recall@20 = 77/200); m=8 halves the subspace width and lifts the
    // k=20 cut to 166/200. The floor asserts the measured band — the
    // tier keeps 3/4+ of planted neighbors in the cut the exact rerank
    // stage (x3_rerank composition) then resolves; real embedding
    // corpora cluster, which is the structure PQ codebooks exploit.
    // The cut size SCALES with corpus density (k = nVec/10000, min 20):
    // quantization collisions grow with occupancy, so a fixed cut
    // measurably decays (116/200 at 1M with k=20) while the scaled cut
    // holds the band — cut-size-proportional-to-collisions is the
    // deployment rule this measurement pins.
    val pqK = math.max(20L, nVec / 10000L).toInt
    stage("ann_ivfpq_cut")(ops.Similarity.ivfPqTopK(
      queriesV, corpusV, pqK, dim = 16, m = 8, ks = 16,
      nCentroids = 64, nProbe = 8)
      .filter(col("vec_id") === col("query_id") - nVec))

    // ---- round-14 additions: boilerplate, CUSUM, capped baskets.
    // boilerplate: the corpus plants an IDENTICAL 40-word template doc
    // every 20 ids (n/20 docs sharing every chunk); md5-word docs are
    // chunk-unique and the near-dup/span families repeat across only
    // 2 docs (< minDocs) — so the docs-with-boilerplate count must be
    // EXACTLY the planted population, nothing stripped from the rest.
    stage("boilerplate")(ops.TextOps.boilerplate(
      docs, "doc_id", "text", 4, 10L).filter(col("n_boiler") > 0))
    // CUSUM on the spiked sawtooth: every +10000 plant fires the up-side
    // at the spike tick and the down-side at the key's next tick (hand
    // computation in the require below); sawtooth steps and resets stay
    // under slack — zero alarms besides the plants.
    stage("cusum_ticks")(ops.TimeSeries.cusum(
      saw, "k", "ts", "tie", col("cents"), 4000L, 5000L)
      .filter(col("alarm") === 1))
    // capped basket mining: n 4-item baskets with a planted (1, 2) pair
    // in every 10th basket, plus ONE 5000-item mega-basket that would
    // alone emit 12.5M pairs — the cap must drop it BEFORE the fan-out,
    // leaving exactly the planted pair above the n/20 support floor.
    val baskets = spark.range(0, 4 * n).selectExpr(
        "id div 4 AS bk",
        "CASE WHEN (id div 4) % 10 = 0 AND id % 4 < 2 " +
          "THEN cast(id % 4 + 1 as string) " +
          "ELSE cast((id * 2654435761) % 1000 as string) END AS item")
      .unionAll(spark.range(0, 5000).selectExpr(
        "-1L AS bk", "cast(id as string) AS item"))
    stage("basket_capped")(ops.Basket.pairCounts(
      baskets, "bk", "item", maxBasket = 64, minSupport = n / 20))

    // ---- round-15 lanes: capped SemDeDup kernel, star-contraction
    // chain inside the e2e pipeline, graph operators at 100k AND 1M ----
    //
    // (A) SemDeDup two-tier kernel under its two adversarial plants
    // (dim 16, 64 sampled centroids = the 64 lowest vec_ids):
    //  - EXACT-DUP CELL: 5,000 byte-identical copies of vector 17 —
    //    tier 1 must collapse them to rep->member STAR edges (5,000
    //    linear rows), never (5k choose 2) pairing;
    //  - HOT DISTINCT CELL: 5,000 distinct nudges of centroid 0's own
    //    vector, all assigned to cell 0 — pushes cell 0's rep census
    //    (~n/64 background + 5,000) over maxCell=4096, so tier 2 must
    //    DROP that cell's pairing while every ordinary ~n/64-rep cell
    //    still pairs. Background vectors are uniform hash vectors, so
    //    tau=0.9 pairs among them are ~absent: the capped output IS the
    //    planted star, bounded, with the quadratic kernel never run on
    //    the hot cell.
    def vec16(idExpr: String, nudgeExpr: String): String =
      s"transform(sequence(0, 15), d -> cast((pmod(hash($idExpr, d), " +
        s"1000) - 500) / 1000.0 + if(d = 0, $nudgeExpr, " +
        "cast(0.0 as double)) as float))"
    val semBg = spark.range(0, n).selectExpr(
      "id AS vec_id", s"${vec16("id", "0.0d")} AS embedding")
    val semDup = spark.range(0, 5000).selectExpr(
      s"$n + id AS vec_id", s"${vec16("17L", "0.0d")} AS embedding")
    val semHot = spark.range(0, 5000).selectExpr(
      s"$n + 5000 + id AS vec_id",
      s"${vec16("0L", "(id + 1) * 0.000001d")} AS embedding")
    stage("semdedup_capped")(ops.Similarity.semDedupPairs(
      semBg.unionAll(semDup).unionAll(semHot), 64, 0.9, maxCell = 4096))
    // the UNCAPPED contrast at n/10 background (the tri_naive pattern:
    // the quadratic variant runs at a fixed small scale): the hot cell's
    // (5k + n/640) reps pair all-vs-all — ≥ C(5000,2) ≈ 12.5M rows out,
    // the blowup the cap exists to stop, measured
    val semHotSmall = spark.range(0, 5000).selectExpr(
      s"${n / 10} + id AS vec_id",
      s"${vec16("0L", "(id + 1) * 0.000001d")} AS embedding")
    stage("semdedup_uncapped")(ops.Similarity.semDedupPairs(
      spark.range(0, n / 10).selectExpr(
          "id AS vec_id", s"${vec16("id", "0.0d")} AS embedding")
        .unionAll(semHotSmall),
      64, 0.9, maxCell = Int.MaxValue))

    // (A') perceptual-hash pairing under the TEMPLATE-IMAGE flood: the
    // boilerplate docs (ids % 20 == 0, one shared text) render to just
    // TWO distinct images at n/160-copy multiplicity each (width =
    // 8 + doc_id % 8 cycles {8, 12} on multiples of 20) — identical
    // pixels => identical 56-bit hash => every block bucket is a hot
    // bucket. maxBucket=64 must drop them BEFORE pairing (identical
    // images are exact-dup territory — collapse by hash, don't
    // enumerate C(n/160, 2) pairs); the unbounded contrast at n/10
    // emits the quadratic the cap removes.
    val imgDocs = ops.Multimodal.withPpmPayload(docs, "text", "doc_id")
    stage("phash_capped")(ops.Multimodal.phashPairs(
      ops.Multimodal.phash(spark, imgDocs, "doc_id"), "doc_id",
      maxBucket = 64))
    val imgSmall = ops.Multimodal.withPpmPayload(
      docs.filter(col("doc_id") < n / 10), "text", "doc_id")
    stage("phash_uncapped")(ops.Multimodal.phashPairs(
      ops.Multimodal.phash(spark, imgSmall, "doc_id"), "doc_id"))

    // (B) 1k-long CHAIN through the JUDGED e2e pipeline (r14 verdict
    // #2's Done gate): sliding-window docs — doc i = tokens w_i..w_i+39
    // — give consecutive docs Jaccard ≈ 0.95, so LSH chains them; the
    // longest band-collidable shortcut spans ≤ 39 docs, so the pair
    // graph's diameter is ≥ 999/39 ≈ 26 — ABOVE min-label components'
    // 20-round budget, and exactly the shape dedupPipeline's switch to
    // large-star/small-star contraction exists for.
    val chainDocs = spark.range(0, 1000).selectExpr(
        "id AS doc_id",
        "array_join(transform(sequence(id, id + 39), " +
          "j -> substring(md5(cast(j as string)), 1, 6)), ' ') AS text")
      .localCheckpoint()
    stage("chain_e2e")(ops.Dedup.dedupPipeline(chainDocs, "text", "doc_id"))
    val chainPairs = ops.Dedup.lshCandidates(
      ops.Dedup.minhash(chainDocs, "text", "doc_id"), "doc_id", 64)
    val (chainLabels, chainRounds) = ops.Dedup.componentsStarWithRounds(
      chainDocs.select(col("doc_id")), chainPairs, "doc_id")
    val chainClusters = chainLabels.select("cluster").distinct().count()
    System.err.println(
      s"[stress] chain: $chainRounds star rounds, $chainClusters clusters")
    require(chainRounds <= 15,
      s"star contraction should close a 1k chain in <= 15 rounds, " +
        s"took $chainRounds")
    require(chainClusters <= 5,
      s"1k sliding-window chain should resolve to ~1 cluster, " +
        s"got $chainClusters")
    // the O(diameter) resolver CANNOT close this chain inside its
    // 20-round budget — it must fail LOUDLY (its contract), which is
    // the measured reason dedupPipeline now rides componentsStar
    val minLabelFails =
      try {
        ops.Dedup.components(chainDocs.select(col("doc_id")), chainPairs,
          "doc_id").count()
        false
      } catch { case _: IllegalArgumentException => true }
    require(minLabelFails,
      "expected min-label components to exceed its 20-round budget on " +
        "the 1k chain (diameter >= 26)")

    // (B'') linkPredict under the HUB: the skew graph's degree-n/2 hub
    // is the wedge-quadratic — capped (maxDeg 64) the hub is dropped as
    // a center and only chain wedges survive (~n/2 second-neighbor
    // pairs); uncapped at n = 10k the hub alone emits C(5k, 2) ≈ 12.5M
    // predicted pairs. Same cap-before-join discipline as semdedup/phash.
    val lpG = skewGraph(10000L)
    stage("linkpred_capped")(ops.Graph.linkPredict(lpG, maxDeg = 64,
      minCommon = 1L))
    stage("linkpred_uncapped")(ops.Graph.linkPredict(lpG,
      maxDeg = Int.MaxValue, minCommon = 1L))

    // (B''') scc at 100k nodes: 10k disjoint 10-rings — every inner
    // min-label round is one node-keyed join, a ring's color closes in
    // ring-length rounds, and ONE outer round extracts every ring in
    // PARALLEL (the color classes peel independently). Labels are
    // checked exactly: scc_id == ring base for every node.
    // CONSTRUCT INSIDE the stage timer (the r16 betweenness/reach
    // correction): scc's per-round checkpoints run at construction
    // under AQE, so a pre-built frame would leave only the final read
    // inside the timer (measured 0.09 s vs the honest multi-second run)
    val ringsN = 100000L
    val rings = spark.range(ringsN).selectExpr("id as src",
      "(id div 10) * 10 + (id % 10 + 1) % 10 as dst")
    var sccLabels: DataFrame = null
    stage("scc_100k") {
      sccLabels = ops.Graph.scc(rings)
      sccLabels
    }
    require(sccLabels.filter(col("scc_id") =!= expr("(node div 10) * 10"))
        .isEmpty,
      "scc labels on the 10-ring graph must be the ring base")

    // (B'''+) scc on ONE 100k-node directed ring — diameter 10⁵, the
    // r16 verdict's killer shape: the hook-only color loop needed one
    // round per hop and aborted at maxInner=40; the round-17 Wyllie
    // pointer-doubling prefix-min closes both inner loops in ~log2(1e5)
    // ≈ 17 rounds. Labels checked exactly: one component, all 0.
    val bigRing = spark.range(ringsN).selectExpr("id as src",
      s"(id + 1) % $ringsN as dst")
    var ringLabels: DataFrame = null
    stage("scc_ring_100k") {
      ringLabels = ops.Graph.scc(bigRing)
      ringLabels
    }
    require(ringLabels.filter(col("scc_id") =!= 0L).isEmpty,
      "the 100k directed ring must be ONE component labeled 0")

    // (C) graph operators at 100k AND 1M nodes (the dedup lanes' 10x
    // scaling table, for graphs): same skew-graph generator — one
    // degree-n/2 hub, a chain, and n/20 disjoint 10-cliques; ~3.25M
    // edges at 1M nodes. Shuffle must scale ∝ edges (each round is one
    // equi-join + one partial-combining agg on node ids), rounds stay
    // fixed by construction (iters / unrolled peels / frontier hops).
    Seq(100000L, 1000000L).foreach { m =>
      val tag = if (m >= 1000000L) "1m" else "100k"
      val g = skewGraph(m)
      stage(s"pagerank_dangling_$tag")(ops.Graph.pageRankDangling(g, 5))
      stage(s"ppr_$tag")(ops.Graph.personalizedPageRank(g,
        spark.range(3).selectExpr(s"id * ${m / 3} AS node"), 5))
      stage(s"bfs_$tag")(ops.Graph.bfsHops(g,
        spark.range(1).selectExpr("cast(0 as long) AS node"), 10))
      // weighted sibling of the BFS point: same hub component, integer
      // weights (dst mod 7 + 1), 10 relaxation rounds — reach must equal
      // BFS reach (weights don't change reachability)
      stage(s"sssp_$tag")(ops.Graph.sssp(
        g.withColumn("w", pmod(col("dst"), lit(7L)) + 1),
        spark.range(1).selectExpr("cast(0 as long) AS node"), 10))
      require(results(s"sssp_$tag")._2 == m / 2,
        s"SSSP from the hub should reach exactly ${m / 2} nodes: " +
          s"${results(s"sssp_$tag")._2}")
      stage(s"kcore_$tag")(ops.Graph.kCore(g, 9, 3))
      // round-15: HITS (2 max-normalized rounds — the pageRank iterative
      // shape doubled) must score every node on at least one side
      stage(s"hits_$tag")(ops.Graph.hits(g, 2))
      require(results(s"hits_$tag")._2 == m,
        s"HITS should score all $m nodes: ${results(s"hits_$tag")._2}")
      // round-15: assortativity — the hub-to-leaf structure dominates
      // the degree moments, so the skew graph must read DISASSORTATIVE
      // (negative ppm, within the Pearson band) at every scale
      // checkpointed so the band assertion reuses the staged result
      // instead of recomputing the 1-row statistic (round-15 review)
      val assortDf = ops.Graph.assortativity(g)
        .localCheckpoint(eager = false)
      stage(s"assort_$tag")(assortDf)
      val asp = assortDf.collect().head
      require(!asp.isNullAt(1) && asp.getLong(1) < 0L &&
          asp.getLong(1) >= -1000000L,
        s"skew graph must be disassortative in band: $asp")
      // the hub component = hub + spokes/chain (m/2 nodes); cliques are
      // disjoint — BFS from the hub must cover exactly its component
      require(results(s"bfs_$tag")._2 == m / 2,
        s"BFS from the hub should reach exactly ${m / 2} nodes: " +
          s"${results(s"bfs_$tag")._2}")
      // the 9-core is exactly the clique population at any scale
      require(results(s"kcore_$tag")._2 == m / 2,
        s"9-core should be exactly the ${m / 2} clique nodes: " +
          s"${results(s"kcore_$tag")._2}")
      // every node carries a rank row (dangling mass redistributed)
      require(results(s"pagerank_dangling_$tag")._2 == m - 1 ||
          results(s"pagerank_dangling_$tag")._2 == m,
        s"pagerank should rank every node: " +
          s"${results(s"pagerank_dangling_$tag")._2}")

      // ---- round-16 additions: weighted PR / betweenness / reach ----
      val sym = g.unionAll(g.select(col("dst").as("src"),
        col("src").as("dst")))
      // weighted PR: same iteration ledger as pageRank, weights riding
      // the static edge frame — every node scored (symmetrized)
      stage(s"pagerank_weighted_$tag")(ops.Graph.pageRankWeighted(
        sym.withColumn("w", pmod(col("dst"), lit(7L)) + 1), 3))
      require(results(s"pagerank_weighted_$tag")._2 == m,
        s"weighted pagerank should score all $m nodes: " +
          s"${results(s"pagerank_weighted_$tag")._2}")
      // 3-source Brandes over 3 hops: state must stay O(sources×reach),
      // and the hub — the cut vertex between every spoke pair — must
      // carry the maximum dependency mass
      // CONSTRUCT INSIDE the stage timer: under AQE, localCheckpoint
      // (eager = false) materializes every non-final query stage at
      // construction (AdaptiveSparkPlanExec.execute() resolves all
      // stages) — a pre-constructed frame would leave only the cheap
      // tail inside the timer (measured: 0.3 s vs the honest 17 s at
      // 1M). The follow-up collects reuse the now-hot checkpoints.
      var btw: DataFrame = null
      stage(s"betweenness_$tag") {
        btw = ops.Graph.betweenness(sym,
          spark.range(3).selectExpr(s"id * ${m / 3} AS node"), 3)
        btw
      }
      val btwTop = btw.orderBy(col("bc_ppm").desc).limit(1)
        .collect().head
      require(btwTop.getLong(0) == 0L && btwTop.getLong(1) > 0L,
        s"the hub must be the betweenness maximum: $btwTop")
      // HyperANF reach: 64-register state per node FOREVER; the curve
      // must grow monotonically and saturate toward the hub component.
      // Hop 3 at 1M would fan ~7.8M edges x 64 saturated registers — the
      // documented per-hop cost — so the 1M point runs 2 hops. Even at
      // 2 hops the hub component's 500k sketches all saturate (~32M
      // register rows), which on top of this run's ~40 standing
      // localCheckpoint frames needs SPARK_DRIVER_MEM=32g (the default
      // 8g OOMs here, measured) — on a real cluster this is ordinary
      // executor-storage headroom, not a driver concern.
      val hops = if (m >= 1000000L) 2 else 3
      var reach: DataFrame = null
      stage(s"reach_$tag") {
        reach = ops.Graph.neighborhoodFunction(sym, hops)
        reach
      }
      val curve = reach.orderBy(col("h"))
        .select(col("sum_est_fp")).collect().map(_.getLong(0)).toSeq
      require(curve.size == hops + 1 &&
          curve.zip(curve.tail).forall { case (a, b) => a <= b } &&
          curve.last > curve.head,
        s"reach curve must grow monotonically: $curve")
    }

    // round-15 plant recovery: the capped SemDeDup output is the
    // 5,000-edge star plus the background's genuine tau=0.9 near-pairs
    // (measured 3,078 at n=100k — rate ~4e-5 over the ~78M surviving
    // candidate pairs, real cosine coincidences among uniform hash
    // vectors); the bound that matters is QUADRATIC ABSENCE: orders of
    // magnitude under the 12.5M the dropped hot cell would emit
    require(results("semdedup_capped")._2 >= 5000 &&
        results("semdedup_capped")._2 <= 30000,
      s"capped SemDeDup should emit the 5,000-edge star + sparse " +
        s"background pairs, never the quadratic cell: " +
        s"${results("semdedup_capped")._2}")
    require(results("semdedup_uncapped")._2 >= 12000000L,
      s"uncapped contrast should show the quadratic hot cell: " +
        s"${results("semdedup_uncapped")._2}")
    // phash: the capped run must drop the template-image hot buckets
    // (bounded output — md5-word docs are image-unique, so besides the
    // templates there is ~nothing within Hamming 3); the unbounded n/10
    // contrast pairs the two 250-copy template images all-vs-all
    require(results("phash_capped")._2 <= 2000,
      s"capped phash pairing let a template bucket through: " +
        s"${results("phash_capped")._2}")
    require(results("phash_uncapped")._2 >= 60000L,
      s"unbounded phash contrast should emit the 2xC(250,2) template " +
        s"quadratic: ${results("phash_uncapped")._2}")
    // linkpred: the capped run must silence the hub's C(5k,2) wedge
    // quadratic (only chain second-neighbor pairs remain); the uncapped
    // contrast must show it
    require(results("linkpred_capped")._2 <= 20000L,
      s"capped linkPredict let hub wedges through: " +
        s"${results("linkpred_capped")._2}")
    require(results("linkpred_uncapped")._2 >= 12000000L,
      s"uncapped linkPredict contrast should emit the hub quadratic: " +
        s"${results("linkpred_uncapped")._2}")
    require(results("scc_100k")._2 == 100000L,
      s"scc must label every ring node: ${results("scc_100k")._2}")

    // (B'''') round-15 batch 2: LPA at 100k nodes — 10k disjoint
    // 10-cliques (clique edges of the ring generator's id blocks).
    // Round 1: every clique member ties across 10 labels and takes the
    // clique base (min); round 2 is the fixed point — so 2 rounds must
    // label all 100k nodes exactly, and per-round cost is one
    // edge-keyed join + one (node, label) combine (~0.45M edges).
    val cliques100k = spark.range(100000L)
      .filter("id % 10 <> 9")
      .selectExpr("id as src",
        "explode(sequence(id + 1, (id div 10) * 10 + 9)) as dst")
    // construct INSIDE the timer (AQE-eager checkpoints; the scc note)
    var lpaLabels: DataFrame = null
    stage("lpa_100k") {
      lpaLabels = ops.Graph.labelPropagation(cliques100k, 2)
      lpaLabels
    }
    require(results("lpa_100k")._2 == 100000L,
      s"LPA must label every node: ${results("lpa_100k")._2}")
    require(lpaLabels.filter(col("label") =!= expr("(node div 10) * 10"))
        .isEmpty,
      "LPA labels on the 10-clique graph must be the clique base")

    // round 20: the SAME clique contract at 1M nodes — the symmetric
    // vote frame (~9M rows) crosses the Fanout.pinned threshold, so
    // this point exercises the PIN branch of the round-20 single-frame
    // reshape (per-round join reads the co-partitioned persist,
    // exchanging only the label frame; the self-vote arrives as a
    // union of the label frame, never materialized into the static
    // copy). 100k above stays the checkpoint-branch point.
    val cliques1m = spark.range(1000000L)
      .filter("id % 10 <> 9")
      .selectExpr("id as src",
        "explode(sequence(id + 1, (id div 10) * 10 + 9)) as dst")
    var lpa1m: DataFrame = null
    stage("lpa_1m") {
      lpa1m = ops.Graph.labelPropagation(cliques1m, 2)
      lpa1m
    }
    require(results("lpa_1m")._2 == 1000000L,
      s"LPA must label every node at 1M: ${results("lpa_1m")._2}")
    require(lpa1m.filter(col("label") =!= expr("(node div 10) * 10"))
        .isEmpty,
      "LPA labels on the 1M 10-clique graph must be the clique base")

    // KMV at 1M distinct values, k = 256: the build is one
    // map-side-combined distinct + a k-minima merge, and the estimate
    // must land inside the 3/sqrt(k) ≈ 19% band — the sketch's declared
    // accuracy contract measured at a real cardinality, not the 500-row
    // fixture.
    val kmvIn = spark.range(1000000L)
      .selectExpr("md5(cast(id as string)) as v")
    stage("kmv_1m")(ops.Sketch.kmvEstimate(
      ops.Sketch.kmvSketch(kmvIn, "v", 256), 256))
    val kmvEst = ops.Sketch.kmvEstimate(
        ops.Sketch.kmvSketch(kmvIn, "v", 256), 256)
      .select(col("est_distinct")).collect().head.getLong(0)
    require(kmvEst > 810000L && kmvEst < 1190000L,
      s"KMV estimate $kmvEst outside the k=256 band for 1M distinct")

    // sanity: the plants must be FOUND (caps did not eat the signal).
    // ~n/20 near-dup pairs from LSH; ~n/20 span groups from spanPairs.
    val lshPairs = results("lsh_capped")._2
    val spanPairs = results("span_capped")._2
    val jacPairs = results("jaccard_capped")._2
    require(lshPairs >= n / 20 * 9 / 10,
      s"LSH lost planted near-dups: $lshPairs < ${n / 20 * 9 / 10}")
    require(spanPairs >= n / 20 * 9 / 10,
      s"spanPairs lost planted spans: $spanPairs < ${n / 20 * 9 / 10}")
    require(jacPairs >= n / 20 * 9 / 10,
      s"jaccard lost planted near-dups: $jacPairs < ${n / 20 * 9 / 10}")
    // simhash (round 14, 60-bit signature): 15-bit blocks partition the
    // corpus 32,768 ways per block index, so random-doc buckets stay far
    // under the cap and the planted near-dups must SURFACE — the r12
    // measurement of 0 candidates here was the 32-bit saturation ceiling
    // this width removes. Recovery is partial BY THE OPERATOR'S OWN
    // CONTRACT, not by saturation: a 1-of-40-token edit flips each of
    // the 60 majority bits with p ≈ 0.06 (the vote sits at the 20/21
    // boundary with P(S=20)+P(S=21) ≈ 0.245, and the edit moves it
    // ±1 half the time), so expected Hamming ≈ 3.7 and ~half the
    // planted pairs fall inside the Hamming <= 3 radius. Requiring a
    // quarter of the plants leaves 2x margin over that binomial mean.
    require(results("simhash_capped")._2 >= n / 20 / 4,
      s"simhash lost planted near-dups: ${results("simhash_capped")._2} " +
        s"< ${n / 20 / 4} — 60-bit banding should recover ~half the plants")
    //
    // bloom decontamination must flag AT LEAST what the exact lane flags
    // (no false negatives) and the oriented triangle pass must cover the
    // clique nodes
    require(results("decon_bloom_u16")._2 >= results("decon_exact")._2,
      "bloom decontamination lost exact-lane hits")
    // the sized filter's residual FPs must sit at the model's level:
    // probes·(load)^k ≈ 36n·1.1e-6 (~4 docs at n=100k, measured 5;
    // ~40 at n=1M under the r19 corpus-scaled m) — an order-of-
    // magnitude bound, not equality (Bloom never promises 0)
    require(results("decon_bloom_20")._2 >= results("decon_exact")._2 &&
      results("decon_bloom_20")._2 <=
        results("decon_exact")._2 + math.max(40L, n / 2500),
      "sized bloom FPs off-model: " +
        s"""${results("decon_bloom_20")._2} vs exact ${results("decon_exact")._2}""")
    require(results("tri_oriented")._2 >= n / 2,
      s"oriented triangles missed clique nodes: ${results("tri_oriented")._2}")
    // the 9-core is EXACTLY the clique population: hub/chain/spokes must
    // cascade out within the 3 unrolled rounds, no clique node may peel
    require(results("kcore_9")._2 == n / 2,
      s"9-core should be exactly the ${n / 2} clique nodes: " +
        s"${results("kcore_9")._2}")
    // round-14 plants: winnowing is GUARANTEED (>= 11-token runs) to pair
    // every near-dup and span plant; the prefix join is an exact
    // threshold join, so it must find every near-dup pair (jac ≈ 36/38)
    require(results("winnow_pairs")._2 >= n / 20 * 9 / 10 + n / 20,
      s"winnowing lost planted pairs: ${results("winnow_pairs")._2} " +
        s"< ${n / 20 * 9 / 10 + n / 20} (near-dups + spans are guaranteed)")
    require(results("jaccard_prefix")._2 >= n / 20 * 9 / 10,
      s"prefix join lost planted near-dups: ${results("jaccard_prefix")._2}")
    require(results("heavy_hitters")._2 == results("hh_naive")._2,
      "MG heavy hitters != naive recount: " +
        s"""${results("heavy_hitters")._2} vs ${results("hh_naive")._2}""")
    require(results("heavy_hitters")._2 == 41,
      s"expected exactly the 41 planted hot tokens: ${results("heavy_hitters")._2}")
    // grouped lane: the same 41 plants per language, all 3 languages
    require(results("hh_by")._2 == 3 * 41,
      s"per-lang heavy hitters should be 41 in each of 3 langs: " +
        s"${results("hh_by")._2}")
    require(results("domain_shift")._2 == 3,
      s"domain shift must report all 3 langs: ${results("domain_shift")._2}")
    // the df gate must remove every boilerplate/hot token before pairing
    // while the planted families' collocations all survive: >= the
    // span plants' C(12,2) pairs per 20-block (near-dup blocks add
    // C(39,2) more; md5 word collisions can only add, never remove)
    require(results("pmi_gated")._2 >= n / 20 * 66,
      s"df-gated PMI lost planted family collocations: " +
        s"${results("pmi_gated")._2} < ${n / 20 * 66}")
    // ANN: the exact pass must find EVERY planted source (it is the
    // definitional nearest neighbor); IVF with 8/64 probes must find
    // nearly all — the nudged query lands in its source's cell, so a
    // miss means centroid-boundary churn, bounded at 10%
    require(results("ann_exact_hits")._2 == 200,
      s"exact ANN lost planted neighbors: ${results("ann_exact_hits")._2}/200")
    require(results("ann_ivf_hits")._2 >= 180,
      s"IVF recall@1 below 0.9 on planted neighbors: " +
        s"${results("ann_ivf_hits")._2}/200")
    require(results("ann_ivfpq_cut")._2 >= 150,
      s"IVF-PQ density-scaled coarse cut fell below the measured band: " +
        s"${results("ann_ivfpq_cut")._2}/200 — the rerank stage cannot " +
        "recover what the cut drops")
    // round-14 additions: boilerplate recovery is exact (the template
    // docs and ONLY they carry stripped chunks)
    require(results("boilerplate")._2 == n / 20,
      s"boilerplate should flag exactly the ${n / 20} template docs: " +
        s"${results("boilerplate")._2}")
    // CUSUM: 2 alarms per planted spike (up at the spike tick: the hot
    // key walks 1490→11000, up = 9510−4000 = 5510 > 5000; down at its
    // next tick: 11000→1010, dn = 9990−4000 = 5990 > 5000; the +10/−490
    // sawtooth arithmetic never clears slack), spikes = 10n/100000
    require(results("cusum_ticks")._2 == 2L * (10L * n / 100000L),
      s"CUSUM alarms off-plant: ${results("cusum_ticks")._2} != " +
        s"${2L * (10L * n / 100000L)}")
    // baskets: the mega-basket must die at the cap, the planted pair
    // alone survives the support floor
    require(results("basket_capped")._2 == 1,
      s"capped basket mining should yield exactly the planted pair: " +
        s"${results("basket_capped")._2}")
    // tick lanes: the drawdown plant is EXACT — one row per key and the
    // per-key maxima sum to 490 (hot sawtooth) + 149·98 (the others)
    require(results("drawdown")._2 == 150,
      s"drawdown must report all 150 keys: ${results("drawdown")._2}")
    val ddSum = ops.TimeSeries.maxDrawdown(
        saw.filter(col("tie") % 100000 =!= 50000), "k", "ts", "tie",
        col("cents"))
      .agg(sum(col("max_dd_cents"))).collect()(0).getLong(0)
    require(ddSum == 490L + 149L * 98L,
      s"planted sawtooth drawdowns off: sum $ddSum != 15092")
    // every planted spike must flag (resets flag too — correctly — so
    // recovery, not equality)
    require(results("anomaly_ticks")._2 >= nTicks / 100000,
      s"anomaly lane lost planted spikes: ${results("anomaly_ticks")._2} " +
        s"< ${nTicks / 100000}")
    // every key is affine in the index by construction: corr == 1.0 for
    // all 150, up to the final double normalization
    val lowCorr = ops.TimeSeries.corrVsIndex(
        ticks("1000L + (id div 3600) % 100"), "k", "ts", "tie",
        col("cents"), 3600000000L)
      .filter(col("corr").isNull || col("corr") < 0.999999).count()
    require(lowCorr == 0L && results("index_corr")._2 == 150,
      s"index corr should be 1.0 for all 150 affine keys: $lowCorr low, " +
        s"${results("index_corr")._2} rows")

    val json = results.map { case (k, (dt, cnt, sb)) =>
      f""""$k":{"sec":$dt%.2f,"rows":$cnt,"shuffle_bytes":$sb}"""
    }.mkString("{", ",", "}")
    println(s"""{"n_docs":$n,"stages":$json}""")
    spark.stop()
  }
}
