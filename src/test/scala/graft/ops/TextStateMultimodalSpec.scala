package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TextStateMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("X4 text stats on a known string") {
    val df = Seq((1L, "the cat and a dog")).toDF("doc_id", "text")
    val r = TextOps.withTextStats(df, "text")
      .select("n_tokens", "n_stop", "stop_ratio").head()
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 3) // the, and, a
    assert(r.getDouble(2) == 0.6)
  }

  test("X4 language-ID calls english marker text en, others und") {
    val df = Seq((1L, "the house of the king and a crown"),
      (2L, "xyzzy plugh quux")).toDF("doc_id", "text")
    val out = TextOps.withLangId(df, "text")
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "und")
  }

  test("X4 BPE-ish tokens split letter runs, digit runs, punctuation") {
    val df = Seq((1L, "abc 12 d!e")).toDF("doc_id", "text")
    val n = TextOps.withBpeCount(df, "text").select("n_bpe").as[Int].head()
    assert(n == 5) // abc | 12 | d | ! | e
  }

  test("X4 fingerprints are case-normalized and shingle-stable") {
    val df = Seq((1L, "The Quick brown fox jumps over all"),
      (2L, "the quick brown fox jumps over all")).toDF("doc_id", "text")
    val fp = TextOps.withFingerprints(df, "text")
      .select("doc_id", "fp", "minshingle").as[(Long, String, String)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(fp(1L) == fp(2L)) // identical after lower()
  }

  test("X5b packing matches an independent scala recomputation per shard") {
    val docs = (1 to 50).map(i =>
      (i.toLong, ("w " * (i % 7 + 1)).trim, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.packSequences(docs, "text", "doc_id", Seq("lang"), 10)
      .select("doc_id", "lang", "n_tok", "bin")
      .as[(Long, String, Int, Long)].collect()
    // independent model: running pre-sum of token counts per lang, id order
    val expected = out.groupBy(_._2).iterator.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).iterator.map { case (id, _, n, _) =>
        val bin = cum / 10; cum += n; (id, bin)
      }
    }.toMap
    out.foreach { case (id, _, _, bin) => assert(bin == expected(id)) }
    // and bins are non-decreasing in id order within a shard
    out.groupBy(_._2).values.foreach { rows =>
      val bins = rows.sortBy(_._1).map(_._4)
      assert(bins.zip(bins.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("X4e repetition ratios on known strings; <3 tokens -> null 3-gram frac") {
    val docs = Seq(
      (1L, "a a a b"),          // 4 toks, 2 distinct; 3-grams "a a a","a a b" distinct
      (2L, "x y"),              // too short for 3-grams
      (3L, "w w w w")           // 1 distinct token; 3-grams "w w w" x2 -> 1 distinct of 2
    ).toDF("doc_id", "text")
    val out = TextOps.withRepetition(docs, "text")
      .select("doc_id", "n_tok", "dup_token_frac", "dup_3gram_frac")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(out(1L) == ((4, 0.5, Some(0.0))))
    assert(out(2L) == ((2, 0.0, None)))
    assert(out(3L) == ((4, 0.75, Some(0.5))))
  }

  test("X4f tfidf: corpus-wide terms score zero, rare terms rank first") {
    val docs = Seq(
      (1L, "common rare1 rare1 other"),
      (2L, "common rare2 other"),
      (3L, "common unique3")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "text", "doc_id", 2)
      .select("doc_id", "term", "tfidf", "term_rank")
      .as[(Long, String, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // "common" appears in every doc: idf = ln(1) = 0 -> never top-ranked
    assert(out.values.flatten.filter(_._2 == "common").forall(_._3 == 0.0))
    // doc 1: rare1 has tf=2 and df=1 -> highest score
    assert(out(1L).head._2 == "rare1")
    assert(out(3L).head._2 == "unique3")
    // deterministic tie-break: rare1/rare2 vs other in doc 2 — df 1 beats df 2
    assert(out(2L).head._2 == "rare2")
  }

  test("X4g PII scrub replaces emails and long digit runs, counting each") {
    val docs = Seq(
      (1L, "contact bob.smith+x@mail.example.org or 4111111111111111 now"),
      (2L, "no pii here 12345678"), // 8 digits: below the 9-digit threshold
      (3L, "two mails a@b.co c@d.io")
    ).toDF("doc_id", "text")
    val out = TextOps.scrubPii(docs, "text")
      .select("doc_id", "n_emails", "n_longnums", "scrubbed")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 == "contact <EMAIL> or <NUM> now")
    assert(out(2L) == ((2L, 0, 0, "no pii here 12345678")))
    assert(out(3L)._2 == 2 && out(3L)._4 == "two mails <EMAIL> <EMAIL>")
  }

  test("X4m lmScore: a duplicated doc scores HIGHER self-trained, EQUAL " +
      "under held-out training (r12 — the CCNet self-inclusion hazard)") {
    // doc 1's bigram (alpha, beta) is DILUTED by doc 2's (alpha, gamma):
    // c2/c1 = 1/2 self-trained, so duplication has room to inflate it
    // ((1+k)/(2+k) -> 1); an undiluted fixture would sit at the 1e6
    // ceiling where inflation is invisible
    val base = Seq(
      (1L, "alpha beta"),
      (2L, "alpha gamma"),
      (3L, "iota kappa lambda mu"))
    val train = Seq(
      (101L, "alpha beta"),
      (102L, "alpha gamma"),
      (103L, "nu xi omicron pi"))
    def score(corpus: Seq[(Long, String)], tr: Option[Seq[(Long, String)]]) =
      TextOps.lmScore(corpus.toDF("doc_id", "text"), "text", "doc_id",
          train = tr.map(_.toDF("doc_id", "text")))
        .filter(col("doc_id") === 1L).select("score_ppm").as[Long].head()
    // self-trained: duplicating doc 1 five times inflates its own bigram
    // stats, so its score RISES — the bias held-out training removes
    val dup = base ++ (10L to 14L).map(i => (i, "alpha beta"))
    val selfBase = score(base, None)
    val selfDup = score(dup, None)
    assert(selfDup > selfBase,
      s"self-trained score must inflate under duplication: $selfDup <= $selfBase")
    // held-out: the training stats never see the duplicates, so doc 1's
    // score is IDENTICAL whether or not the eval corpus duplicates it
    assert(score(base, Some(train)) == score(dup, Some(train)))
    // unseen bigrams score 0 ppm, not dropped: doc 3 shares no bigram
    // with the training split but still reports its n_bigrams
    val d3 = TextOps.lmScore(base.toDF("doc_id", "text"), "text", "doc_id",
        train = Some(train.toDF("doc_id", "text")))
      .filter(col("doc_id") === 3L)
      .select("n_bigrams", "score_ppm").as[(Long, Long)].head()
    assert(d3 == ((3L, 0L)))
  }

  test("X5d interleave: weight-2 source appears twice as densely, ties deterministic") {
    val docs = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (10L, "b"), (11L, "b")
    ).toDF("doc_id", "source")
    val order = TextOps.interleaveBySource(docs, "doc_id", "source",
        Map("a" -> 2.0, "b" -> 1.0))
      .orderBy(col("sched"), col("source"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    // a1@0.5, a2@1.0, b1@1.0 (tie: source a < b), a3@1.5, a4@2.0, b2@2.0
    assert(order == Seq(1L, 2L, 10L, 3L, 4L, 11L))
    // every prefix holds the 2:1 mixture within rounding
    val sources = Seq("a", "a", "b", "a", "a", "b")
    assert(sources.take(3).count(_ == "a") == 2 && sources.count(_ == "a") == 4)
  }

  test("X4j decontaminate flags planted n-gram overlap, leaves clean and " +
      "short docs alone") {
    val bench = Seq("the quick brown fox jumps over the lazy dog tonight")
      .toDF("text")
    val train = Seq(
      // shares the 8-gram "quick brown fox jumps over the lazy dog"
      (1L, "a story where the quick brown fox jumps over the lazy dog again"),
      (2L, "completely unrelated text about spark shuffle partitions and joins overall"),
      (3L, "too short to shingle")) // < 8 tokens: clean by construction
      .toDF("doc_id", "text")
    val out = TextOps.decontaminate(train, bench, "text", "doc_id", n = 8)
      .select(col("doc_id"), col("n_contaminated"), col("contaminated"))
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, 2L, true), (2L, 0L, false), (3L, 0L, false)))
    // n=8 over "...quick brown fox jumps over the lazy dog again": the
    // planted window matches at two alignments (the benchmark 10-token
    // text contributes 3 distinct 8-grams; the doc shares exactly 2)
  }

  test("X4r contaminationReport grades overlap: full, partial, none, " +
      "unshingleable — ppm floors against DISTINCT grams") {
    val bench = Seq("one two three four five six")
      .toDF("text") // distinct 5-grams: [one..five], [two..six]
    val train = Seq(
      (1L, "one two three four five six"),       // both grams hit: 10^6
      (2L, "zz one two three four five zz aa"),  // 1 of 4 grams: 250000
      (3L, "nothing shared here at all today"),  // 0 of 2: excluded (n_hit=0)
      (4L, "too short"))                         // unshingleable: no grams
      .toDF("doc_id", "text")
    val out = TextOps.contaminationReport(train, bench, "text", "doc_id",
        n = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 1000000L),
      (2L, 4L, 1L, 250000L),
      (3L, 2L, 0L, 0L),
      (4L, 0L, 0L, 0L)))
  }

  test("X4q domainShift: a group drawn from the corpus blend sits near " +
      "0, a disjoint-vocabulary group near 10^6; exact and " +
      "partitioning-independent") {
    val docs = (
      Seq.tabulate(40)(i => (s"g_same", "alpha beta gamma delta")) ++
      Seq.tabulate(10)(i => (s"g_far", "omega psi chi phi"))
    ).toDF("grp", "text")
    def run(parts: Int) =
      TextOps.domainShift(docs.repartition(parts), "text", "grp")
        .orderBy("grp").as[(String, Long, Long)].collect().toSeq
    val out = run(8)
    val far = out.find(_._1 == "g_far").get
    val same = out.find(_._1 == "g_same").get
    // g_far: its 4 tokens are 20% of the corpus, so TV = 1 - 0.2 = 0.8
    // exactly (every token uniform within its group)
    assert(far._3 == 800000L, s"far=$far")
    // g_same: 80% of the blend IS this group; TV = 0.2
    assert(same._3 == 200000L, s"same=$same")
    assert(run(1) == out && run(3) == out)
  }

  test("X4s pmiPairs: a perfectly-coupled pair lifts above independence, " +
      "an anti-correlated pair below; df and support gates drop tokens") {
    // a+b always co-occur (lift = N/n = 4x uniform); c is everywhere
    // (lift vs anything = 1x); z appears once (df gate kills it)
    val docs = (
      (1 to 5).map(i => (i.toLong, "aa bb cc")) ++
      (6 to 20).map(i => (i.toLong, "cc dd")) :+
      (21L, "zz cc")
    ).toDF("doc_id", "text")
    val out = TextOps.pmiPairs(docs, "text", "doc_id",
        minDf = 2, maxDf = 100, minSupport = 2)
      .orderBy("t1", "t2")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // N=21 docs; aa,bb df=5; cc df=21; dd df=15
    assert(out == Seq(
      ("aa", "bb", 5L, 5L, 5L, 4200000L),  // floor(5·21·10^6 / 25)
      ("aa", "cc", 5L, 5L, 21L, 1000000L),
      ("bb", "cc", 5L, 5L, 21L, 1000000L),
      ("cc", "dd", 15L, 21L, 15L, 1000000L)), s"got $out")
  }

  test("X4t vocabGrowth: new tokens land in their first bucket only; " +
      "cumulative curves are monotone and end at the totals") {
    val docs = Seq(
      (0L, "a b"), (49L, "a"),            // bucket 0: vocab {a, b}, 3 toks
      (50L, "b c c"),                     // bucket 1: new {c}, 3 toks
      (149L, "a d"))                      // bucket 2 (no docs in [100,149)
      .toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(docs, "text", "doc_id", 50L)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 2L, 3L, 2L),
      (1L, 3L, 1L, 6L, 3L),
      (2L, 2L, 1L, 8L, 4L)), s"got $out")
  }

  test("X4o gopher rules: each rule trips on its planted violation, " +
      "clean doc keeps") {
    val good = "the quick brown fox jumps over a lazy dog and then " +
      "runs far away into the deep green woods of the north tonight"
    val docs = Seq(
      (1L, good), // passes every rule
      (2L, "too short of a doc"), // r_len (< 20 tokens)
      (3L, Seq.fill(25)("a").mkString(" ")), // r_word_len (mean 1 < 3)
      (4L, good + " " + Seq.fill(8)("#!?").mkString(" ")), // r_symbol
      (5L, good.replaceAll("[a-z]", "7")), // r_alpha (and stop/symbol…)
      (6L, Seq.fill(22)("quantum flux node").mkString(" ")
        .split(" ").take(22).mkString(" "))) // r_stop: no markers
      .toDF("doc_id", "text")
    val r = TextOps.withQualityRules(docs, "text", minTokens = 20)
      .select($"doc_id", $"r_len", $"r_word_len", $"r_symbol", $"r_alpha",
        $"r_stop", $"keep_rules")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L)._7, "clean doc must keep")
    assert(!r(2L)._2 && !r(2L)._7, "short doc fails r_len")
    assert(!r(3L)._3 && !r(3L)._7, "1-char words fail r_word_len")
    assert(!r(4L)._4 && !r(4L)._7, "symbol-heavy doc fails r_symbol")
    assert(!r(5L)._5 && !r(5L)._7, "digit soup fails r_alpha")
    assert(!r(6L)._6 && !r(6L)._7, "stopword-free doc fails r_stop")
  }

  test("X4q boilerplate: a chunk repeated across >= minDocs docs is " +
      "stripped from every doc, rare chunks survive, order is preserved") {
    // width 2, minDocs 3: "cookie banner" opens docs 1-3 (boilerplate);
    // doc bodies are unique. Doc 4 has no boilerplate at all.
    val docs = Seq(
      (1L, "cookie banner alpha beta"),
      (2L, "cookie banner gamma delta"),
      (3L, "cookie banner epsilon zeta"),
      (4L, "eta theta iota kappa")).toDF("doc_id", "text")
    val out = TextOps.boilerplate(docs, "doc_id", "text", 2, 3L)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, "alpha beta"),
      (2L, 2L, 1L, "gamma delta"),
      (3L, 2L, 1L, "epsilon zeta"),
      (4L, 2L, 0L, "eta theta iota kappa")))
    // repeats WITHIN one doc don't count toward the cross-doc line
    val selfRep = Seq(
      (1L, "spam spam spam spam"),
      (2L, "unique words here now")).toDF("doc_id", "text")
    val o2 = TextOps.boilerplate(selfRep, "doc_id", "text", 2, 2L)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(o2.map(_._3) == Seq(0L, 0L), "distinct-doc count, not occurrences")
    // a doc that is ALL boilerplate reassembles to the empty string
    val allBp = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"))
      .toDF("doc_id", "text")
    val o3 = TextOps.boilerplate(allBp, "doc_id", "text", 2, 3L)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(o3.forall(r => r._3 == 1L && r._4 == ""))
    // tail chunk (len not divisible by width) participates like any other
    val tail = Seq((1L, "a b c"), (2L, "z z c"), (3L, "q q c"))
      .toDF("doc_id", "text")
    val o4 = TextOps.boilerplate(tail, "doc_id", "text", 2, 3L)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, String)].collect().toSeq
    // chunks: ["a b","c"], ["z z","c"], ["q q","c"] -> "c" is in 3 docs
    assert(o4.map(_._3) == Seq(1L, 1L, 1L))
    assert(o4.map(_._4) == Seq("a b", "z z", "q q"))
  }

  test("X4f bloom decontamination: flags a superset of the exact lane, " +
      "and agrees with it at generous m") {
    val d = sf("sf0.001")
    val docs = Tables.documents(spark, d)
    val train = docs.filter(col("doc_id") % 17 =!= 3)
    val bench = docs.filter(col("doc_id") % 17 === 3).select(col("text"))
    val exact = TextOps.decontaminate(train, bench, "text", "doc_id", n = 5)
      .filter(col("contaminated")).select(col("doc_id"))
      .as[Long].collect().toSet
    // no false negatives at ANY m: exact-contaminated ⊆ bloom-contaminated
    val tight = TextOps.decontaminateBloom(train, bench, "text", "doc_id",
        n = 5, k = 3, m = 1024)
      .filter(col("contaminated")).select(col("doc_id"))
      .as[Long].collect().toSet
    assert(exact.subsetOf(tight))
    // at generous m the false-positive mass vanishes and the two lanes
    // agree doc for doc, count for count
    val wide = TextOps.decontaminateBloom(train, bench, "text", "doc_id",
        n = 5, k = 3, m = 1 << 20)
      .select(col("doc_id"), col("n_flagged"), col("contaminated"))
      .orderBy(col("doc_id")).as[(Long, Long, Boolean)].collect().toSeq
    val exactFull = TextOps.decontaminate(train, bench, "text", "doc_id",
        n = 5)
      .select(col("doc_id"), col("n_contaminated"), col("contaminated"))
      .orderBy(col("doc_id")).as[(Long, Long, Boolean)].collect().toSeq
    assert(wide == exactFull)
  }

  test("X4n nbClassify: learns class-token association, smooths unseen " +
      "tokens, breaks exact ties to the smaller label") {
    // two classes with disjoint signature vocabularies + shared filler
    val docs = Seq(
      (1L, "cat cat whiskers purr filler", "feline"),
      (2L, "purr cat whiskers filler filler", "feline"),
      (3L, "dog bark fetch bone filler", "canine"),
      (4L, "bark dog bone filler filler", "canine"),
      // held-out (doc_id % 5 == 0): one clearly feline, one clearly canine
      (5L, "cat purr whiskers cat", "feline"),
      (10L, "dog bark bone fetch", "canine"),
      // held-out doc of ONLY filler: identical evidence for both classes
      // -> tie must deterministically resolve to 'canine' (lexicographic)
      (15L, "filler filler filler", "feline")
    ).toDF("doc_id", "text", "lang")
    val pred = TextOps.nbClassify(docs, "text", "doc_id", "lang",
        trainFilter = col("doc_id") % 5 =!= 0)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(pred == Map(5L -> "feline", 10L -> "canine", 15L -> "canine"),
      s"got $pred")
  }

  test("X4n nbClassify: train rows never appear in the output") {
    val docs = Seq(
      (1L, "a b", "x"), (2L, "a b", "x"), (5L, "a b", "y"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.nbClassify(docs, "text", "doc_id", "lang",
      trainFilter = col("doc_id") % 5 =!= 0)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(5L))
  }

  test("X4v langId: classifies by character-trigram signature (word " +
      "tokens identical), pads boundaries, drops sub-n docs, ties to " +
      "the smaller label") {
    // the WORD vocabularies are identical across classes — only the
    // character composition differs (München-style diacritic signal a
    // word-token NB cannot see; here: 'qq' vs 'zz' interior bigrams)
    val docs = Seq(
      (1L, "aqqa aqqa bqqb", "qlang"),
      (2L, "bqqb aqqa aqqa", "qlang"),
      (3L, "azza azza bzzb", "zlang"),
      (4L, "bzzb azza azza", "zlang"),
      // held-out: trigram evidence must pick the matching class
      (5L, "aqqa bqqb", "qlang"),
      (10L, "azza bzzb", "zlang"),
      // held-out shorter than n AFTER padding (len 3 with pads): ok —
      // one char yields exactly one padded trigram, still classified;
      // a truly empty text (2 pad chars < 3) drops from the output
      (15L, "", "qlang")
    ).toDF("doc_id", "text", "lang")
    import org.apache.spark.sql.functions.col
    val pred = TextOps.langId(docs, "text", "doc_id", "lang",
        trainFilter = col("doc_id") % 5 =!= 0, n = 3)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(pred.get(5L).contains("qlang") && pred.get(10L).contains("zlang"),
      s"trigram signal must decide the class: $pred")
    assert(!pred.contains(15L),
      "an empty text (padded length 2 < n) must drop from the output " +
        "(empty-in, empty-out)")
    // exact tie on identical char evidence resolves lexicographically
    val tied = Seq(
      (1L, "mm", "beta"), (2L, "mm", "alpha"), (5L, "mm", "beta"))
      .toDF("doc_id", "text", "lang")
    val t = TextOps.langId(tied, "text", "doc_id", "lang",
        trainFilter = col("doc_id") % 5 =!= 0, n = 3)
      .as[(Long, String, Long)].collect()
    assert(t.map(r => r._1 -> r._2).toMap == Map(5L -> "alpha"),
      s"tie must break to the smaller label: ${t.toSeq}")
  }

  test("O-ST1 currentState is the latest action per job") {
    val log = Seq(
      (1L, 1000, ts(0), 0L), (1L, 1001, ts(1), 1L), (1L, 1300, ts(2), 2L),
      (2L, 1000, ts(0), 3L), (2L, 1900, ts(1), 4L)
    ).toDF("job_id", "action", "ts", "event_id")
    val out = StateMachine.currentState(log)
      .select("job_id", "current_action").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1300, 2L -> 1900))
  }

  test("O-ST1 illegal transitions are flagged (1300 is terminal)") {
    val log = Seq(
      (1L, 1000, ts(0), 0L), (1L, 1001, ts(1), 1L), // legal
      (2L, 1300, ts(0), 2L), (2L, 1000, ts(1), 3L)  // illegal: from terminal
    ).toDF("job_id", "action", "ts", "event_id")
    val bad = StateMachine.illegalTransitions(log)
      .select("job_id").as[Long].collect().toSeq
    assert(bad == Seq(2L))
  }

  test("multimodal payload metadata is consistent with the bytes") {
    val df = Seq((7L, "hello world")).toDF("doc_id", "text")
    val r = Multimodal.withPayload(df, "text", "doc_id")
      .select(col("meta.byte_len"), col("meta.n_frames")).head()
    assert(r.getInt(0) == 11)
    assert(r.getInt(1) == 1)
  }

  test("multimodal resize resamples to the target length, preserving ends") {
    val bytes = "0123456789".getBytes("UTF-8")
    val half = Multimodal.resize(bytes, 5)
    assert(half.length == 5)
    assert(half(0) == '0'.toByte) // nearest-neighbor keeps the first sample
    val double = Multimodal.resize(bytes, 20)
    assert(double.length == 20 && double(0) == '0'.toByte)
    assert(Multimodal.resize(Array.emptyByteArray, 5).isEmpty)
    assert(Multimodal.resize(bytes, 0).isEmpty)
  }

  test("ppmDecode parses a hand-built P6 image exactly; rejects " +
      "malformed bytes instead of emitting garbage") {
    val img = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60)
    val f = Multimodal.ppmDecode(img).get
    // [w, h, maxval, n_pixels, sumR, sumG, sumB, sumAll]
    assert(f.toSeq == Seq(2f, 1f, 255f, 2f, 50f, 70f, 90f, 210f))
    // malformed: wrong magic, truncated pixels, non-numeric header
    assert(Multimodal.ppmDecode("JPEG".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.ppmDecode(
      "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)).isEmpty)
    assert(Multimodal.ppmDecode("P6\nx y\n255\n".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.ppmDecode(Array.emptyByteArray).isEmpty)
  }

  test("ppmResize keeps every factor-th pixel and re-emits a VALID P6 " +
      "the parser round-trips; malformed input resizes to None") {
    // 4x2 image, pixel (x,y) = (10x+y, 100+x, 200+y) — identifiable
    val pix = for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
      yield (c match {
        case 0 => 10 * x + y
        case 1 => 100 + x
        case _ => 200 + y
      }).toByte
    val img = "P6\n4 2\n255\n".getBytes("US-ASCII") ++ pix
    val half = Multimodal.ppmResize(img, 2).get
    // 2x1 out: pixels from source (0,0) and (2,0)
    val f = Multimodal.ppmDecode(half).get
    assert(f.toSeq.take(4) == Seq(2f, 1f, 255f, 2f))
    assert(f(4) == (0 + 20).toFloat)        // R: 10*0+0, 10*2+0
    assert(f(5) == (100 + 102).toFloat)     // G: 100+0, 100+2
    assert(f(6) == (200 + 200).toFloat)     // B: 200+0 twice
    // factor 1 is the identity geometry
    val same = Multimodal.ppmResize(img, 1).get
    assert(Multimodal.ppmDecode(same).get.toSeq ==
      Multimodal.ppmDecode(img).get.toSeq)
    // odd width ceils: 4x2 at factor 3 -> 2x1 (sources x=0,3 y=0)
    val third = Multimodal.ppmDecode(Multimodal.ppmResize(img, 3).get).get
    assert(third.toSeq.take(4) == Seq(2f, 1f, 255f, 2f))
    assert(third(4) == (0 + 30).toFloat)
    assert(Multimodal.ppmResize("JPEG".getBytes("US-ASCII"), 2).isEmpty)
    assert(Multimodal.ppmResize(Array.emptyByteArray, 2).isEmpty)
  }

  test("multimodal decode runs the REAL P6 parse batch-shaped over " +
      "constructed payloads; malformed payloads yield null features") {
    val df = Multimodal.withPpmPayload(
      Seq((0L, "abcdef"), (8L, "abcdef")).toDF("doc_id", "text"),
      "text", "doc_id")
    val out = Multimodal.decode(spark, df, "doc_id")
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    // both ids have width 8 + id % 8 = 8: same bytes -> same features
    assert(out(0L) == out(8L))
    assert(out(0L).length == 8)
    assert(out(0L).take(4) == Seq(8f, 6f, 255f, 48f)) // w, h, maxval, npix
    // pixel bytes are "abcdef" repeated to 144 chars: 24 copies, and the
    // channel split at stride 3 picks (a,d) / (b,e) / (c,f) per copy
    assert(out(0L)(4) == 24f * ('a' + 'd'))
    assert(out(0L)(5) == 24f * ('b' + 'e'))
    assert(out(0L)(6) == 24f * ('c' + 'f'))
    // a non-PPM payload decodes to null features, not a task failure
    val bad = Seq((1L, Array[Byte]('n', 'o', 'p', 'e')))
      .toDF("doc_id", "payload")
    val badOut = Multimodal.decode(spark, bad, "doc_id")
    assert(badOut.filter(col("features").isNull).count() == 1)
  }

  test("MM-PH phash56: identical images hash identically, a uniform " +
      "image hashes to 0, hash is 56-bit, malformed is None") {
    def img(text: String, w: Int, h: Int): Array[Byte] = {
      val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val pix = Iterator.continually(text.getBytes("US-ASCII"))
        .flatten.take(w * h * 3).toArray
      hdr ++ pix
    }
    val a = Multimodal.phash56(img("abcdefg", 8, 6)).get
    val b = Multimodal.phash56(img("abcdefg", 8, 6)).get
    assert(a == b)
    assert((a & ~((1L << 56) - 1)) == 0L, "hash must fit in 56 bits")
    // uniform image: every gray == mean, strict > never fires
    assert(Multimodal.phash56(img("x", 10, 7)).get == 0L)
    assert(Multimodal.phash56("JPEG".getBytes("US-ASCII")).isEmpty)
    // resize-robustness, exact form: the 8x7 grid samples RELATIVE
    // coordinates (gx*w/8, gy*h/7), and ppmResize(f) keeps pixels
    // (x*f, y*f) — so on a 16x14 x-gradient the original's grid sample
    // (2*gx, 2*gy) IS the resized image's grid sample (gx, gy): the
    // hash of an image and its factor-2 decimation must be IDENTICAL
    def gradient(w: Int, h: Int): Array[Byte] = {
      val hdr = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val pix = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        pix(3 * (y * w + x) + c) = ((x * 255) / (w - 1)).toByte
      hdr ++ pix
    }
    val g = gradient(16, 14)
    val small = Multimodal.ppmResize(g, 2).get // 8x7
    assert(Multimodal.phash56(g).get == Multimodal.phash56(small).get,
      "grid-sampled hash must be invariant under exact 2x decimation " +
        "of smooth content")
  }

  test("MM-PH phashPairs: identical images pair at Hamming 0, the " +
      "banded join finds <=3-bit neighbors, nulls never pair") {
    val docs = Seq(
      (0L, "same text"), (8L, "same text"),   // widths 8 and 8: identical
      (3L, "same text"),                       // width 11: different image
      (40L, "other words here")).toDF("doc_id", "text")
    val hashed = Multimodal.phash(spark,
      Multimodal.withPpmPayload(docs, "text", "doc_id"), "doc_id")
    val pairs = Multimodal.phashPairs(hashed, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((0L, 8L, 0)))
    // the banded join is candidate-complete at Hamming <= 3: flip 3 bits
    // of a known hash via a constructed frame and the pair must surface
    val h0 = hashed.filter(col("doc_id") === 0).select("phash")
      .as[Long].head()
    val flipped = h0 ^ (1L << 2) ^ (1L << 20) ^ (1L << 45)
    val manual = Seq((100L, Some(h0)), (101L, Some(flipped)),
      (102L, Option.empty[Long])).toDF("doc_id", "phash")
    val mp = Multimodal.phashPairs(manual, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(mp == Set((100L, 101L, 3)))
  }

  private def ts(s: Int) = new Timestamp(1704067200000L + s * 1000L)
}
