package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // token stream with a genuine heavy hitter and a long tail
  private val toks = (Seq.fill(50)("hot") ++ Seq.fill(10)("warm") ++
    (1 to 40).map(i => s"cold$i")).toDF("tok")

  test("CMS estimates only ever overcount, and hit exactly without collisions") {
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact"))
    // w = 4096 across 42 keys: collisions are possible but the heavy
    // hitter's estimate must still be within the eps*N bound regardless
    val est = Sketch.cmsEstimate(Sketch.cmsBuild(toks, "tok", 4, 4096),
      toks.distinct(), "tok", 4, 4096)
    val joined = est.join(exact, Seq("tok"))
      .select($"tok", $"est", $"exact").as[(String, Long, Long)].collect()
    assert(joined.length == 42)
    assert(joined.forall { case (_, e, x) => e >= x }, "CMS undercounted")
    val hot = joined.find(_._1 == "hot").get
    assert(hot._2 >= 50 && hot._2 <= 50 + 2) // eps*N tiny at w=4096
  }

  test("CMS cramped sketch shows collisions; estimates stay >= exact") {
    val est = Sketch.cmsEstimate(Sketch.cmsBuild(toks, "tok", 2, 8),
      toks.distinct(), "tok", 2, 8)
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact"))
    val joined = est.join(exact, Seq("tok"))
      .select($"est", $"exact").as[(Long, Long)].collect()
    assert(joined.forall { case (e, x) => e >= x })
    // 42 keys into 8 buckets per row: some estimate MUST be inflated
    assert(joined.exists { case (e, x) => e > x })
  }

  test("CMS merge of disjoint shards equals the single build") {
    // deterministic disjoint shards whose multiset union is the corpus
    val a = toks.filter(substring(md5($"tok"), 1, 1) < "8")
    val b = toks.filter(substring(md5($"tok"), 1, 1) >= "8")
    val merged = Sketch.cmsMerge(
      Sketch.cmsBuild(a, "tok", 3, 64), Sketch.cmsBuild(b, "tok", 3, 64))
    val whole = Sketch.cmsBuild(toks, "tok", 3, 64)
    val diff = merged.withColumnRenamed("cnt", "m")
      .join(whole.withColumnRenamed("cnt", "w"), Seq("r", "b"), "full")
      .filter(coalesce($"m", lit(0L)) =!= coalesce($"w", lit(0L)))
    assert(diff.count() == 0, "merged sketch differs from whole-corpus build")
  }

  test("X5m bloom: no false negatives, shard-merge equals whole-build, " +
      "bitset round-trips the position set") {
    val m = 1024
    val whole = Sketch.bloomBuild(toks, "tok", 3, m)
    // every inserted value must test positive (Bloom's one hard promise)
    val bits = Sketch.bloomBits(whole, m)
    val neg = toks.distinct()
      .filter(!Sketch.bloomContains($"tok", bits, 3, m)).count()
    assert(neg == 0, "bloom false negative")
    // union of shard filters == filter of the union
    val sh1 = Sketch.bloomBuild(toks.filter($"tok" === "hot"), "tok", 3, m)
    val sh2 = Sketch.bloomBuild(toks.filter($"tok" =!= "hot"), "tok", 3, m)
    val merged = sh1.unionByName(sh2).distinct()
      .as[Long].collect().toSet
    assert(merged == whole.as[Long].collect().toSet)
    // the packed bitset carries exactly the position set
    val popcount = bits.map(java.lang.Long.bitCount).sum
    assert(popcount == whole.count())
    // a value never inserted, whose positions are unset, tests negative
    val clean = Seq("definitely-absent-token-xyz").toDF("tok")
    val cleanPos = Sketch.bloomBuild(clean, "tok", 3, m)
      .as[Long].collect().toSet
    if (cleanPos.intersect(merged).size < 3)
      assert(clean.filter(
        Sketch.bloomContains($"tok", bits, 3, m)).count() == 0)
  }

  test("X5m bloom membership verdict == positions-subset semantics " +
      "(the oracle's replay rule)") {
    val m = 256 // cramped: force real false positives
    val inserted = (1 to 60).map(i => s"key$i").toDF("tok")
    val bits = Sketch.bloomBits(Sketch.bloomBuild(inserted, "tok", 3, m), m)
    val posSet = Sketch.bloomBuild(inserted, "tok", 3, m)
      .as[Long].collect().toSet
    val probes = (1 to 400).map(i => s"probe$i").toDF("tok")
    val got = probes
      .withColumn("hit", Sketch.bloomContains($"tok", bits, 3, m))
      .as[(String, Boolean)].collect().toMap
    // replay: a probe hits iff ALL its 3 positions are in the set
    val posCols: Seq[org.apache.spark.sql.Column] = $"tok" +:
      (0 until 3).map(i =>
        conv(substring(md5(concat(lit(s"$i"), lit(":"), $"tok")), 1, 8),
          16, 10).cast("long") % m)
    val byProbe = probes.select(posCols: _*)
      .collect().map(r => r.getString(0) ->
        (1 to 3).map(r.getLong).forall(posSet.contains))
    assert(byProbe.forall { case (k, v) => got(k) == v })
    // cramped filter really does produce some false positives
    assert(got.values.count(identity) > 0)
  }

  test("X7r per-shard bloom: touched-shard rebuild == direct recompute; " +
      "union-only maintenance would leak deleted bits") {
    val nSh = 4; val k = 2; val m = 256
    def idx(df: org.apache.spark.sql.DataFrame) = Sketch.bloomBuildBy(
      df.select(Sketch.shardOf($"id", nSh).as("shard"),
        explode(split($"text", " ")).as("tok")), "tok", "shard", k, m)
    val base = (1L to 40L).map(i => (i, s"common tok$i")).toDF("id", "text")
    // delete doc 7 (its unique token must LEAVE the index), update doc 8
    val fin = base.filter($"id" =!= 7L)
      .withColumn("text", when($"id" === 8L, "common fresh8").otherwise($"text"))
    val changedShards = Seq(7L, 8L)
      .toDF("id").select(Sketch.shardOf($"id", nSh).as("shard")).distinct()
    val maintained = idx(base).join(changedShards, Seq("shard"), "left_anti")
      .unionByName(idx(fin.join(changedShards.withColumnRenamed("shard", "s"),
        Sketch.shardOf($"id", nSh) === $"s", "left_semi")))
    val direct = idx(fin)
    assert(maintained.as[(Long, Long)].collect().toSet ==
      direct.as[(Long, Long)].collect().toSet)
    // the naive OR-union (bloom bits are monotone) cannot forget tok7:
    // doc 7's positions survive in base ∪ fin — rebuild is REQUIRED
    val orOnly = idx(base).unionByName(idx(fin)).distinct()
    assert(orOnly.count() > direct.count())
  }

  test("HLL registers merge by elementwise max; estimate lands in the " +
      "1.04/sqrt(m) band") {
    val ids = (1L to 20000L).toDF("id")
    val whole = Sketch.hllRegisters(ids, "id")
    // shard split by value: merge must equal the whole-corpus build
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(ids.filter($"id" <= 9000L), "id"),
      Sketch.hllRegisters(ids.filter($"id" > 9000L), "id"))
    val diff = whole.withColumnRenamed("reg", "w")
      .join(merged.withColumnRenamed("reg", "m"), Seq("bucket"), "full")
      .filter(coalesce($"w", lit(0)) =!= coalesce($"m", lit(0)))
    assert(diff.count() == 0, "merged registers differ from whole build")
    val est = Sketch.hllEstimate(whole)
      .select($"est_fp").as[Long].head() / 1e4
    // 3 sigma at m=64: 1.04/8 = 13% per sigma
    assert(math.abs(est - 20000.0) / 20000.0 < 0.39,
      s"HLL estimate $est implausibly far from 20000")
  }

  test("weighted sample draws k rows keyed by the minimum ticket hash") {
    val rows = (1L to 100L).map(i => (i, (i % 7 + 1).toInt)).toDF("id", "w")
    val out = Sketch.weightedSample(rows, "id", "w", 10)
      .select($"id", $"w", $"sample_key").as[(Long, Int, String)].collect()
    assert(out.length == 10)
    // replay one winner's key by hand: min md5 over its w tickets
    val (id, w, key) = out.head
    val expected = (1 to w).map(t =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).min
    assert(key == expected)
  }

  test("weighted sample EXCLUDES zero/negative weights — no phantom " +
      "tickets from sequence's descending default (r12 ADVICE)") {
    // sequence(1, 0) in Spark is [1, 0] (step defaults to -1), so without
    // the guard a weight-0 row would enter the race with TWO tickets and
    // a negative weight with more — inverted probability for rows that
    // should have none. DuckDB's range(1, w+1) is end-exclusive = empty,
    // so the oracle always had the exclusion semantics.
    val rows = Seq((1L, 5), (2L, 0), (3L, -3), (4L, 7)).toDF("id", "w")
    val ids = Sketch.weightedSample(rows, "id", "w", 10)
      .select($"id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L), s"non-positive weights must be excluded: $ids")
  }

  test("weighted sampling favors heavy rows over uniform hash sampling") {
    // weights 1..100: the weighted draw's selected mass should exceed the
    // corpus mean decisively (deterministic fixture, pinned once)
    val rows = (1L to 100L).map(i => (i, i.toInt)).toDF("id", "w")
    val picked = Sketch.weightedSample(rows, "id", "w", 20)
      .agg(avg($"w")).as[Double].head()
    assert(picked > 50.5, s"weighted draw mean $picked not above corpus mean")
  }

  test("X5j grouped weighted sample: exactly k per group, heavy rows " +
      "favored within their group, deterministic") {
    // two strata; in each, one heavy row (weight 400) among 40 light (1)
    val df = ((1L to 40L).map(i => (i, "a", if (i == 5) 400 else 1)) ++
      (101L to 140L).map(i => (i, "b", if (i == 107) 400 else 1)))
      .toDF("id", "g", "w")
    val out = Sketch.weightedSampleBy(df, "id", "w", "g", 3)
      .select($"g", $"id").as[(String, Long)].collect().toSeq
    assert(out.count(_._1 == "a") == 3 && out.count(_._1 == "b") == 3)
    // a 400-ticket row holds ~91% of its group's draw mass for rank 1;
    // with 3 slots its absence from the top-3 would be ~1e-3 — and the
    // draw is deterministic md5, so this is a fixed fact, not a flake
    assert(out.contains(("a", 5L)) && out.contains(("b", 107L)))
    val again = Sketch.weightedSampleBy(df, "id", "w", "g", 3)
      .select($"g", $"id").as[(String, Long)].collect().toSeq
    assert(again.sorted == out.sorted)
    // zero/negative weights stay out of the race per group
    val withDead = df.union(Seq((999L, "a", 0), (998L, "b", -3))
      .toDF("id", "g", "w"))
    val out2 = Sketch.weightedSampleBy(withDead, "id", "w", "g", 50)
      .select($"id").as[Long].collect().toSet
    assert(!out2.contains(999L) && !out2.contains(998L))
  }

  test("X5h histogram: shard-merge equals whole-corpus build, estimates " +
      "within one bin width of exact") {
    val v = (1 to 4000).map(i => (i.toLong, (i * 37) % 1000 + (i % 7) * 0.25))
      .toDF("id", "x")
    val nBins = 32
    val whole = Sketch.histBuild(v, "x", nBins)
    // shards built against the same GLOBAL bounds merge exactly
    val bounds = v.agg(min($"x".cast("double")).as("lo"),
      max($"x".cast("double")).as("hi"))
    val merged = Sketch.histMerge(
      Sketch.histBuildWith(v.filter($"id" % 2 === 0), "x", nBins, bounds),
      Sketch.histBuildWith(v.filter($"id" % 2 =!= 0), "x", nBins, bounds))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select($"bin", $"cnt").as[(Int, Long)].collect().toMap
    assert(m(merged) == m(whole), "shard histograms must add to the whole")
    // one-bin-width error bound against the exact percentile
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = Sketch.histQuantile(whole, nBins, qs)
      .as[(Double, Double)].collect().toMap
    val width = v.agg((max($"x") - min($"x")) / nBins).as[Double].head()
    val exact = v.agg(expr(
        s"percentile(x, array(${qs.mkString("D,")}D))")).as[Seq[Double]]
      .head()
    qs.zip(exact).foreach { case (q, ex) =>
      assert(math.abs(est(q) - ex) <= width + 1e-9,
        s"q=$q est=${est(q)} exact=$ex beyond one bin width $width")
    }
  }

  test("X5n heavyHitters: exact counts for every value over threshold, " +
      "nothing under it, vocabulary far larger than k") {
    // 3 planted hitters in a 500-value noise vocabulary, spread over many
    // partitions so the MG candidate pass has to merge partial summaries
    val hot = Seq("a" -> 2000, "b" -> 1200, "c" -> 700)
    val noise = (1 to 500).map(i => s"n$i" -> 6)
    val rows = (hot ++ noise).flatMap { case (v, c) => Seq.fill(c)(v) }
    // deterministic shuffle so hot values interleave across partitions
    val df = rows.zipWithIndex.sortBy { case (v, i) => (i * 2654435761L) % 9973 }
      .map(_._1).toDF("v").repartition(16)
    val n = rows.size // 6900
    val k = 8 // threshold n/9 ≈ 767: a and b qualify, c (700) must not
    val got = Sketch.heavyHitters(df, "v", k)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2000L, "b" -> 1200L), s"got $got")
    assert(got.values.forall(_ * (k + 1) > n))
  }

  test("X5n heavyHitters: result is partitioning-independent") {
    val rows = Seq.fill(300)("x") ++ (1 to 200).map(i => s"y$i")
    Seq(1, 7, 32).foreach { parts =>
      val got = Sketch.heavyHitters(
          rows.toDF("v").repartition(parts), "v", 4)
        .as[(String, Long)].collect().toMap
      assert(got == Map("x" -> 300L), s"parts=$parts got $got")
    }
  }

  test("X5p heavyHittersBy: a group-local hitter invisible to the global " +
      "stream is found; thresholds are per-group; partitioning-independent") {
    // big group: 3000 'common' + 600-value noise; small group: 90 'rare'
    // + 10 noise. 'rare' is 0.9 of ITS group but ~2.4% of the global
    // stream — the global lane must miss it, the grouped lane must not.
    val big = Seq.fill(3000)("big" -> "common") ++
      (1 to 600).map(i => "big" -> s"n$i")
    val small = Seq.fill(90)("small" -> "rare") ++
      (1 to 10).map(i => "small" -> s"m$i")
    val rows = (big ++ small).zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 9973 }.map(_._1)
    val df = rows.toDF("g", "v").repartition(16)
    val grouped = Sketch.heavyHittersBy(df, "v", "g", 8)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(grouped == Map(("big", "common") -> 3000L, ("small", "rare") -> 90L),
      s"got $grouped")
    val global = Sketch.heavyHitters(df, "v", 8)
      .as[(String, Long)].collect().toMap
    assert(global.keySet == Set("common"), s"global lane got $global")
    // partitioning independence
    Seq(1, 5).foreach { parts =>
      val again = Sketch.heavyHittersBy(df.repartition(parts), "v", "g", 8)
        .as[(String, String, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
      assert(again == grouped, s"parts=$parts")
    }
  }

  test("X5n cmsSelfJoinSize: never undercounts F2, and a collision-free " +
      "sketch hits exact equality") {
    val toks = (Seq.fill(30)("hot") ++ (1 to 40).map(i => s"w$i") ++
      (1 to 10).map(i => s"w$i")).toDF("tok")
    // exact F2 = 30^2 + 10·2^2 + 30·1^2 = 900 + 40 + 30 = 970
    val exact = 970L
    // narrow sketch: collisions add cross terms — bound holds, never under
    val narrow = Sketch.cmsSelfJoinSize(Sketch.cmsBuild(toks, "tok", 3, 4))
      .as[Long].collect().head
    assert(narrow >= exact, s"F2 bound violated: $narrow < $exact")
    // wide sketch: 41 distinct values over 4096 buckets — w.h.p. no
    // collisions in at least one of 3 rows, so the min is EXACT
    val wide = Sketch.cmsSelfJoinSize(Sketch.cmsBuild(toks, "tok", 3, 4096))
      .as[Long].collect().head
    assert(wide == exact, s"collision-free sketch should be exact: $wide")
  }

  test("X5o cmsJoinSize: never undercounts the true equi-join size, " +
      "collision-free sketches are exact, disjoint streams estimate 0") {
    val a = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("only_a")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(7)("y") ++ Seq("only_b")).toDF("k")
    // true join size = 5·2 + 3·7 = 31
    val exact = 31L
    val narrow = Sketch.cmsJoinSize(Sketch.cmsBuild(a, "k", 3, 2),
        Sketch.cmsBuild(b, "k", 3, 2))
      .as[Long].collect().head
    assert(narrow >= exact, s"join-size bound violated: $narrow < $exact")
    val wide = Sketch.cmsJoinSize(Sketch.cmsBuild(a, "k", 3, 4096),
        Sketch.cmsBuild(b, "k", 3, 4096))
      .as[Long].collect().head
    assert(wide == exact, s"collision-free estimate should be exact: $wide")
    // disjoint key spaces: every row's inner product is 0 w.h.p. wide
    val c = Seq("p", "q", "r").toDF("k")
    val disj = Sketch.cmsJoinSize(Sketch.cmsBuild(a, "k", 3, 4096),
        Sketch.cmsBuild(c, "k", 3, 4096))
      .as[Long].collect().head
    assert(disj == 0L, s"disjoint streams should estimate 0: $disj")
  }

  test("X5h histogram: a constant column collapses to bin 0 and serves " +
      "the constant, not a divide-by-zero") {
    val v = Seq.fill(100)(42.0).toDF("x")
    val h = Sketch.histBuild(v, "x", 16)
    assert(h.select($"bin", $"cnt").as[(Int, Long)].collect().toSeq ==
      Seq((0, 100L)))
    val est = Sketch.histQuantile(h, 16, Seq(0.5, 0.99))
      .as[(Double, Double)].collect().toMap
    assert(est(0.5) == 42.0 && est(0.99) == 42.0)
  }

  test("X5q KMV: below-k input is returned exactly; large input is " +
      "estimated within the 1/sqrt(k) band") {
    val small = (1 to 40).map(i => s"v$i").toDF("v")
    val smallEst = Sketch.kmvEstimate(Sketch.kmvSketch(small, "v", 64), 64)
      .select($"n_kept", $"est_distinct").as[(Long, Long)].collect().head
    assert(smallEst == ((40L, 40L)),
      s"sub-k set must report its exact size: $smallEst")
    // duplicates must not perturb the sketch (it is a SET sketch)
    val dup = (small.unionAll(small)).toDF("v")
    val dupEst = Sketch.kmvEstimate(Sketch.kmvSketch(dup, "v", 64), 64)
      .select($"est_distinct").as[Long].collect().head
    assert(dupEst == 40L)
    val big = (1 to 20000).map(i => s"v$i").toDF("v")
    val bigEst = Sketch.kmvEstimate(Sketch.kmvSketch(big, "v", 256), 256)
      .select($"est_distinct").as[Long].collect().head
    // 3/sqrt(256) ≈ 19% three-sigma band
    assert(bigEst > 16000 && bigEst < 24000,
      s"KMV estimate $bigEst outside the k=256 error band for 20000")
  }

  test("X5r KMV compare: identical sets report Jaccard 1, disjoint " +
      "sets 0, and a half-overlap lands in between") {
    val a = (1 to 5000).map(i => s"v$i").toDF("v")
    val same = Sketch.kmvCompare(Sketch.kmvSketch(a, "v", 128),
        Sketch.kmvSketch(a, "v", 128), 128)
      .select($"jacc_ppm").as[Long].collect().head
    assert(same == 1000000L, s"self-compare must be exactly 1: $same")
    val b = (5001 to 10000).map(i => s"v$i").toDF("v")
    val disj = Sketch.kmvCompare(Sketch.kmvSketch(a, "v", 128),
        Sketch.kmvSketch(b, "v", 128), 128)
      .select($"jacc_ppm", $"est_inter").as[(Long, Long)].collect().head
    assert(disj == ((0L, 0L)), s"disjoint compare must be 0: $disj")
    val c = (2501 to 7500).map(i => s"v$i").toDF("v") // |A∩C|/|A∪C| = 1/3
    val half = Sketch.kmvCompare(Sketch.kmvSketch(a, "v", 128),
        Sketch.kmvSketch(c, "v", 128), 128)
      .select($"jacc_ppm", $"est_union", $"est_inter")
      .as[(Long, Long, Long)].collect().head
    assert(half._1 > 180000L && half._1 < 480000L,
      s"1/3-overlap Jaccard estimate out of band: $half")
    assert(half._2 > 6000L && half._2 < 9000L,
      s"union estimate out of band: $half")
  }

  test("X5s grouped KMV: per-group estimates are independent — a sub-k " +
      "group is exact beside a large estimated one") {
    val rows = (1 to 30).map(i => ("small", s"s$i")) ++
      (1 to 8000).map(i => ("big", s"b$i"))
    val sk = Sketch.kmvSketchBy(rows.toDF("g", "v"), "v", "g", 128)
    // the sketch itself is bounded: <= k rows per group
    val sizes = sk.groupBy($"grp").count().as[(String, Long)].collect().toMap
    assert(sizes("small") == 30L && sizes("big") == 128L)
    val est = Sketch.kmvEstimateBy(sk, 128)
      .select($"grp", $"est_distinct").as[(String, Long)].collect().toMap
    assert(est("small") == 30L, s"sub-k group must be exact: $est")
    assert(est("big") > 6000L && est("big") < 10000L,
      s"big-group estimate out of the k=128 band: $est")
    // per-group result equals the global sketch run on that group alone
    val alone = Sketch.kmvEstimate(Sketch.kmvSketch(
        rows.filter(_._1 == "big").toDF("g", "v"), "v", 128), 128)
      .select($"est_distinct").as[Long].collect().head
    assert(est("big") == alone, "grouped sketch must equal per-group runs")
  }

  test("X5t KMV merge closure: merged shard sketches equal the direct " +
      "sketch of the union, overlap and all") {
    val a = (1 to 3000).map(i => s"v$i").toDF("v")
    val b = (2000 to 5000).map(i => s"v$i").toDF("v") // overlaps a
    val merged = Sketch.kmvMerge(64,
        Sketch.kmvSketch(a, "v", 64), Sketch.kmvSketch(b, "v", 64))
      .as[Long].collect().toSeq
    val direct = Sketch.kmvSketch(a.unionAll(b).toDF("v"), "v", 64)
      .as[Long].collect().toSeq
    assert(merged == direct,
      "bottom-k of merged sketches must equal the direct union sketch")
  }
}
