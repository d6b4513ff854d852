package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals plain aggregation under heavy skew") {
    // 10k rows of one hot key + scattered tail
    val df = (1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"k$i", i.toDouble))
    val in = df.toDF("key", "v")
    val salted = Scale.saltedSum(in, "key", "v")
      .select("key", "total", "n").as[(String, Double, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val plain = in.groupBy("key").agg(sum("v").as("t"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(salted.keySet == plain.keySet)
    assert(salted("hot")._2 == 10000L)
    assert(math.abs(salted("hot")._1 - plain("hot")._1) < 1e-6)
  }

  test("salted join equals plain join") {
    val facts = (1 to 1000).map(i => (if (i % 10 == 0) "a" else s"k${i % 7}", i))
      .toDF("key", "v")
    val dim = Seq(("a", "hot-dim"), ("k1", "d1"), ("k2", "d2")).toDF("key", "label")
    val salted = Scale.saltedJoin(facts, dim, "key")
      .groupBy("key", "label").count()
      .as[(String, String, Long)].collect().toSet
    val plain = facts.join(dim, Seq("key"))
      .groupBy("key", "label").count()
      .as[(String, String, Long)].collect().toSet
    assert(salted == plain)
  }

  test("binned range join equals the theta join and plans as an equi-join") {
    val points = (0 until 500).map(i => (i.toLong, (i * 7919 % 1000).toDouble))
      .toDF("id", "v")
    val intervals = Seq((0.0, 120.0, "a"), (100.0, 430.0, "b"),
      (430.0, 431.5, "c"), (990.0, 1000.0, "d")).toDF("lo", "hi", "band")
    val theta = points.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band").as[(Long, String)].collect().toSet
    val binned = graft.ops.Scale.binnedRangeJoin(points, "v",
        intervals, "lo", "hi", binWidth = 50.0)
      .select("id", "band").as[(Long, String)].collect().toSet
    assert(binned == theta) // incl. overlap region 100-120 matching twice
    val p = planOf(graft.ops.Scale.binnedRangeJoin(points, "v",
      intervals, "lo", "hi", binWidth = 50.0))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
  }

  test("AQE splits the skewed partition of a hot-key sort-merge join at runtime") {
    // the runtime complement of Scale.saltedJoin: for JOIN skew Spark's
    // OptimizeSkewedJoin re-plans oversized partitions into chunks, so a
    // hot key stops being one straggler task without any salting. Salting
    // stays necessary for AGGREGATION skew (AQE has no skew-agg rule) —
    // which is exactly the x6_salted_agg story. Thresholds are lowered so
    // the sf-sized fixture crosses them; at 100 TB the defaults do.
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the payload must be incompressible (rand): skew detection reads
      // COMPRESSED map-output sizes, and a hot key whose rows are all
      // near-identical lz4s below any realistic threshold — which is
      // itself a scale lesson: repetitive hot-key payloads can hide from
      // byte-based skew detection
      val facts = spark.range(0, 1000000).select(
        when(col("id") % 100 < 95, lit(0L)).otherwise(col("id") % 101)
          .as("skew_key"),
        (rand(42) * 1000).as("payload"))
      val dim = spark.range(0, 101).select(col("id").as("skew_key"),
        (col("id") * 3).as("weight"))
      val joined = facts.join(dim, Seq("skew_key"))
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("t"))
      // execute THIS queryExecution so the final adaptive plan is readable
      val row = joined.collect().head
      assert(row.getLong(0) == 1000000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "expected OptimizeSkewedJoin to mark the hot-key join:\n" +
          plan.take(4000))
    } finally restore()
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("wh").toString
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    Scale.writeBucketed(a, "bucketed_a", "k", 8, Some(wh))
    Scale.writeBucketed(b, "bucketed_b", "k", 8, Some(wh))
    // tiny test tables would auto-broadcast; force the SMJ path the
    // bucketing is for (at real scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Scale.bucketedJoin(spark, "bucketed_a", "bucketed_b", "k")
      val plan = planOf(joined)
      assert(joined.count() == 1000)
      // co-located scan: SortMergeJoin with no shuffle Exchange on either side
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    spark.sql("DROP TABLE IF EXISTS bucketed_a")
    spark.sql("DROP TABLE IF EXISTS bucketed_b")
  }

  test("temperature sampling keeps the rarest stratum whole and " +
      "sqrt-compresses the head") {
    // 1000 'big' rows vs 40 'small': alpha=0.5 keeps small at rate 1.0
    // (h² < 65536² always) and big at sqrt(40/1000) ≈ 0.2
    val df = ((1 to 1000).map(i => (i.toLong, "big")) ++
      (2001 to 2040).map(i => (i.toLong, "small"))).toDF("id", "s")
    val kept = Scale.temperatureSample(df, "id", "s")
    val bySt = kept.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(bySt("small") == 40L, "rarest stratum must be kept whole")
    val expect = 1000 * math.sqrt(40.0 / 1000.0)
    assert(math.abs(bySt("big") - expect) < 60,
      s"head stratum ${bySt("big")} should be near sqrt-rate ${expect.round}")
    // deterministic: same rows on every run, and a subset of the input
    val again = Scale.temperatureSample(df, "id", "s")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("id").as[Long].collect().sorted.toSeq)
  }

  test("X5n stratified split: exact per-stratum proportions, total " +
      "disjoint cover, deterministic") {
    // uneven strata incl. a tiny one — the case hash-threshold splits lose
    val df = ((1 to 200).map(i => (i.toLong, "big")) ++
      (201 to 230).map(i => (i.toLong, "mid")) ++
      (231 to 235).map(i => (i.toLong, "tiny"))).toDF("id", "s")
    val out = Scale.stratifiedSplit(df, "id", "s", 80, 10)
      .select($"id", $"s", $"split").as[(Long, String, String)]
      .collect().toSeq
    assert(out.size == 235 && out.map(_._1).distinct.size == 235)
    val byStratum = out.groupBy(_._2).view.mapValues(
      _.groupBy(_._3).view.mapValues(_.size).toMap).toMap
    // exact floor thresholds: rank·100 <= n·pct
    assert(byStratum("big") == Map("train" -> 160, "val" -> 20, "test" -> 20))
    assert(byStratum("mid") == Map("train" -> 24, "val" -> 3, "test" -> 3))
    // n=5: train = floor-threshold 4, val rank·100<=450 adds none — the
    // tiny stratum keeps its test doc rather than rounding it away
    assert(byStratum("tiny") == Map("train" -> 4, "test" -> 1))
    // re-run is bit-identical
    val again = Scale.stratifiedSplit(df, "id", "s", 80, 10)
      .select($"id", $"s", $"split").as[(Long, String, String)]
      .collect().toSeq
    assert(again.sorted == out.sorted)
  }

  test("X5o leak-free split: cluster members share one assignment; " +
      "100% train uses the sentinel threshold") {
    // 300 docs in 100 3-doc clusters (cluster id = id / 3 * 3)
    val df = (0L until 300L).map(i => (i, i / 3 * 3)).toDF("doc_id", "cluster")
    val out = Scale.leakFreeSplit(df, "cluster", 80, 10)
      .select($"doc_id", $"cluster", $"split")
      .as[(Long, Long, String)].collect()
    // no component straddles a split boundary
    val perCluster = out.groupBy(_._2).values
    assert(perCluster.forall(_.map(_._3).distinct.length == 1))
    // all three splits materialize and proportions are hash-plausible
    val bySplit = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 150 && bySplit("train") < 290)
    // pct rounding to 65536 must keep everything (no 5-char hex trap)
    val allTrain = Scale.leakFreeSplit(df, "cluster", 100, 0)
      .select($"split").distinct().as[String].collect().toSeq
    assert(allTrain == Seq("train"))
  }

  test("X5m tokenBudgetSample: whole docs only, never overshoots, fills " +
      "in md5(id) order, unbudgeted groups drop out") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    // 40 docs of 10 tokens each in 'en', 3 docs in 'de', 2 in 'zh'
    // (zh has no budget line and must not appear at all)
    val docs = ((0L until 40L).map(i => (i, Seq.fill(10)("w").mkString(" "), "en")) ++
      Seq((100L, "a b c", "de"), (101L, "d e", "de"), (200L, "x", "zh"),
        (201L, "y", "zh"))).toDF("doc_id", "text", "lang")
    val out = Scale.tokenBudgetSample(docs, "doc_id", "text", "lang",
        Seq("en" -> 95L, "de" -> 10L))
      .as[(Long, String, Long, Long)].collect().toSeq
    val byLang = out.groupBy(_._2)
    // en: 10-token docs against a 95 budget -> exactly 9 whole docs, 90
    // tokens — the 10th would overshoot and must be cut
    assert(byLang("en").map(_._3).sum == 90L && byLang("en").length == 9)
    // the 9 kept docs are the md5-order prefix of the group
    val expectEn = (0L until 40L).sortBy(i => (md5hex(i.toString), i)).take(9).toSet
    assert(byLang("en").map(_._1).toSet == expectEn)
    // de: both docs fit (5 <= 10); zh absent entirely
    assert(byLang("de").map(_._1).toSet == Set(100L, 101L))
    assert(!byLang.contains("zh"))
    // cum_toks is the running fill line within each group
    assert(out.forall(r => r._4 <= (if (r._2 == "en") 95L else 10L)))
  }

  test("J6c intervalOverlapJoin: binned equi-join equals the naive " +
      "theta join, pairs spanning several shared bins emit exactly once") {
    val a = Seq((1L, 10L, 0L, 250L),      // covers bins 0,1,2 at W=100
        (1L, 11L, 300L, 340L),
        (2L, 12L, 0L, 50L))
      .toDF("k", "a_id", "a_s", "a_e")
    val b = Seq((1L, 20L, 50L, 230L),     // overlaps a10 across bins 0,1,2
        (1L, 21L, 320L, 330L),            // inside a11
        (1L, 22L, 260L, 290L),            // gap — no overlap
        (2L, 23L, 60L, 70L))              // same bin, wrong key overlap? no: k=2, a12 ends 50
      .toDF("k", "b_id", "b_s", "b_e")
    val out = Scale.intervalOverlapJoin(a, "a_s", "a_e", b, "b_s", "b_e",
        Seq("k"), 100L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq.sorted
    // naive: (10,20) overlap [50,230]; (11,21); nothing else (23 starts
    // after 12 ends; 22 touches neither)
    assert(out == Seq((10L, 20L), (11L, 21L)),
      s"binned join disagreed with naive: $out")
    // duplicate-freedom under shared multi-bin coverage is the claim —
    // (10,20) share bins 0,1,2 and must appear exactly once (canonical
    // bin = bin of max(starts) = 0)
    assert(out.distinct == out)
    // boundary: touching endpoints (a_e == b_s) DO overlap (closed)
    val touch = Scale.intervalOverlapJoin(
        Seq((1L, 1L, 0L, 100L)).toDF("k", "a_id", "a_s", "a_e"),
        "a_s", "a_e",
        Seq((1L, 2L, 100L, 150L)).toDF("k", "b_id", "b_s", "b_e"),
        "b_s", "b_e", Seq("k"), 30L)
      .count()
    assert(touch == 1L, "closed-interval touch must match")
  }
}
