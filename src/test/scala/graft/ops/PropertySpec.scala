package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3), driven with raw ScalaCheck
  * generators on fixed seeds (no scalatestplus bridge in the offline
  * dependency set). Each case builds a small local dataset and runs one
  * Spark job. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](gen: Gen[T], n: Int = 8)(f: T => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val quote = Gen.chooseNum(0.01, 1000.0)

  test("mid is always within [min(bid,ask), max(bid,ask)]") {
    cases(Gen.listOfN(20, Gen.zip(quote, quote))) { pairs =>
      val df = pairs.toDF("bid", "ask")
      val bad = CoreOps.withMid(df)
        .filter(col("mid") < least(col("bid"), col("ask")) ||
          col("mid") > greatest(col("bid"), col("ask")))
      assert(bad.count() == 0)
    }
  }

  test("OHLC bars: low <= open, close <= high") {
    val tick = Gen.zip(Gen.chooseNum(0L, 3600L), quote)
    cases(Gen.listOfN(50, tick)) { ticks =>
      val df = ticks.zipWithIndex
        .map { case ((off, v), i) =>
          (new java.sql.Timestamp(1704067200000L + off * 1000 + i), v)
        }
        .toDF("ts", "value")
      val bars = df.groupBy(window(col("ts"), "15 minutes"))
        .agg(expr("min_by(value, ts)").as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          expr("max_by(value, ts)").as("close"))
      val bad = bars.filter(
        col("low") > col("open") || col("low") > col("close") ||
          col("high") < col("open") || col("high") < col("close"))
      assert(bad.count() == 0)
    }
  }

  test("exact dedup is idempotent and survivors are unique") {
    cases(Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.posNum[Long]))) {
      rows =>
        val df = rows.toDF("key", "doc_id")
        val once = Dedup.exactByKey(df, Seq("key"), "doc_id")
        assert(once.select("key").distinct().count() == once.count())
        val twice = Dedup.exactByKey(
          once.withColumnRenamed("keep_doc_id", "doc_id"), Seq("key"), "doc_id")
        assert(twice.count() == once.count())
    }
  }

  test("jaccard is within [0,1] and pairs are canonical (d1<d2)") {
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    cases(Gen.listOfN(6, doc), n = 5) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "x") }
        .toDF("doc_id", "text", "blk")
      val pairs = Dedup.jaccardPairs(df, "text", "doc_id", Seq("blk"))
      val bad = pairs.filter(col("jac") < 0 || col("jac") > 1 ||
        col("d1") >= col("d2"))
      assert(bad.count() == 0)
    }
  }

  test("graft_minhash kernel == builtin md5 fold on random unicode/empty tokens") {
    graft.functions.GraftFunctions.register(spark)
    // tokens with the nasty cases: empty strings, spaces inside? no —
    // split(' ') can't yield tokens containing spaces, but CAN yield
    // empty strings (consecutive separators) and any unicode
    val token = Gen.oneOf(
      Gen.const(""),
      Gen.alphaNumStr.map(_.take(6)),
      Gen.listOfN(3, Gen.oneOf("é", "ß", "中", "🚀", "a")).map(_.mkString))
    cases(Gen.listOfN(12, Gen.listOfN(8, token)), n = 6) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "toks")
        .filter(size(col("toks")) >= 3)
        .withColumn("shingles", expr(
          "transform(sequence(1, size(toks) - 2), " +
            "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))
      val builtin = df.withColumn("sig", expr(
        "transform(sequence(0, 7), h -> array_min(transform(shingles, " +
          "s -> concat(substring(md5(s), h*4+1, 32-h*4), " +
          "substring(md5(s), 1, h*4)))))"))
        .select("doc_id", "sig").as[(Long, Seq[String])].collect().toMap
      val fused = df.withColumn("sig", expr("graft_minhash(toks, 8, 3)"))
        .select("doc_id", "sig").as[(Long, Seq[String])].collect().toMap
      assert(fused == builtin)
    }
  }

  test("binned range join == theta join for random intervals/points/binWidth") {
    val point = Gen.chooseNum(-100.0, 100.0)
    val interval = Gen.zip(point, Gen.chooseNum(0.0, 50.0))
      .map { case (lo, span) => (lo, lo + span) }
    val input = Gen.zip(Gen.listOfN(60, point), Gen.listOfN(6, interval),
      Gen.oneOf(0.5, 3.0, 17.0, 100.0))
    cases(input, n = 5) { case (ps, ivs, width) =>
      val points = ps.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val intervals = ivs.zipWithIndex
        .map { case ((lo, hi), i) => (lo, hi, i.toLong) }
        .toDF("lo", "hi", "iid")
      val theta = points.join(intervals,
          col("v") >= col("lo") && col("v") < col("hi"))
        .select("id", "iid").as[(Long, Long)].collect().toSet
      val binned = Scale.binnedRangeJoin(points, "v", intervals,
          "lo", "hi", width)
        .select("id", "iid").as[(Long, Long)].collect().toSet
      assert(binned == theta)
    }
  }

  test("int8 quantization reconstructs within half a quantum, any vector") {
    val comp = Gen.chooseNum(-10.0f, 10.0f)
    cases(Gen.listOfN(6, Gen.listOfN(8, comp)), n = 5) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val rows = Similarity.quantizeInt8(df, "embedding")
        .select("qscale", "q", "v").collect()
      rows.foreach { r =>
        if (!r.isNullAt(0)) { // zero vectors carry null scale by contract
          val scale = r.getDouble(0)
          val q = r.getSeq[Int](1)
          val v = r.getSeq[Double](2)
          assert(q.forall(x => x >= -127 && x <= 127))
          assert(q.zip(v).forall { case (qi, xi) =>
            math.abs(qi / scale - xi) <= 0.5 / scale + 1e-12 })
        }
      }
    }
  }

  test("state machine currentState is stable under log shuffling") {
    val trans = Gen.zip(Gen.chooseNum(1L, 3L), Gen.oneOf(1000, 1001, 1100, 1200, 1300, 1900))
    cases(Gen.listOfN(20, trans), n = 5) { rows =>
      val log = rows.zipWithIndex
        .map { case ((job, act), i) =>
          (job, act, new java.sql.Timestamp(1704067200000L + i * 1000L), i.toLong)
        }
      val a = StateMachine.currentState(
        log.toDF("job_id", "action", "ts", "event_id"))
      val b = StateMachine.currentState(
        scala.util.Random.shuffle(log).toDF("job_id", "action", "ts", "event_id"))
      assert(a.orderBy("job_id").collect().toSeq ==
        b.orderBy("job_id").collect().toSeq)
    }
  }

  test("applyCdc == in-memory MERGE model on random change logs") {
    // target keys 0..9; random logs of upserts/deletes with unique seqs.
    // Reference model: sort by seq, fold into a map (upsert sets value,
    // delete removes) — applyCdc must produce exactly that state.
    val change = Gen.zip(
      Gen.chooseNum(0L, 14L),                // key (some absent from target)
      Gen.oneOf("U", "U", "U", "D"),         // bias toward upserts
      Gen.chooseNum(1, 999))                 // payload
    cases(Gen.listOfN(25, change), n = 8) { rows =>
      val target = (0L to 9L).map(k => (k, k * 10.0)).toDF("k", "price")
      val log = rows.zipWithIndex.map { case ((k, op, v), i) =>
        (k, i.toLong, op, if (op == "D") null.asInstanceOf[java.lang.Double]
          else java.lang.Double.valueOf(v.toDouble))
      }
      val model = scala.collection.mutable.Map((0L to 9L).map(k => k -> k * 10.0): _*)
      log.sortBy(_._2).foreach { case (k, _, op, v) =>
        if (op == "D") model.remove(k) else model(k) = v.doubleValue()
      }
      val got = Cdc.applyCdc(target,
          log.toDF("k", "seq", "op", "price"), Seq("k"), "seq", "op")
        .orderBy("k").as[(Long, Double)].collect().toSeq
      assert(got == model.toSeq.sortBy(_._1),
        s"log=${log.sortBy(_._2)}")
    }
  }

  test("mergeScoped snapshot == batch applyCdc on random split points") {
    // the key-scoped streaming path must equal the batch operator for ANY
    // partitioning of the same log into sequential batches
    val change = Gen.zip(Gen.chooseNum(0L, 14L), Gen.oneOf("U", "U", "D"),
      Gen.chooseNum(1, 999))
    cases(Gen.zip(Gen.listOfN(16, change), Gen.chooseNum(1, 15)), n = 4) {
      case (rows, splitAt) =>
        val target = (0L to 9L).map(k => (k, k * 10.0)).toDF("k", "price")
        val log = rows.zipWithIndex.map { case ((k, op, v), i) =>
          (k, i.toLong, op, if (op == "D") null.asInstanceOf[java.lang.Double]
            else java.lang.Double.valueOf(v.toDouble))
        }
        val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
        Cdc.initSnapshot(target, dir, Seq("k"), 4)
        log.splitAt(splitAt).productIterator.foreach { half =>
          val batch = half.asInstanceOf[Seq[(Long, Long, String, java.lang.Double)]]
          if (batch.nonEmpty)
            Cdc.mergeScoped(batch.toDF("k", "seq", "op", "price"),
              Seq("k"), "seq", "op", dir)
        }
        val streamed = Cdc.latestSnapshot(spark, dir)
          .orderBy("k").as[(Long, Double)].collect().toSeq
        val batched = Cdc.applyCdc(target,
            log.toDF("k", "seq", "op", "price"), Seq("k"), "seq", "op")
          .orderBy("k").as[(Long, Double)].collect().toSeq
        assert(streamed == batched, s"split=$splitAt log=$log")
    }
  }

  test("snapshot lifecycle model: random merge/compact sequences preserve " +
      "latest state, metadata count, time travel, and diff closure") {
    // drive the whole versioned-snapshot surface against an in-memory
    // model: merges (latest-wins upsert/delete) and compactions in random
    // order; afterwards EVERY recorded version must time-travel to its
    // model state, the manifest count must equal the model size without
    // touching data, and replaying snapshotDiff(0, latest) onto the seed
    // model must land exactly on the final model (CDF closure)
    val change = Gen.zip(Gen.chooseNum(0L, 14L), Gen.oneOf("U", "U", "D"),
      Gen.chooseNum(1, 999))
    val step = Gen.oneOf("M", "M", "M", "C")
    cases(Gen.zip(Gen.listOfN(5, step), Gen.listOfN(5, Gen.listOfN(4, change))),
      n = 3) { case (steps, batches) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_life").toString
      var model = (0L to 9L).map(k => k -> k * 10.0).toMap
      val byVersion = scala.collection.mutable.Map(0 -> model)
      Cdc.initSnapshot(model.toSeq.toDF("k", "price"), dir, Seq("k"), 4)
      var v = 0
      var seq = 0L
      steps.zip(batches).foreach {
        case ("C", _) =>
          v = Cdc.compactSnapshot(spark, dir)
          byVersion(v) = model
        case (_, rows) =>
          val batch = rows.map { case (k, op, p) =>
            seq += 1
            (k, seq, op, if (op == "D") null.asInstanceOf[java.lang.Double]
              else java.lang.Double.valueOf(p.toDouble))
          }
          batch.groupBy(_._1).foreach { case (k, rs) =>
            val w = rs.maxBy(_._2)
            if (w._3 == "D") model -= k else model += k -> w._4.doubleValue()
          }
          Cdc.mergeScoped(batch.toDF("k", "seq", "op", "price"),
            Seq("k"), "seq", "op", dir)
          v += 1
          byVersion(v) = model
      }
      def state(ver: Int): Map[Long, Double] =
        Cdc.snapshotAt(spark, dir, ver).as[(Long, Double)].collect().toMap
      assert(state(v) == model, s"latest != model after $steps")
      assert(Cdc.snapshotCount(spark, dir) == model.size.toLong)
      byVersion.foreach { case (ver, m) =>
        assert(state(ver) == m, s"time travel to v$ver diverged")
      }
      val replayed = Cdc.snapshotDiff(spark, dir, 0, v).collect()
        .foldLeft(byVersion(0)) { (m, r) =>
          if (r.getString(1) == "D") m - r.getLong(0)
          else m + (r.getLong(0) -> r.getDouble(2))
        }
      assert(replayed == model, "CDF replay onto v0 missed the final state")
    }
  }

  test("decontaminate == brute-force n-gram overlap model on random docs") {
    // tiny vocabulary so overlap actually occurs; the model is the naive
    // set intersection the operator must never be allowed to drift from
    val doc = Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e"))
    cases(Gen.zip(Gen.listOfN(6, doc), Gen.listOfN(3, doc)), n = 4) {
      case (docs, bench) =>
        val g = 3
        def grams(toks: List[String]): Set[String] =
          if (toks.length < g) Set.empty
          else toks.sliding(g).map(_.mkString(" ")).toSet
        val benchGrams = bench.flatMap(grams).toSet
        val expected = docs.zipWithIndex.map { case (t, i) =>
          (i.toLong, grams(t).count(benchGrams.contains).toLong)
        }
        val got = TextOps.decontaminate(
            docs.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
              .toDF("doc_id", "text"),
            bench.map(t => Tuple1(t.mkString(" "))).toDF("text"),
            "text", "doc_id", n = g)
          .select(col("doc_id"), col("n_contaminated"))
          .orderBy("doc_id").as[(Long, Long)].collect().toSeq
        assert(got == expected, s"docs=$docs bench=$bench")
    }
  }

  test("pointLookup finds every present key and nothing else, any nBuckets") {
    val keys = Gen.listOfN(20, Gen.chooseNum(-1000000L, 1000000L))
    cases(Gen.zip(keys, Gen.chooseNum(1, 32)), n = 4) { case (ks, n) =>
      val present = ks.distinct
      val dir = java.nio.file.Files.createTempDirectory("graft_pt_prop").toString
      Cdc.initSnapshot(present.map(k => (k, k * 2.0)).toDF("k", "price"),
        dir, Seq("k"), n)
      // every present key resolves to exactly its row (driver-side hash
      // routing == the layout's hash, for ANY bucket count incl. 1)
      present.foreach { k =>
        val got = Cdc.pointLookup(spark, dir, Seq(Seq(k)))
          .as[(Long, Double)].collect().toSeq
        assert(got == Seq((k, k * 2.0)), s"k=$k n=$n")
      }
      // absent keys (just outside the domain) resolve to nothing
      val absent = (1 to 5).map(i => 1000000L + i)
      assert(Cdc.pointLookup(spark, dir, absent.map(Seq[Any](_)))
        .isEmpty, s"absent probe hit, n=$n")
      // and a batched lookup of everything equals the table
      assert(Cdc.pointLookup(spark, dir, present.map(Seq[Any](_)))
        .count() == present.size.toLong)
    }
  }

  test("mergeWithRetry absorbs a commit conflict and lands both merges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_retry").toString
    Cdc.initSnapshot((0L to 3L).map(k => (k, k * 10.0)).toDF("k", "price"),
      dir, Seq("k"), 4)
    val mine = Seq((1L, 1L, "U", java.lang.Double.valueOf(111.0)))
      .toDF("k", "seq", "op", "price")
    val theirs = Seq((2L, 1L, "U", java.lang.Double.valueOf(222.0)))
      .toDF("k", "seq", "op", "price")
    @volatile var fired = false
    Cdc.commitFence = () =>
      if (!fired) { fired = true; Cdc.mergeScoped(theirs, Seq("k"), "seq", "op", dir) }
    try Cdc.mergeWithRetry(mine, Seq("k"), "seq", "op", dir)
    finally Cdc.commitFence = () => ()
    // first attempt lost the race, the retry serialized after the winner:
    // BOTH merges are in the final state, nothing silently dropped
    assert(Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, Double)].collect().toSeq ==
      Seq((0L, 0.0), (1L, 111.0), (2L, 222.0), (3L, 30.0)))
  }

  test("temperature sampling invariants on random strata: subset of " +
      "input, rarest stratum whole, kept rates monotone in stratum size") {
    val strata = Gen.listOfN(4, Gen.chooseNum(20, 400))
    cases(strata, n = 6) { sizes =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, si) =>
        (0 until sz).map(i => (si.toLong * 100000 + i, s"s$si"))
      }
      val df = rows.toDF("id", "g")
      val kept = Scale.temperatureSample(df, "id", "g")
        .groupBy("g").count().as[(String, Long)].collect().toMap
      val bySize = sizes.zipWithIndex.map { case (sz, si) =>
        (sz, kept.getOrElse(s"s$si", 0L))
      }
      val minSz = sizes.min
      // the (a) rarest stratum survives whole
      bySize.filter(_._1 == minSz).foreach { case (sz, k) =>
        assert(k == sz, s"rarest stratum $sz kept $k")
      }
      // (b) nothing is invented, every stratum keeps at most its size
      bySize.foreach { case (sz, k) => assert(k <= sz) }
      // (c) kept FRACTION decreases as stratum size grows (within md5
      // noise: compare against the exact sqrt rate with slack)
      bySize.foreach { case (sz, k) =>
        val expect = sz * math.sqrt(minSz.toDouble / sz)
        assert(math.abs(k - expect) < 12 + 0.15 * expect,
          s"stratum size $sz kept $k, expected ~${expect.round}")
      }
    }
  }

  test("cusum == sequential in-memory fold on random tick series") {
    val series = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(-200L, 200L)))
    cases(series, n = 6) { rows =>
      val ticks = rows.zipWithIndex.map { case ((k, c), i) =>
        (k, i.toLong, 1000L + c)
      }
      val df = ticks.toDF("k", "id", "cents")
        .withColumn("ts", timestamp_micros(col("id") * 1000000L))
      val got = TimeSeries.cusum(df, "k", "ts", "id", col("cents"),
          7L, 40L)
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      // the definitional model: per key in id order, the clamped fold
      val want = ticks.groupBy(_._1).toSeq.flatMap { case (k, ts) =>
        var prev = 0L; var up = 0L; var dn = 0L; var first = true
        ts.sortBy(_._2).map { case (_, id, cents) =>
          if (first) { prev = cents; first = false }
          val d = cents - prev; prev = cents
          up = math.max(0L, up + d - 7L)
          dn = math.max(0L, dn - d - 7L)
          (id, k, cents, d, up, dn, if (up > 40L || dn > 40L) 1L else 0L)
        }
      }.sortBy(_._1)
      assert(got == want)
    }
  }

  test("basket pairCounts == brute-force pair model on random baskets") {
    val lines = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0, 9)))
    cases(lines, n = 6) { rows =>
      val df = rows.map { case (bk, it) => (bk, s"i$it") }
        .toDF("bk", "item")
      val got = Basket.pairCounts(df, "bk", "item", maxBasket = 4)
        .as[(String, String, Long)].collect().toSet
      val want = rows.map { case (bk, it) => (bk, s"i$it") }.distinct
        .groupBy(_._1).values.filter(_.size <= 4)
        .flatMap { items =>
          val is = items.map(_._2).sorted
          for (a <- is; b <- is if a < b) yield (a, b)
        }
        .groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
        .toSet
      assert(got == want)
    }
  }

  test("bfsHops == brute-force BFS on random sparse digraphs") {
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L)))
    cases(edgeGen, n = 6) { raw =>
      val edges = raw.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst")
        val sources = Seq(0L, 5L).toDF("node")
        val got = Graph.bfsHops(df, sources, 4)
          .as[(Long, Long)].collect().toMap
        // model: frontier BFS over the adjacency map, depth <= 4
        val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
        var dist = Map(0L -> 0L, 5L -> 0L)
        var frontier = Set(0L, 5L)
        (1 to 4).foreach { h =>
          val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
            .filterNot(dist.contains)
          dist = dist ++ next.map(_ -> h.toLong)
          frontier = next
        }
        assert(got == dist)
      }
    }
  }

  test("boilerplate: with an impossible minDocs nothing is stripped and " +
      "clean text reconstructs the input verbatim") {
    val docGen = Gen.listOfN(10, Gen.chooseNum(1, 17))
    cases(docGen, n = 6) { lens =>
      val docs = lens.zipWithIndex.map { case (len, i) =>
        (i.toLong, (1 to len).map(j => s"w${(i * 31 + j * 7) % 23}")
          .mkString(" "))
      }
      val out = TextOps.boilerplate(docs.toDF("doc_id", "text"),
          "doc_id", "text", 3, minDocs = 100L)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      docs.foreach { case (id, text) =>
        val r = out(id)
        assert(r._3 == 0L, s"doc $id stripped chunks under minDocs=100")
        assert(r._4 == text, s"doc $id reassembly mismatch")
      }
    }
  }

  test("personalizedPageRank == in-memory integer model on random digraphs") {
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 9L)))
    cases(edgeGen, n = 6) { raw =>
      val edges = raw.filter(e => e._1 != e._2).distinct
      if (edges.nonEmpty) {
        val got = Graph.personalizedPageRank(edges.toDF("src", "dst"),
            Seq(0L, 3L).toDF("node"), 2)
          .as[(Long, Long)].collect().toMap
        // model: identical integer-ppm recursion
        val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
        val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
        val isSrc = Set(0L, 3L)
        var score = nodes.map(v =>
          v -> (if (isSrc(v)) 1000000L else 0L)).toMap
        (1 to 2).foreach { _ =>
          val contrib = scala.collection.mutable.Map.empty[Long, Long]
            .withDefaultValue(0L)
          edges.foreach { case (s, t) =>
            contrib(t) += score(s) / outdeg(s)
          }
          score = nodes.map(v => v -> ((if (isSrc(v)) 150000L else 0L)
            + 850L * contrib(v) / 1000L)).toMap
        }
        assert(got == score)
      }
    }
  }

  test("closesSummary == in-memory model on random tick series") {
    val series = Gen.listOfN(50,
      Gen.zip(Gen.chooseNum(0L, 2L), Gen.chooseNum(0L, 400L)))
    cases(series, n = 6) { rows =>
      val hour = 3600000000L
      val ticks = rows.zipWithIndex.map { case ((k, c), i) =>
        // ~14 ticks per bucket so buckets and closes are both exercised
        (k, i.toLong, i.toLong * 250000000L, 1000L + c)
      }
      val df = ticks.toDF("k", "id", "us", "cents")
        .withColumn("ts", timestamp_micros($"us"))
      val got = TimeSeries.closesSummary(df, "k", "ts", "id",
          col("cents"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getLong(5))).toMap
      val want = ticks.groupBy(_._1).map { case (k, ts) =>
        val closes = ts.groupBy(_._3 / hour).toSeq.sortBy(_._1)
          .map(_._2.maxBy(t => (t._3, t._2))._4)
        val ds = closes.zip(closes.drop(1)).map { case (a, b) => b - a }
        val peaks = closes.scanLeft(Long.MinValue)(math.max).drop(1)
        k -> ((closes.size.toLong,
          if (ds.isEmpty) None else Some(ds.sum),
          if (ds.isEmpty) None else Some(ds.map(d => d * d).sum),
          peaks.zip(closes).map { case (p, c) => p - c }.max))
      }
      assert(got == want)
    }
  }

  test("content fingerprint is invariant under permutation and " +
      "partitioning for random tables") {
    val table = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 30L), Gen.chooseNum(-500L, 500L)))
    cases(table, n = 6) { rows =>
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (i.toLong, s"g${g % 3}", v) }
        .toDF("k", "g", "v")
      def fp(d: org.apache.spark.sql.DataFrame) =
        Cdc.contentFingerprint(d, Seq("g"), Seq("k", "g", "v"))
          .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
      assert(fp(df) == fp(df.orderBy(col("v"), col("k").desc).repartition(5)))
    }
  }

  test("scc labels equal brute-force mutual-reachability minima on " +
      "random digraphs (r15)") {
    // random sparse digraphs over <= 14 nodes: small enough for an
    // in-driver Floyd–Warshall ground truth, big enough to produce real
    // cycle structure (self-loops and duplicates included deliberately —
    // scc must normalize them away)
    val edgeGen = Gen.listOfN(26,
      Gen.zip(Gen.chooseNum(0L, 13L), Gen.chooseNum(0L, 13L)))
    cases(edgeGen, n = 8) { es =>
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      if (nodes.nonEmpty) {
        val idx = nodes.zipWithIndex.toMap
        val n = nodes.length
        val reach = Array.fill(n, n)(false)
        nodes.indices.foreach(i => reach(i)(i) = true)
        es.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
        for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
          if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
        val want = nodes.indices.map { i =>
          // smallest node mutually reachable with i (i itself included)
          val m = nodes.indices
            .filter(j => reach(i)(j) && reach(j)(i)).map(nodes).min
          nodes(i) -> m
        }.toMap
        // drop self-loop-only nodes the operator also drops? scc keeps
        // every node that appears on any edge (incl. self-loops filtered
        // to nothing — such a node still appears in src/dst). Build the
        // edge frame exactly as generated.
        val got = Graph.scc(es.toDF("src", "dst"), maxOuter = 20)
          .as[(Long, Long)].collect().toMap
        assert(got == want, s"edges=$es\n got=$got\nwant=$want")
      }
    }
  }

  test("winsorized mean never exceeds the raw mean, and a cut above the " +
      "max is the identity (signed data too — floor bucketing, any width)") {
    val row = Gen.chooseNum(-5000L, 50000L)
    cases(Gen.zip(Gen.listOfN(40, row), Gen.chooseNum(1L, 500L))) {
      case (cs, w) =>
        val df = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
          .toDF("id", "cents")
        val r = Experiment.winsorizedMean(df, col("cents"), 900000L, w)
          .select(col("cut_cents"), col("mean_milli"),
            col("win_mean_milli"))
          .as[(Long, Long, Long)].collect().head
        assert(r._3 <= r._2, s"clamping must not raise the mean: $r")
        if (r._1 >= cs.max) assert(r._3 == r._2,
          s"cut >= max must be the identity: $r vs max=${cs.max}")
    }
  }

  test("poisson bootstrap of a CONSTANT metric: every resample mean is " +
      "exactly the constant (weights cancel)") {
    cases(Gen.zip(Gen.chooseNum(1L, 9999L), Gen.chooseNum(5, 60)), n = 4) {
      case (c, nRows) =>
        val df = (1L to nRows.toLong).map(i => (i, c)).toDF("id", "cents")
        val means = Experiment.poissonBootstrap(df, "id", col("cents"), 8)
          .select(col("n_eff"), col("mean_milli"))
          .as[(Long, Long)].collect().toSeq
        means.foreach { case (nEff, m) =>
          if (nEff > 0) assert(m == c * 1000L,
            s"constant metric must bootstrap to itself: $m vs ${c * 1000L}")
        }
    }
  }

  test("jackknife variance is invariant under a metric shift and the " +
      "LOO means shift by exactly the constant") {
    val row = Gen.chooseNum(0L, 10000L)
    cases(Gen.zip(Gen.listOfN(60, row), Gen.chooseNum(1L, 5000L)), n = 4) {
      case (cs, shift) =>
        val df = cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
          .toDF("id", "cents")
        val df2 = df.withColumn("cents", col("cents") + lit(shift))
        val v1 = Experiment.jackknifeVar(df, "id", col("cents"), 8)
          .select(col("mean_milli"), col("jk_var_milli2"))
          .as[(Long, Long)].collect().head
        val v2 = Experiment.jackknifeVar(df2, "id", col("cents"), 8)
          .select(col("mean_milli"), col("jk_var_milli2"))
          .as[(Long, Long)].collect().head
        assert(v2._1 == v1._1 + shift * 1000L,
          "mean shifts by exactly the constant (1000·c is integer)")
        assert(v2._2 == v1._2, "variance is shift-invariant exactly")
    }
  }

  test("diff-in-diff is exactly invariant to per-arm levels and a " +
      "shared post-period trend") {
    val gen = Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(0L, 5000L),
      Gen.chooseNum(0L, 3000L), Gen.chooseNum(0L, 2000L))
    cases(gen, n = 6) { case (levelA, levelB, trend, effect) =>
      val rows = (1L to 40L).flatMap { u =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"0:$u".getBytes("UTF-8"))
        val top = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        val isA = top % 2 == 0
        val base = if (isA) levelA else levelB
        val post = base + trend + (if (isA) 0L else effect)
        Seq((u, 10_000_000L, base), (u, 2_000_000_000L, post))
      }.toDF("unit", "us", "cents")
        .withColumn("ts", timestamp_micros(col("us")))
      val did = Experiment.diffInDiff(rows, "unit", "ts", col("cents"),
          1_000_000_000L)
        .select(col("did_milli")).as[Long].collect().head
      assert(did == effect * 1000L,
        s"DiD must recover exactly the planted effect: $did vs $effect")
    }
  }

  // ---- independent-derivation replays (round 16, r15 VERDICT item 1) ----
  // The jackknife G-factor escape (r15) proved the oracle harness cannot
  // catch a formula both engines mis-expand the same way: the DuckDB SQL
  // is authored FROM the Scala, so cross-engine hash agreement is not
  // mathematical truth. Each test below recomputes a judged statistic
  // from its DEFINING formula on a driver-side BigInt/Map path — a third
  // representation sharing no code and no SQL with either engine — on
  // RANDOM inputs, exact to the last unit.

  /** Engine arm parity: Sketch.shardOf = first 32 md5("0:id") bits % 2. */
  private def armOf(id: String): String = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"0:$id".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "a" else "b"
  }

  /** Floor division, the engine's pinned (a − pmod(a,b)) div b form.
    * BigInt.mod is the non-negative residue, so this floors for b > 0
    * regardless of sign(a). */
  private def fdiv(a: BigInt, b: BigInt): BigInt = (a - a.mod(b)) / b

  test("X9g cuped == BigInt defining-formula replay on random unit data " +
      "(theta rational, adjusted arm means)") {
    val unit = Gen.zip(Gen.chooseNum(0L, 5000L), Gen.chooseNum(0L, 5000L))
    cases(Gen.listOfN(30, unit), n = 4) { xys =>
      val units = xys.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong + 1L, x, y) }
      val events = units.flatMap { case (u, x, y) =>
        Seq((u, 10_000_000L, x), (u, 2_000_000_000L, y)) }
        .toDF("unit", "us", "cents")
        .withColumn("ts", timestamp_micros(col("us")))
      val got = Experiment.cuped(events, "unit", "ts", col("cents"),
          1_000_000_000L)
        .select(col("arm"), col("n_units"), col("sum_y_cents"),
          col("mean_y_milli"), col("adj_mean_y_milli"), col("theta_micro"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
          r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
      // defining formulas: theta = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and
      // mean_adj = [n·θden·Σy_v − θnum·(n·Σx_v − n_v·Σx)]/(n_v·n·θden)
      val n = BigInt(units.size)
      val sx = BigInt(units.map(_._2).sum)
      val sy = BigInt(units.map(_._3).sum)
      val sxy = units.map { case (_, x, y) => BigInt(x) * BigInt(y) }.sum
      val sxx = units.map { case (_, x, _) => BigInt(x) * BigInt(x) }.sum
      val tNum = n * sxy - sx * sy
      val tDen = n * sxx - sx * sx
      val want = units.groupBy(u => armOf(u._1.toString)).map {
        case (arm, us) =>
          val nV = BigInt(us.size)
          val sxV = BigInt(us.map(_._2).sum)
          val syV = BigInt(us.map(_._3).sum)
          val adj = if (tDen > 0) Some(fdiv(
            1000 * (n * tDen * syV - tNum * (n * sxV - nV * sx)),
            nV * n * tDen).toLong) else None
          val theta = if (tDen > 0) Some(fdiv(1000000 * tNum, tDen).toLong)
            else None
          arm -> (nV.toLong, syV.toLong, (syV * 1000 / nV).toLong, adj, theta)
      }
      assert(got == want, s"cuped replay mismatch:\n$got\nvs\n$want")
    }
  }

  test("X9k srm == replay of the collapsed chi-square (n_a - n_b)^2 / N " +
      "in exact micro units on random unit universes") {
    cases(Gen.chooseNum(10L, 400L), n = 6) { nUnits =>
      val ids = (1L to nUnits).map(i => i * 7L)
      val got = Experiment.srmCheck(ids.toDF("user_id"), "user_id")
        .as[(Long, Long, Long, Boolean)].collect().head
      val nA = ids.count(i => armOf(i.toString) == "a").toLong
      val nB = nUnits - nA
      val chi = (BigInt(nA - nB) * BigInt(nA - nB) * 1000000 /
        BigInt(nUnits)).toLong
      assert(got == ((nA, nB, chi, chi > 3841459L)),
        s"srm replay mismatch: $got vs ($nA, $nB, $chi)")
    }
  }

  test("X9l winsorizedMean == exact histogram-quantile replay on signed " +
      "random data, any bucket width and p") {
    val gen = Gen.zip(Gen.listOfN(35, Gen.chooseNum(-8000L, 40000L)),
      Gen.chooseNum(1L, 700L), Gen.chooseNum(500000L, 999999L))
    cases(gen, n = 6) { case (cs, w, p) =>
      val got = Experiment.winsorizedMean(
          cs.zipWithIndex.map { case (c, i) => (i.toLong, c) }
            .toDF("id", "cents"), col("cents"), p, w)
        .as[(Long, Long, Long, Long)].collect().head
      // defining formula: cut at the ceil(p·N) nearest-rank of the
      // floor-bucketed histogram, clamp, floor-milli means
      val nN = cs.size.toLong
      val hist = cs.groupBy(c => fdiv(BigInt(c), BigInt(w)))
        .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val rank = (p * nN + 999999L) / 1000000L
      val cutBkt = hist.scanLeft((BigInt(0), 0L)) {
        case ((_, cum), (b, cnt)) => (b, cum + cnt)
      }.drop(1).find(_._2 >= rank).get._1
      val cut = ((cutBkt + 1) * w - 1).toLong
      val sRaw = BigInt(cs.sum)
      val sWin = BigInt(cs.map(c => math.min(c, cut)).sum)
      val want = (nN, cut, fdiv(sRaw * 1000, BigInt(nN)).toLong,
        fdiv(sWin * 1000, BigInt(nN)).toLong)
      assert(got == want, s"winsorized replay mismatch: $got vs $want")
    }
  }

  test("X9m postStratified == share-weighted replay on random strata, " +
      "including partially-covered strata") {
    val row = Gen.zip(Gen.chooseNum(1L, 30L), Gen.oneOf("s1", "s2", "s3"),
      Gen.chooseNum(0L, 9000L))
    cases(Gen.listOfN(45, row), n = 4) { rows =>
      val got = Experiment.postStratified(
          rows.toDF("id", "strat", "cents"), "id", col("strat"),
          col("cents"))
        .select(col("arm"), col("n_units"), col("covered_n"),
          col("mean_milli"), col("poststrat_mean_milli"))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      // defining formula: Σ_s (n_s / n) · mean_sa with the engine's
      // pinned milli-floor on the cell mean first
      val cells = rows.groupBy(r => (r._2, armOf(r._1.toString)))
        .view.mapValues(rs => (rs.size.toLong, rs.map(_._3).sum)).toMap
      val nS = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val nAll = rows.size.toLong
      val want = cells.keys.map(_._2).toSeq.distinct.map { arm =>
        val mine = cells.filter(_._1._2 == arm)
        val nU = mine.values.map(_._1).sum
        val sC = mine.values.map(_._2).sum
        val covered = mine.keys.toSeq.map(k => nS(k._1)).sum
        val wsum = mine.map { case ((s, _), (nSa, sumSa)) =>
          BigInt(nS(s)) * fdiv(BigInt(sumSa) * 1000, BigInt(nSa)) }.sum
        arm -> ((arm, nU, covered, fdiv(BigInt(sC) * 1000, BigInt(nU)).toLong,
          fdiv(wsum, BigInt(nAll)).toLong))
      }.toMap
      assert(got == want, s"poststrat replay mismatch:\n$got\nvs\n$want")
    }
  }

  test("X10l modularity == BigInt replay of Q = (4m·e_in - sum d_c^2) / " +
      "4m^2 on random graphs and mod-3 labels") {
    val edge = Gen.zip(Gen.chooseNum(1L, 14L), Gen.chooseNum(1L, 14L))
    cases(Gen.listOfN(25, edge), n = 6) { es =>
      val und = es.map { case (a, b) => (a.min(b), a.max(b)) }
        .filter { case (a, b) => a != b }.distinct
      if (und.nonEmpty) {
        val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct
        val labels = nodes.map(v => (v, v % 3))
        val got = Graph.modularity(es.toDF("src", "dst"),
            labels.toDF("node", "label"))
          .as[(Long, Long, Long, Long)].collect().head
        val lab = labels.toMap
        val m = BigInt(und.size)
        val eIn = BigInt(und.count { case (a, b) => lab(a) == lab(b) })
        val dC = und.flatMap(e => Seq(lab(e._1), lab(e._2)))
          .groupBy(identity).view.mapValues(c => BigInt(c.size)).values
        val qNum = 1000000 * (4 * m * eIn - dC.map(d => d * d).sum)
        val want = (m.toLong, dC.size.toLong, eIn.toLong,
          fdiv(qNum, 4 * m * m).toLong)
        assert(got == want, s"modularity replay mismatch: $got vs $want")
      }
    }
  }

  test("X10o clusteringCoeff == brute-force triangle replay per node on " +
      "random graphs") {
    val edge = Gen.zip(Gen.chooseNum(1L, 11L), Gen.chooseNum(1L, 11L))
    cases(Gen.listOfN(22, edge), n = 6) { es =>
      val und = es.map { case (a, b) => (a.min(b), a.max(b)) }
        .filter { case (a, b) => a != b }.distinct.toSet
      if (und.nonEmpty) {
        val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val got = Graph.clusteringCoeff(es.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
        val want = adj.map { case (v, nb) =>
          val dg = nb.size.toLong
          val tri = nb.toSeq.combinations(2)
            .count(p => adj(p(0)).contains(p(1))).toLong
          val cc = if (dg >= 2)
            Some((BigInt(tri) * 2000000 / (BigInt(dg) * (dg - 1))).toLong)
            else None
          v -> ((dg, tri, cc))
        }
        assert(got == want, s"cc replay mismatch:\n$got\nvs\n$want")
      }
    }
  }

  test("X10p assortativity == BigInt Pearson replay over endpoint " +
      "degrees on random graphs (signed numerator, pinned floor)") {
    val edge = Gen.zip(Gen.chooseNum(1L, 13L), Gen.chooseNum(1L, 13L))
    cases(Gen.listOfN(24, edge), n = 6) { es =>
      val und = es.map { case (a, b) => (a.min(b), a.max(b)) }
        .filter { case (a, b) => a != b }.distinct
      if (und.nonEmpty) {
        val deg = und.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(c => BigInt(c.size)).toMap
        val ends = und.flatMap { case (a, b) =>
          Seq((deg(a), deg(b)), (deg(b), deg(a))) }
        val nE = BigInt(ends.size)
        val sx = ends.map(_._1).sum
        val sxy = ends.map(e => e._1 * e._2).sum
        val sxx = ends.map(e => e._1 * e._1).sum
        val num = nE * sxy - sx * sx
        val den = nE * sxx - sx * sx
        val want = (nE.toLong,
          if (den > 0) Some(fdiv(1000000 * num, den).toLong) else None)
        val r = Graph.assortativity(es.toDF("src", "dst")).collect().head
        val got = (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))
        assert(got == want, s"assortativity replay mismatch: $got vs $want")
      }
    }
  }

  test("X10q hits == exact integer max-normalized replay on random " +
      "digraphs (nodes may be hub and authority at once)") {
    val edge = Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L))
    cases(Gen.listOfN(18, edge), n = 6) { esRaw =>
      val es = esRaw.distinct
      val df = es.toDF("src", "dst")
      var hub = es.map(_._1).distinct.map(_ -> BigInt(1000000)).toMap
      var auth = Map.empty[Long, BigInt]
      (1 to 2).foreach { _ =>
        val aRaw = es.filter(e => hub.contains(e._1)).groupBy(_._2)
          .view.mapValues(in => in.map(e => hub(e._1)).sum).toMap
        val aMax = aRaw.values.max
        auth = aRaw.view.mapValues(v => v * 1000000 / aMax).toMap
        val hRaw = es.filter(e => auth.contains(e._2)).groupBy(_._1)
          .view.mapValues(out => out.map(e => auth(e._2)).sum).toMap
        val hMax = hRaw.values.max
        hub = hRaw.view.mapValues(v => v * 1000000 / hMax).toMap
      }
      val got = Graph.hits(df, 2).as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = (hub.keySet ++ auth.keySet).map { v =>
        v -> ((hub.getOrElse(v, BigInt(0)).toLong,
          auth.getOrElse(v, BigInt(0)).toLong))
      }.toMap
      assert(got == want, s"hits replay mismatch:\n$got\nvs\n$want")
    }
  }

  test("X8v changepoint == brute-force split scan on random signed " +
      "series (argmax, tie-break, floored means)") {
    val row = Gen.chooseNum(-3000L, 8000L)
    cases(Gen.listOfN(25, row), n = 6) { cs =>
      val df = cs.zipWithIndex.map { case (c, i) => (1L, i.toLong, c) }
        .toDF("k", "i", "cents")
        .withColumn("ts", timestamp_micros(col("i") * 1000000L))
      val got = TimeSeries.changepoint(df, "k", "ts", "i", col("cents"))
        .select(col("n"), col("split_t"), col("shift_milli"),
          col("left_mean_milli"), col("right_mean_milli"))
        .as[(Long, Long, Long, Long, Long)].collect().head
      // brute force: every legal split scored from the defining formula
      val n = cs.size.toLong
      val pre = cs.scanLeft(0L)(_ + _).tail // S_1..S_n
      val sN = pre.last
      val best = (3L to n - 3L).map { t =>
        val sT = pre(t.toInt - 1)
        val shift = ((BigInt(sT) * n - BigInt(sN) * t).abs * 1000 /
          (BigInt(t) * (n - t))).toLong
        (shift, -t, t, sT)
      }.max // max shift, then smallest t (via -t descending? max picks largest -t = smallest t)
      val (shift, _, t, sT) = best
      val want = (n, t, shift,
        fdiv(BigInt(sT) * 1000, BigInt(t)).toLong,
        fdiv(BigInt(sN - sT) * 1000, BigInt(n - t)).toLong)
      assert(got == want, s"changepoint replay mismatch: $got vs $want")
    }
  }

  test("X10w kTruss == brute-force synchronous peel replay on random " +
      "graphs, round for round") {
    val edge = Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L))
    cases(Gen.zip(Gen.listOfN(26, edge), Gen.chooseNum(1, 3)), n = 6) {
      case (es, rounds) =>
        var und = es.map { case (a, b) => (a.min(b), a.max(b)) }
          .filter { case (a, b) => a != b }.distinct.toSet
        if (und.nonEmpty) {
          def support(s: Set[(Long, Long)]): Map[(Long, Long), Long] = {
            val adj = s.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
              .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
            s.map { case (a, b) =>
              (a, b) -> (adj(a) & adj(b)).size.toLong }.toMap
          }
          (1 to rounds).foreach { _ =>
            val sup = support(und)
            und = und.filter(e => sup(e) >= 2) // k = 4
          }
          val fin = support(und)
          val want = und.map(e => (e._1, e._2, fin(e))).toSet
          val got = Graph.kTruss(es.toDF("src", "dst"), 4, rounds)
            .as[(Long, Long, Long)].collect().toSet
          assert(got == want, s"ktruss replay mismatch ($rounds rounds): " +
            s"$got vs $want")
        }
    }
  }

  test("X10u betweenness == driver Brandes replay with identical " +
      "integer-ppm floor semantics on random graphs") {
    val edge = Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L))
    cases(Gen.listOfN(18, edge), n = 6) { esRaw =>
      val und = esRaw.map { case (a, b) => (a.min(b), a.max(b)) }
        .filter { case (a, b) => a != b }.distinct
      if (und.nonEmpty) {
        val sym = und ++ und.map(_.swap)
        val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val nodes = adj.keySet
        val sources = nodes.filter(_ % 3 == 0)
        if (sources.nonEmpty) {
          val maxHops = 3
          // forward: synchronous BFS levels carrying path counts
          val bc = scala.collection.mutable.Map.empty[Long, BigInt]
            .withDefaultValue(BigInt(0))
          sources.foreach { s =>
            var levels = Vector(Map(s -> BigInt(1)))
            var seen = Set(s)
            (1 to maxHops).foreach { _ =>
              val nxt = scala.collection.mutable.Map.empty[Long, BigInt]
                .withDefaultValue(BigInt(0))
              levels.last.foreach { case (u, sig) =>
                adj(u).filterNot(seen).foreach(v => nxt(v) += sig)
              }
              seen ++= nxt.keySet
              levels :+= nxt.toMap
            }
              // backward: delta from the deepest level up, per-term floor
            var delta = levels(maxHops).keys.map(_ -> BigInt(0)).toMap
            (maxHops to 1 by -1).foreach { h =>
              val prev = levels(h - 1)
              val nd = prev.map { case (u, sigU) =>
                u -> adj(u).toSeq.filter(levels(h).contains).map { v =>
                  fdiv(sigU * (1000000 + delta(v)), levels(h)(v))
                }.sum
              }
              levels(h).foreach { case (v, _) => bc(v) += delta(v) }
              delta = nd
            }
            // level-0 delta (the source itself) is never accumulated
          }
          val got = Graph.betweenness(sym.toDF("src", "dst"),
              sources.toSeq.toDF("node"), maxHops)
            .as[(Long, Long)].collect().toMap
          val want = bc.map { case (v, d) => v -> d.toLong }.toMap
          assert(got == want,
            s"betweenness replay mismatch:\n$got\nvs\n$want")
        }
      }
    }
  }

  test("X10t pageRankWeighted == integer replay on random weighted " +
      "digraphs (floor splits, damped update)") {
    val edge = Gen.zip(Gen.chooseNum(1L, 9L), Gen.chooseNum(1L, 9L),
      Gen.chooseNum(1L, 20L))
    cases(Gen.listOfN(16, edge), n = 6) { es =>
      // parallel duplicate (src,dst) edges stay SEPARATE rows — the
      // operator floors each edge's split independently, so replaying
      // a weight-merged pair would differ by the per-edge floor losses
      val wsum = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var score = wsum.keys.map(_ -> 1000000L).toMap
      (1 to 3).foreach { _ =>
        val c = es.filter(e => score.contains(e._1)).groupBy(_._2)
          .view.mapValues(_.map { case (u, _, w) =>
            Math.floorDiv(score(u) * w, wsum(u)) }.sum).toMap
        score = c.map { case (v, s) =>
          v -> (150000L + Math.floorDiv(850L * s, 1000L)) }.toMap
      }
      val got = Graph.pageRankWeighted(es.toDF("src", "dst", "w"), 3)
        .as[(Long, Long)].collect().toMap
      assert(got == score, s"weighted PR replay mismatch: $got vs $score")
    }
  }

  test("X10s scc == brute-force mutual-reachability closure on random " +
      "digraphs (round 17: the hook+pointer-doubling rewrite judged " +
      "against Floyd-Warshall transitive closure)") {
    // dense-ish small digraphs: self-loops, parallel edges, cycles,
    // DAG tails and cross-component bridges all occur at these sizes
    val edge = Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L))
    cases(Gen.listOfN(18, edge), n = 8) { es =>
      val df = es.toDF("src", "dst")
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val idx = nodes.zipWithIndex.toMap
      val n = nodes.length
      // reach(i)(j): directed path i -> j (reflexive by convention)
      val reach = Array.tabulate(n, n)((i, j) => i == j)
      es.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
      for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
        if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
      val expected = nodes.map { v =>
        val i = idx(v)
        // scc id = smallest node mutually reachable with v
        v -> nodes.zipWithIndex.collect {
          case (w, jj) if reach(i)(jj) && reach(jj)(i) => w
        }.min
      }.toMap
      val got = Graph.scc(df).as[(Long, Long)].collect().toMap
      assert(got == expected, s"edges=$es\n got=$got\n exp=$expected")
    }
  }

  test("X10v neighborhoodFunction == exact md5-register ball replay on " +
      "random digraphs (round 17: the packed-sketch + systolic-delta " +
      "rework judged against driver BFS balls)") {
    // the GraphSpec path-replay kernel, over random shapes: self-loops,
    // parallel edges, hubs and disconnected pieces all occur here
    def hexOf(v: Long): String = java.security.MessageDigest
      .getInstance("MD5").digest(v.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def regOf(v: Long): (Int, Int) = {
      val h = hexOf(v)
      val bucket = Integer.parseInt(h.substring(0, 2), 16) / 4
      val nz = h.substring(2, 15).dropWhile(_ == '0')
      val zeros = if (nz.isEmpty) 52 else {
        val lead = nz.head match {
          case c if "89abcdef".contains(c) => 0
          case c if "4567".contains(c) => 1
          case c if "23".contains(c) => 2
          case _ => 3
        }
        4 * (13 - nz.length) + lead
      }
      (bucket, zeros + 1)
    }
    def estOf(b: Set[Long]): Long = {
      val regs = b.map(regOf).groupBy(_._1)
        .map { case (bk, rs) => bk -> rs.map(_._2).max }
      val z = 64.0 - regs.size + regs.values.map(r => math.pow(2.0, -r)).sum
      math.floor(0.7213 / (1.0 + 1.079 / 64) * 4096 / z * 1e4 + 0.5).toLong
    }
    val edge = Gen.zip(Gen.chooseNum(1L, 9L), Gen.chooseNum(1L, 9L))
    cases(Gen.listOfN(14, edge), n = 6) { es =>
      val df = es.toDF("src", "dst")
      val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
      val adj = es.distinct.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).toSet }
      def ball(v: Long, h: Int): Set[Long] =
        (0 until h).foldLeft(Set(v))((b, _) =>
          b ++ b.flatMap(x => adj.getOrElse(x, Set.empty[Long])))
      val want = (0 to 2).map(h => (h.toLong, nodes.size.toLong,
        nodes.map(v => estOf(ball(v, h))).sum))
      val got = Graph.neighborhoodFunction(df, 2)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == want, s"edges=$es\n got=$got\n exp=$want")
    }
  }

  test("assortativity stays in [-1e6, 1e6] and clustering coefficients " +
      "stay in [0, 1e6] on random graphs") {
    val edge = Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L))
    cases(Gen.listOfN(20, edge), n = 6) { es =>
      val df = es.toDF("src", "dst")
      if (es.exists { case (a, b) => a != b }) {
        Graph.assortativity(df).collect().foreach { r =>
          if (!r.isNullAt(1)) {
            val a = r.getLong(1)
            assert(a >= -1000000L && a <= 1000000L, s"assort out of band: $a")
          }
        }
        Graph.clusteringCoeff(df).collect().foreach { r =>
          if (!r.isNullAt(3)) {
            val c = r.getLong(3)
            assert(c >= 0L && c <= 1000000L, s"cc out of band: $c")
          }
        }
      }
    }
  }
}
