package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  // arm assignment is md5-parity — recompute it driver-side so the
  // fixture can place units deliberately
  private def armOf(id: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"0:$id".getBytes("UTF-8"))
    val top = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    if (top % 2 == 0) "a" else "b"
  }

  test("X9b abReport: counts per arm match a driver-side recomputation; " +
      "conversion is ANY qualifying event; chi2 matches scipy-free hand calc") {
    val units = (1L to 40L)
    val byArm = units.groupBy(armOf)
    assert(byArm.keySet == Set("a", "b"), "fixture must land in both arms")
    // convert every 3rd unit (by id), with a duplicate purchase for one
    val ev = units.flatMap { u =>
      Seq((u, "view")) ++
        (if (u % 3 == 0) Seq((u, "purchase")) else Nil) ++
        (if (u == 3) Seq((u, "purchase")) else Nil)
    }.toDF("user_id", "event_type")
    val r = Experiment.abReport(ev, "user_id", "event_type", "purchase")
      .collect().head
    val nA = byArm("a").size.toLong
    val nB = byArm("b").size.toLong
    val convA = byArm("a").count(_ % 3 == 0).toLong
    val convB = byArm("b").count(_ % 3 == 0).toLong
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("conv_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("conv_b")) ==
      ((nA, convA, nB, convB)))
    assert(r.getAs[Long]("cr_a_ppm") == convA * 1000000L / nA)
    assert(r.getAs[Long]("cr_b_ppm") == convB * 1000000L / nB)
    assert(r.getAs[Long]("lift_ppm") ==
      convB * nA * 1000000L / (convA * nB))
    val (a, b, c, d) = (convA.toDouble, (nA - convA).toDouble,
      convB.toDouble, (nB - convB).toDouble)
    val n = (nA + nB).toDouble
    val exp = math.floor(((n * ((a * d - b * c) * (a * d - b * c))) * 10000.0) /
      (((nA.toDouble * nB) * (a + c)) * (b + d))).toLong
    assert(r.getAs[Long]("chi2_fp") == exp)
  }

  test("X9b abReport: degenerate margins (zero conversions) null the " +
      "chi-square and A-arm lift instead of dividing by zero") {
    val ev = (1L to 10L).map(u => (u, "view")).toDF("user_id", "event_type")
    val r = Experiment.abReport(ev, "user_id", "event_type", "purchase")
      .collect().head
    assert(r.getAs[Long]("conv_a") == 0L && r.getAs[Long]("conv_b") == 0L)
    assert(r.isNullAt(r.fieldIndex("chi2_fp")))
    assert(r.isNullAt(r.fieldIndex("lift_ppm")))
  }

  test("X9c aucReport: matches the brute-force pairwise definition " +
      "(ties count half), perfect and inverted rankers hit the rails") {
    // scores with deliberate cross-class ties: pos at {3,5,5,9},
    // neg at {1,3,5,7}
    val rows = Seq((3L, true), (5L, true), (5L, true), (9L, true),
      (1L, false), (3L, false), (5L, false), (7L, false))
    def brute(xs: Seq[(Long, Boolean)]): (Long, Long) = {
      val pos = xs.filter(_._2).map(_._1); val neg = xs.filterNot(_._2).map(_._1)
      // doubled U: win = 2, tie = 1
      val u2 = (for (p <- pos; q <- neg) yield
        if (p > q) 2L else if (p == q) 1L else 0L).sum
      (u2, u2 * 1000000L / (2L * pos.size * neg.size))
    }
    val (u2, aucPpm) = brute(rows)
    val r = Experiment.aucReport(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    assert((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Long]("u2"), r.getAs[Long]("auc_ppm")) == ((4L, 4L, u2, aucPpm)))
    // perfect separation -> AUC 1; inverted -> 0; all-tied -> exactly 1/2
    def auc(xs: Seq[(Long, Boolean)]): Long =
      Experiment.aucReport(xs.toDF("s", "y"), col("s"), col("y"))
        .collect().head.getAs[Long]("auc_ppm")
    assert(auc(Seq((10L, true), (11L, true), (1L, false))) == 1000000L)
    assert(auc(Seq((1L, true), (10L, false), (11L, false))) == 0L)
    assert(auc(Seq((5L, true), (5L, false), (5L, false))) == 500000L)
  }

  test("X9d prCurve: one row per distinct score, suffix-sum confusion " +
      "counts, exact ppm; the top threshold is pure and the bottom " +
      "threshold has recall 1") {
    // scores desc: 9(pos), 7(neg), 5(2 pos + 1 neg), 3(pos+neg), 1(neg)
    val rows = Seq((9L, true), (7L, false), (5L, true), (5L, true),
      (5L, false), (3L, true), (3L, false), (1L, false))
    val out = Experiment.prCurve(rows.toDF("s", "y"), col("s"), col("y"))
      .orderBy(col("s").desc)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val nPos = 4L
    // (s, tp, fp, fn, precision_ppm, recall_ppm)
    assert(out == Seq(
      (9L, 1L, 0L, 3L, 1000000L, 1000000L * 1 / nPos),
      (7L, 1L, 1L, 3L, 500000L, 250000L),
      (5L, 3L, 2L, 1L, 600000L, 750000L),
      (3L, 4L, 3L, 0L, 4000000L / 7L, 1000000L),
      (1L, 4L, 4L, 0L, 500000L, 1000000L)))
  }

  test("X9d prCurve: an all-negative input nulls recall and zeroes " +
      "precision at every threshold") {
    val out = Experiment.prCurve(
        Seq((5L, false), (3L, false)).toDF("s", "y"), col("s"), col("y"))
      .orderBy(col("s").desc).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("tp") == 0L &&
        r.getAs[Long]("precision_ppm") == 0L)
      assert(r.isNullAt(r.fieldIndex("recall_ppm")))
    }
  }

  test("X9c aucReport: a single-class input reports null auc_ppm, not 0/0") {
    val r = Experiment.aucReport(
        Seq((1L, true), (2L, true)).toDF("s", "y"), col("s"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n_neg") == 0L)
    assert(r.isNullAt(r.fieldIndex("auc_ppm")))
  }

  test("X9e aucReportBy: per-group AUC matches the global report run " +
      "on each slice; groups never mix ranks; a single-class slice " +
      "nulls while the others report") {
    // slice a: perfect ranker; slice b: inverted; slice c: positives only
    val rows = Seq(
      ("a", 10L, true), ("a", 11L, true), ("a", 1L, false), ("a", 2L, false),
      ("b", 1L, true), ("b", 2L, true), ("b", 10L, false),
      ("c", 5L, true), ("c", 6L, true))
    val out = Experiment.aucReportBy(rows.toDF("g", "s", "y"),
        col("s"), col("y"), "g")
      .orderBy(col("g")).collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("auc_ppm") == 1000000L)
    assert(out(1).getAs[Long]("auc_ppm") == 0L)
    assert(out(2).isNullAt(out(2).fieldIndex("auc_ppm")))
    // each slice agrees with the ungrouped report on that slice alone
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val solo = Experiment.aucReport(
        xs.map(t => (t._2, t._3)).toDF("s", "y"), col("s"), col("y"))
        .collect().head
      val grouped = out.find(_.getAs[String]("g") == g).get
      assert(grouped.getAs[Long]("u2") == solo.getAs[Long]("u2"), g)
      assert(grouped.getAs[Long]("n_pos") == solo.getAs[Long]("n_pos"), g)
    }
  }

  test("X9f calibration: bins partition the score axis, counts and exact " +
      "integer quotients match hand-rolled values") {
    // binWidth 10: scores 0-9 -> bin 0, 10-19 -> bin 1, ...
    // bin 0: scores 2, 4 (one pos)  -> mean 3000 milli, frac 500000 ppm
    // bin 1: scores 10, 15, 19 (all pos) -> mean 14666 milli (floor), 1e6 ppm
    // bin 3: score 30 (neg)         -> mean 30000 milli, 0 ppm
    val rows = Seq((2L, true), (4L, false), (10L, true), (15L, true),
      (19L, true), (30L, false)).toDF("s", "y")
    val out = Experiment.calibration(rows, col("s"), col("y"), 10L)
      .orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 2L, 1L, 3000L, 500000L),
      (1L, 3L, 3L, 14666L, 1000000L),
      (3L, 1L, 0L, 30000L, 0L)))
    // a perfectly calibrated constant scorer: mean == frac at the ppm scale
    val cal = Seq.tabulate(100)(i => (500L, i < 50)).toDF("s", "y")
    val c = Experiment.calibration(cal, col("s"), col("y"), 1000L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(c == (0L, 100L, 50L, 500000L, 500000L))
  }

  test("X9g CUPED: a metric fully explained by its pre-period covariate " +
      "adjusts to the same mean in both arms") {
    // unit i spends i*100 cents in BOTH periods: Y = X exactly, so
    // theta = 1 and every arm's adjusted mean collapses to the global
    // mean SX/n — whatever the md5 arm split is
    val rows = (1 to 40).flatMap { i =>
      Seq((i.toLong, 10_000_000L, i * 100L),        // pre (us < split)
        (i.toLong, 2_000_000_000L, i * 100L))       // post (us >= split)
    }
    val df = rows.toDF("unit", "us", "cents")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Experiment.cuped(df, "unit", "ts", col("cents"),
        1_000_000_000L)
      .orderBy(col("arm"))
      .select(col("arm"), col("n_units"), col("adj_mean_y_milli"),
        col("theta_micro"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.length == 2 && out.map(_._1) == Seq("a", "b"))
    val sx = (1 to 40).map(_ * 100L).sum
    val globalMeanMilli = sx * 1000L / 40L
    out.foreach { case (arm, _, adj, theta) =>
      assert(theta == 1000000L, s"theta should be exactly 1 in arm $arm")
      assert(adj == globalMeanMilli,
        s"arm $arm adjusted mean $adj != global mean $globalMeanMilli")
    }
    // raw means differ across arms (the md5 split is not value-balanced)
    val raw = Experiment.cuped(df, "unit", "ts", col("cents"),
        1_000_000_000L)
      .select(col("mean_y_milli")).as[Long].collect().toSeq
    assert(raw.distinct.length == 2, "fixture should have unequal raw means")
    // degenerate var(X) = 0: adjusted columns are null, not a crash
    val const = (1 to 10).flatMap(i =>
        Seq((i.toLong, 10_000_000L, 500L), (i.toLong, 2_000_000_000L, i * 7L)))
      .toDF("unit", "us", "cents")
      .withColumn("ts", timestamp_micros(col("us")))
    val deg = Experiment.cuped(const, "unit", "ts", col("cents"),
        1_000_000_000L)
      .select(col("adj_mean_y_milli"), col("theta_micro"))
      .collect()
    assert(deg.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("X9h poissonBootstrap: thresholds are the Poisson(1) CDF in 16-bit " +
      "fixed point; resample means match a driver-side replay") {
    // threshold sanity: strictly increasing, t0 = floor(e^-1 * 65536),
    // top threshold within 1 of full mass (cdf(7) ~ 0.9999998)
    val t = Experiment.poissonThresholds
    assert(t.length == 8 && t == t.sorted && t.distinct == t)
    assert(t.head == math.floor(StrictMath.exp(-1.0) * 65536.0).toLong)
    assert(t.last >= 65534L && t.last <= 65535L)
    // the expected replication-count mass: ~36.8% of draws land on k=0
    // and on k=1, ~18.4% on k=2 (Poisson(1) pmf in 16-bit ppm)
    assert(math.abs(t.head - 24109L) <= 1)

    def kOf(rid: String, b: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$rid:$b".getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString
      val draw = java.lang.Long.parseLong(hex, 16)
      t.indexWhere(draw < _) match { case -1 => 8L; case i => i.toLong }
    }
    val rows = (1L to 200L).map(i => (i, i * 3L)).toDF("id", "cents")
    val out = Experiment.poissonBootstrap(rows, "id", col("cents"), 4)
      .orderBy(col("b"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    val expect = (0L until 4L).map { b =>
      val ks = (1L to 200L).map(i => (i * 3L, kOf(i.toString, b)))
      val nEff = ks.map(_._2).sum
      val sum = ks.map { case (c, k) => c * k }.sum
      (b, nEff, sum, Math.floorDiv(sum * 1000L, nEff))
    }
    assert(out == expect)
    // each resample draws an independent weighting: n_eff varies by b,
    // and every resample replicates roughly n rows (Poisson(1) mean 1)
    assert(out.map(_._2).distinct.length > 1)
    out.foreach { case (b, nEff, _, _) =>
      assert(nEff > 140 && nEff < 260, s"resample $b n_eff=$nEff")
    }
  }

  test("X9i bootstrapCi: nearest ranks bracket the median; the CI row " +
      "selects the exact order statistics of the resample means") {
    // nearest-rank arithmetic (ceil in ppm, clamped >= 1)
    assert(Experiment.nearestRank(25000L, 16) == 1L)
    assert(Experiment.nearestRank(500000L, 16) == 8L)
    assert(Experiment.nearestRank(975000L, 16) == 16L)
    assert(Experiment.nearestRank(975000L, 40) == 39L)
    assert(Experiment.nearestRank(1L, 1000) == 1L)
    val rows = (1L to 300L).map(i => (i, i % 17 * 100L)).toDF("id", "cents")
    val means = Experiment.poissonBootstrap(rows, "id", col("cents"), 8)
      .select(col("mean_milli")).as[Long].collect().toSeq.sorted
    val ci = Experiment.bootstrapCi(rows, "id", col("cents"), 8)
      .select(col("n_resamples"), col("lo_milli"), col("med_milli"),
        col("hi_milli"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(ci._1 == 8L)
    assert(ci._2 == means.head,       "lo = rank ceil(0.025*8) = 1 = min")
    assert(ci._3 == means(3),         "med = rank ceil(0.5*8) = 4")
    assert(ci._4 == means.last,       "hi = rank ceil(0.975*8) = 8 = max")
    assert(ci._2 <= ci._3 && ci._3 <= ci._4)
  }

  test("X9j jackknife: constant metric has zero variance; LOO means and " +
      "the variance row match a driver-side replay") {
    def grpOf(id: Long, g: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jk:$id".getBytes("UTF-8"))
      val top = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      top % g
    }
    // constant metric: every LOO mean identical -> variance exactly 0
    val const = (1L to 100L).map(i => (i, 700L)).toDF("id", "cents")
    val v0 = Experiment.jackknifeVar(const, "id", col("cents"), 8)
      .select(col("jk_var_milli2")).as[Long].collect().head
    assert(v0 == 0L)
    // varied metric: replay groups, LOO means, and the exact variance
    val rows = (1L to 200L).map(i => (i, i * 13L)).toDF("id", "cents")
    val g = 8
    val byGrp = (1L to 200L).groupBy(i => grpOf(i, g))
      .map { case (k, ids) => k -> (ids.size.toLong, ids.map(_ * 13L).sum) }
    val nAll = byGrp.values.map(_._1).sum
    val sAll = byGrp.values.map(_._2).sum
    val loo = byGrp.map { case (k, (n, sum)) =>
      k -> Math.floorDiv((sAll - sum) * 1000L, nAll - n)
    }
    val got = Experiment.jackknife(rows, "id", col("cents"), g)
      .select(col("grp"), col("n_g"), col("sum_cents"),
        col("loo_mean_milli"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == byGrp.toSeq.sortBy(_._1).map { case (k, (n, s)) =>
      (k, n, s, loo(k)) })
    // variance replayed from the DEFINING formula (G-1)/G * sum
    // (m_g - mbar)^2 in exact rationals — NOT the code's expansion, so
    // a mis-expanded implementation cannot self-confirm (the round-15
    // review caught exactly that: a dropped factor of G)
    val ms = loo.values.toSeq
    val ss = ms.sum
    val ss2 = ms.map(m => BigInt(m) * m).sum
    // (G-1)/G * (ss2 - ss^2/G) = (G-1)*(G*ss2 - ss^2) / G^2 exactly
    val expVar = ((BigInt(g - 1) * (BigInt(g) * ss2 - BigInt(ss) * ss)) /
      (BigInt(g) * g)).toLong
    // brute-force check of the same quantity in doubles (independent path)
    val mbar = ms.sum.toDouble / g
    val vDouble = (g - 1).toDouble / g *
      ms.map(m => (m.toDouble - mbar) * (m.toDouble - mbar)).sum
    assert(math.abs(expVar - vDouble) <= math.max(1.0, vDouble * 1e-9),
      s"exact rational $expVar must track the defining formula $vDouble")
    val vr = Experiment.jackknifeVar(rows, "id", col("cents"), g)
      .select(col("n_groups"), col("n"), col("mean_milli"),
        col("jk_var_milli2"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(vr._1 == byGrp.size.toLong && vr._2 == nAll)
    assert(vr._3 == Math.floorDiv(sAll * 1000L, nAll))
    assert(vr._4 == expVar)
    assert(vr._4 > 0L, "varied metric must have positive variance")
    // honesty guard: fewer units than groups leaves some md5 group
    // empty -> the G-literal formula would overweight -> variance nulls
    val tiny = (1L to 5L).map(i => (i, i * 100L)).toDF("id", "cents")
    val deg = Experiment.jackknifeVar(tiny, "id", col("cents"), 16)
      .select(col("n_groups"), col("jk_var_milli2")).collect().head
    assert(deg.getLong(0) < 16L && deg.isNullAt(1),
      "an under-populated grouping must null the variance, not misreport")
  }

  test("X9k srmCheck: balanced split passes, a 9:1 planted skew flags") {
    // md5-parity arms over 1..400: close to 50/50 -> chi2 under 3.84
    val ev = (1L to 400L).map(i => (i, "view")).toDF("user_id", "t")
    val ok = Experiment.srmCheck(ev, "user_id")
      .select(col("n_a"), col("n_b"), col("srm_chi2_micro"),
        col("srm_flag"))
      .as[(Long, Long, Long, Boolean)].collect().head
    assert(ok._1 + ok._2 == 400L)
    assert(ok._3 == (ok._1 - ok._2) * (ok._1 - ok._2) * 1000000L / 400L)
    assert(!ok._4, s"balanced split must not flag (chi2=${ok._3})")
    // plant a broken assignment: keep only arm-a units, plus a few b
    val armA = (1L to 2000L).filter(armOf(_) == "a").take(180)
    val armB = (1L to 2000L).filter(armOf(_) == "b").take(20)
    val skew = (armA ++ armB).map(i => (i, "view")).toDF("user_id", "t")
    val bad = Experiment.srmCheck(skew, "user_id")
      .select(col("n_a"), col("n_b"), col("srm_flag"))
      .as[(Long, Long, Boolean)].collect().head
    assert(bad._1 == 180L && bad._2 == 20L)
    assert(bad._3, "9:1 split must flag SRM")
    // duplicate events per unit do not change the unit counts
    val dup = skew.unionAll(skew)
    val dd = Experiment.srmCheck(dup, "user_id")
      .select(col("n_a"), col("n_b")).as[(Long, Long)].collect().head
    assert(dd == ((180L, 20L)))
  }

  test("X9m postStratified: global-share reweighting matches a driver " +
      "replay and covered_n exposes full coverage") {
    // two strata with very different means; md5 arms split each stratum
    val rows = (1L to 400L).map { i =>
      val s = if (i <= 200) "lo" else "hi"
      val cents = if (i <= 200) 100L else 10000L
      (i, s, cents)
    }.toDF("id", "s", "cents")
    val out = Experiment.postStratified(rows, "id", col("s"), col("cents"))
      .orderBy(col("arm"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq("a", "b"))
    // driver replay
    val byArm = (1L to 400L).groupBy(i => armOf(i))
    val byCell = (1L to 400L).groupBy(i =>
      (armOf(i), if (i <= 200) "lo" else "hi"))
    val nS = Map("lo" -> 200L, "hi" -> 200L)
    out.foreach { case (arm, nUnits, coveredN, meanMilli, psMilli) =>
      assert(nUnits == byArm(arm).size.toLong)
      assert(coveredN == 400L, "both strata present in both arms")
      val cents = byArm(arm).map(i => if (i <= 200) 100L else 10000L)
      assert(meanMilli == Math.floorDiv(cents.sum * 1000L, cents.size.toLong))
      val wsum = Seq("lo", "hi").map { s =>
        val cell = byCell((arm, s))
        val cellCents = cell.map(i => if (i <= 200) 100L else 10000L)
        nS(s) * Math.floorDiv(cellCents.sum * 1000L, cell.size.toLong)
      }.sum
      assert(psMilli == Math.floorDiv(wsum, 400L))
    }
    // both strata are internally constant, so reweighting to the global
    // 50/50 shares lands both arms on the same adjusted mean exactly:
    // (200*100_000 + 200*10_000_000) / 400 milli
    val expected = (200L * 100000L + 200L * 10000000L) / 400L
    assert(out.forall(_._5 == expected),
      "constant-within-stratum metric must post-stratify to the global mix")
    // raw means differ (the md5 split is not stratum-balanced in counts)
    assert(out.map(_._4).distinct.length == 2)
  }

  test("X9n diffInDiff: a planted uniform trend plus a b-arm effect " +
      "recovers exactly the effect") {
    // level: arm a = 1000, arm b = 3000 cents pre; shared trend +500
    // post; treatment effect +1500 on arm b post only
    val units = (1L to 60L)
    val rows = units.flatMap { u =>
      val base = if (armOf(u) == "a") 1000L else 3000L
      val post = base + 500L + (if (armOf(u) == "b") 1500L else 0L)
      Seq((u, 10_000_000L, base), (u, 2_000_000_000L, post))
    }.toDF("unit", "us", "cents")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = Experiment.diffInDiff(rows, "unit", "ts", col("cents"),
        1_000_000_000L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r._1 == 1000000L && r._2 == 1500000L,
      "arm a: pre 1000, post 1500 milli-cents means")
    assert(r._3 == 3000000L && r._4 == 5000000L,
      "arm b: pre 3000, post 5000")
    assert(r._5 == 1500000L, "DiD nets level + trend, leaves the effect")
    // no-effect rail: both arms share the trend -> DiD exactly 0
    val flat = units.flatMap { u =>
      val base = if (armOf(u) == "a") 1000L else 3000L
      Seq((u, 10_000_000L, base), (u, 2_000_000_000L, base + 500L))
    }.toDF("unit", "us", "cents")
      .withColumn("ts", timestamp_micros(col("us")))
    val z = Experiment.diffInDiff(flat, "unit", "ts", col("cents"),
        1_000_000_000L)
      .select(col("did_milli")).as[Long].collect().head
    assert(z == 0L)
  }

  test("X9l winsorizedMean: the cut is the bucket-histogram nearest-rank " +
      "edge and clamping only lowers the mean") {
    // 100 rows: 99 at 50 cents, one whale at 1,000,000 cents.
    // p99 over width-100 buckets: rank ceil(0.99*100) = 99 -> bucket 0
    // (cum 99 >= 99), cut = 99 cents -> whale clamps to 99.
    val rows = ((1 to 99).map(_ => 50L) :+ 1000000L).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("id", "cents")
    val r = Experiment.winsorizedMean(rows, col("cents"), 990000L, 100L)
      .select(col("n"), col("cut_cents"), col("mean_milli"),
        col("win_mean_milli"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(r._1 == 100L)
    assert(r._2 == 99L)
    val rawMean = (99L * 50L + 1000000L) * 1000L / 100L
    val winMean = (99L * 50L + 99L) * 1000L / 100L
    assert(r._3 == rawMean)
    assert(r._4 == winMean)
    assert(r._4 < r._3, "clamping the whale must lower the mean")
    // no whale: cut above every value leaves the mean unchanged
    val flat = (1 to 50).map(i => (i.toLong, 200L)).toDF("id", "cents")
    val f = Experiment.winsorizedMean(flat, col("cents"), 990000L, 100L)
      .select(col("cut_cents"), col("mean_milli"), col("win_mean_milli"))
      .as[(Long, Long, Long)].collect().head
    assert(f._1 == 299L, "all rows in bucket 2 -> cut = bucket top edge")
    assert(f._2 == f._3)
  }

  test("X9o experimentReadout: one-pass composite equals the three member " +
      "operators column for column (the maintained == direct contract)") {
    // mixed fixture: purchases, views, pre/post values, a few multi-event
    // units — enough to exercise every member formula
    val rows = (1L to 50L).flatMap { u =>
      val pre = Seq((u, 10_000_000L, "view", u * 7L))
      val post = Seq((u, 2_000_000_000L,
        if (u % 3 == 0) "purchase" else "view", u * 11L))
      val extra = if (u % 5 == 0)
        Seq((u, 2_100_000_000L, "purchase", 42L)) else Nil
      pre ++ post ++ extra
    }.toDF("user_id", "us", "event_type", "value_cents")
      .withColumn("ts", timestamp_micros(col("us")))
    val split = 1_000_000_000L
    val r = Experiment.experimentReadout(rows, "user_id", "ts",
      "event_type", "purchase", col("value_cents"), split).collect().head
    val srm = Experiment.srmCheck(rows, "user_id").collect().head
    assert(r.getAs[Long]("n_a") == srm.getAs[Long]("n_a"))
    assert(r.getAs[Long]("n_b") == srm.getAs[Long]("n_b"))
    assert(r.getAs[Long]("srm_chi2_micro") ==
      srm.getAs[Long]("srm_chi2_micro"))
    assert(r.getAs[Boolean]("srm_flag") == srm.getAs[Boolean]("srm_flag"))
    val ab = Experiment.abReport(rows, "user_id", "event_type",
      "purchase").collect().head
    Seq("conv_a", "conv_b", "cr_a_ppm", "cr_b_ppm", "lift_ppm", "chi2_fp")
      .foreach { c =>
        assert(r.getAs[Any](c) == ab.getAs[Any](c), s"column $c diverged")
      }
    val did = Experiment.diffInDiff(rows, "user_id", "ts",
      col("value_cents"), split).collect().head
    Seq("m_a_pre_milli", "m_a_post_milli", "m_b_pre_milli",
      "m_b_post_milli", "did_milli").foreach { c =>
        assert(r.getAs[Any](c) == did.getAs[Any](c), s"column $c diverged")
      }
  }
}
