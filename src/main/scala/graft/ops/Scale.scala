package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale tools: skew salting and bucketed co-located joins.
  *
  * These don't add query semantics — they change physical distribution.
  * At test scale they're exercised for correctness (specs assert identical
  * results and the expected plan shape); at 100 TB they're the difference
  * between a straggler-bound job and an even one.
  */
object Scale {

  /** Guard for compute-heavy NARROW stages fed by few input splits: a
    * small/compacted parquet file yields one task, so a per-row-expensive
    * projection (minhash over shingles, binary decode) runs on one core
    * while the rest of the cluster idles. An explicit round-robin
    * repartition to cluster parallelism spreads the rows first; the
    * shuffle moves only the raw input (cheap) and, because the partition
    * count is user-specified, AQE will NOT coalesce it back down for
    * being small in bytes — bytes are exactly the wrong signal here.
    * At 100 TB inputs arrive as many splits and the extra shuffle is
    * wasted, so callers gate on input partitions already >= parallelism.
    *
    * The split count is read from the DataFrame's OWN query execution
    * (`toRdd` — the executed plan's internal-row RDD), not `df.rdd`:
    * `.rdd` wraps the plan in a second Dataset with a DeserializeToObject
    * conversion and plans/analyzes THAT from scratch on every call, all
    * to answer a partition-count question the existing physical plan
    * already knows. `toRdd` still forces physical planning, and under AQE
    * reading the partition count of a SHUFFLE-bearing plan finalizes the
    * adaptive plan and executes the upstream stages just to learn the
    * count — so only feed fanOut scan/narrow-op DataFrames (all current
    * callers do; callers whose input already sits behind a shuffle skip
    * fanOut entirely, e.g. Dedup.minhash's `spread = false`). */
  def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= par) df
    else df.repartition(par)
  }

  /** Deterministic, engine-portable hash sample: keep rows whose md5 hex
    * prefix of the id falls below the 4-nibble threshold for `rate`
    * (granularity 1/65536). No RNG, no seed plumbing: the same row is in
    * the sample on every engine and every run — the property a
    * training-data split needs (DuckDB/any SQL engine reproduces it with
    * `substr(md5(cast(id as varchar)), 1, 4) < 'xxxx'`). Narrow filter,
    * no shuffle, pushdown-friendly. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    // rates in [65535.5/65536, 1.0) round to 65536, which %04x would format
    // as the 5-char "10000" — lexicographically BELOW most 4-char prefixes,
    // silently keeping ~6% instead of ~100%. Rounded-to-full = keep all.
    val rounded = math.round(rate * 65536).toInt
    if (rounded >= 65536) df
    else {
      val threshold = f"$rounded%04x"
      df.filter(substring(md5(col(idCol).cast("string")), 1, 4) < lit(threshold))
    }
  }

  /** Stratified variant of [[hashSample]]: a different deterministic rate
    * per stratum value (e.g. downsample a low-quality source to 10% while
    * keeping a curated one whole). Strata absent from `rates` get
    * `defaultRate`. Same md5-prefix mechanics, so the selection is
    * engine-portable and reproducible; still a narrow filter — the rate
    * lookup is a tiny CASE expression, not a join. */
  def hashSampleBy(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    def thresh(rate: Double): String = {
      require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
      // same 4-nibble width as the compared prefix (lexicographic compare
      // is only numeric at equal width); rate=1.0 — or any rate that ROUNDS
      // to 65536, which would format 5-wide — needs a keep-everything
      // sentinel and 'g' > 'f' beats any hex prefix
      val rounded = math.round(rate * 65536).toInt
      if (rounded >= 65536) "g" else f"$rounded%04x"
    }
    val rateCase = rates.foldLeft(lit(thresh(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(thresh(rate))).otherwise(acc)
    }
    df.filter(substring(md5(col(idCol).cast("string")), 1, 4) < rateCase)
  }

  /** X5q — deterministic EXACT-k sample per group (round 15): the
    * eval-set drawing primitive — "give me exactly k docs from every
    * language/source", where [[hashSample]]'s threshold draw only hits
    * k in expectation and [[stratifiedSplit]] takes proportions, not
    * counts. The draw order is md5 of the salted id — a uniform random
    * permutation any engine replays bit-for-bit (md5 ties broken by the
    * id itself, so even adversarial hash collisions order
    * deterministically) — and the k smallest draws per group win. A
    * group with fewer than k rows is kept whole (the sample cannot
    * invent rows).
    *
    * Scale shape: ONE hash shuffle on the group key + a per-group
    * top-k. This is the window-rank formulation (rank ≤ k); a
    * groups×k ≪ rows deployment at extreme per-group cardinality would
    * swap in the bounded-buffer TopKAggregator (q1b) with the md5 draw
    * as the score — same result by the same total order. */
  def exactKSample(df: DataFrame, idCol: String, groupCol: String,
      k: Int, salt: String = "xk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val draw = md5(concat(lit(s"$salt:"), col(idCol).cast("string")))
    df.withColumn("_draw", draw)
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(col("_draw"), col(idCol))))
      .filter(col("_rk") <= k)
      .drop("_draw", "_rk")
  }

  /** X5n — deterministic EXACT-proportion stratified train/val/test split
    * (round 13). `hashSample`'s per-row threshold draw holds proportions
    * only in expectation; evaluation splits want them EXACT per stratum
    * (a 64-doc language must not lose its val set to hash luck). Rows are
    * ranked within each stratum by a salted md5 ticket (tie: id) and
    * assigned by exact integer rank thresholds — rank·100 ≤ n·pct, no
    * float division — so every engine derives the identical assignment
    * and each stratum's proportions hold to ±1 row.
    *
    * Scale: ONE shuffle on the stratum key; the rank window sorts each
    * stratum within its partitions. A stratum is a language/domain here —
    * thousands to millions of rows, dozens of strata — the cardinality
    * regime window functions are built for. For UNBOUNDED strata (or no
    * strata at all) use [[hashSample]]'s threshold form instead: exact
    * proportions per stratum inherently require ranking that stratum. */
  def stratifiedSplit(df: DataFrame, idCol: String, strataCol: String,
      pctTrain: Int, pctVal: Int): DataFrame = {
    require(pctTrain > 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"need pctTrain > 0, pctVal >= 0, sum <= 100; got $pctTrain/$pctVal")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    val ticket = md5(concat(lit("split:"), col(idCol).cast("string")))
    // rank is an int (row_number's type): the ×100 must happen in long
    // arithmetic or strata beyond ~21.4M rows silently overflow (or throw
    // under ANSI mode) and corrupt the assignment — exactly the regime
    // the scaladoc above promises ("millions of rows per stratum")
    df.withColumn("_rk",
        row_number().over(w.orderBy(ticket, col(idCol))).cast("long"))
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("split",
        when(col("_rk") * 100 <= col("_n") * pctTrain, "train")
          .when(col("_rk") * 100 <= col("_n") * (pctTrain + pctVal), "val")
          .otherwise("test"))
      .drop("_rk", "_n")
  }

  /** X5o — near-dup-aware (leakage-free) train/val/test split (round 14):
    * the split draw hashes the duplicate-CLUSTER id, not the row id, so
    * every member of a near-dup component inherits one assignment and a
    * near-duplicate pair can never straddle train/test — the contamination
    * channel a row-hashed split ([[hashSample]], [[stratifiedSplit]])
    * leaves wide open on an undeduplicated corpus (test leakage via
    * near-dups is exactly what x4_decontaminate guards AGAINST eval sets;
    * this is the same guard INSIDE the corpus).
    *
    * Input must already carry the component id (from [[graft.ops.Dedup]]
    * `components`/`componentsStar` — (doc_id, cluster)). The draw is the
    * [[hashSample]] md5-16-bit-prefix uniform, salted, thresholded at
    * round(pct·65536/100) — engine-portable, no RNG. Narrow projection:
    * the split itself adds NO shuffle on top of the component
    * computation. Proportions hold in expectation at COMPONENT
    * granularity (the correct unit — leakage-free splitting cannot
    * promise row-exact proportions when components are atomic). */
  def leakFreeSplit(withCluster: DataFrame, clusterCol: String,
      pctTrain: Int, pctVal: Int, salt: String = "leak"): DataFrame = {
    require(pctTrain > 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"need pctTrain > 0, pctVal >= 0, sum <= 100; got $pctTrain/$pctVal")
    // same 5-char-format hazard as hashSampleBy: a pct that rounds to
    // 65536 must use a keep-everything sentinel ('g' > any hex prefix)
    def thresh(pct: Int): String = {
      val r = math.round(pct * 65536.0 / 100).toInt
      if (r >= 65536) "g" else f"$r%04x"
    }
    val p = substring(
      md5(concat(lit(s"$salt:"), col(clusterCol).cast("string"))), 1, 4)
    withCluster.withColumn("split",
      when(p < lit(thresh(pctTrain)), "train")
        .when(p < lit(thresh(pctTrain + pctVal)), "val")
        .otherwise("test"))
  }

  /** X5g — temperature-scaled stratum resampling: the multilingual-corpus
    * balancing op (the alpha-sampling of multilingual pretraining sets —
    * flatten stratum shares so the head language stops dominating without
    * dropping the tail). With stratum sizes n_l, alpha = 0.5 sampling
    * keeps stratum l at rate sqrt(n_min / n_l): the rarest stratum is
    * kept whole and every larger one is sqrt-compressed toward it.
    *
    * The draw is the same deterministic md5 16-bit uniform as
    * [[hashSample]] (h = first 4 md5 nibbles of the id, u = h/65536); the
    * keep rule is the EXACT-INTEGER form of `u < sqrt(n_min/n_l)`:
    * `h² · n_l < 65536² · n_min`. No float pow/sqrt anywhere, so any
    * engine replays the draw bit for bit (h² < 2^32; exact while stratum
    * counts stay below 2^31 rows — beyond that, pre-divide all counts by
    * a common power of two, the rule only uses their ratio).
    *
    * Scale shape: the stratum histogram is one partial-agg shuffle
    * collapsing to |strata| rows, broadcast back; the keep filter is
    * map-side. One tiny shuffle regardless of corpus size, no global
    * ordering anywhere. */
  def temperatureSample(df: DataFrame, idCol: String,
      strataCol: String): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_stratum"))
    val withMin = counts.crossJoin(
      broadcast(counts.agg(min(col("n_stratum")).as("n_min"))))
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(withMin), strataCol)
      .filter(h * h * col("n_stratum") < lit(65536L * 65536L) * col("n_min"))
      .drop("n_stratum", "n_min")
  }

  /** X5 — token-budget corpus mixing: fill a per-group token budget
    * (e.g. a DoReMi-style language/domain mixture expressed as token
    * counts, not document counts) by taking documents in a deterministic
    * pseudo-random order until the group's budget is exhausted. Budget
    * semantics are "last whole document under the line": a doc is kept
    * iff the running token total THROUGH it stays ≤ budget — no partial
    * documents, no overshoot.
    *
    * The order is md5(id) — the same deterministic no-RNG draw every
    * sampler here uses — so the selected set is a uniform random subset
    * of the group, replayable bit-for-bit by any engine, and STABLE
    * under corpus growth in the only way that matters for mixtures: a
    * re-run over a grown corpus re-draws, but two engines at the same
    * snapshot agree exactly.
    *
    * Scale shape: one broadcast of the |groups|-row budget dim, then ONE
    * window shuffle on the group key for the running sum. The global
    * order-by inside a group is the honest cost of a sequential budget
    * fill (the cumulative sum is inherently ordered); groups are
    * languages/domains — tens to hundreds — so per-group sort fan-in is
    * the per-reducer volume, and a group too large to sort on one
    * reducer should be pre-gated by [[hashSample]] to ~2× its budget
    * first (the budget line lands inside any uniform prefix with
    * overwhelming probability; the doc notes this contract rather than
    * hiding a second shuffle inside). Token counting is a codegen'd
    * split/size projection — no UDF. */
  def tokenBudgetSample(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgets: Seq[(String, Long)]): DataFrame = {
    import docs.sparkSession.implicits._
    val b = broadcast(budgets.toDF(groupCol, "budget"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs
      .select(col(idCol), col(groupCol),
        size(split(col(textCol), " ")).cast("long").as("toks"))
      .join(b, Seq(groupCol))
      .withColumn("cum_toks", sum(col("toks")).over(w))
      .filter(col("cum_toks") <= col("budget"))
      .select(col(idCol), col(groupCol), col("toks"), col("cum_toks"))
  }

  /** Salted two-phase aggregation for skewed group keys: repartition the
    * hot key's rows across `saltBuckets` partial groups, aggregate, then
    * combine. sum/count compose exactly (avg = sum/count downstream).
    *
    * Usage: saltedSum(df, key, valueCol) == df.groupBy(key).agg(sum, count)
    * for any distribution, but the first shuffle spreads a hot key over
    * saltBuckets reducers instead of one. (AQE skew handling covers joins;
    * single-key agg skew still needs salting.) */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame =
    df.withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(col(key), col("salt"))
      .agg(sum(col(valueCol)).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col(key))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))

  /** Broadcast-salted join for a skewed fact key joining a dim too large to
    * broadcast whole but with known hot keys: replicate dim rows for hot
    * keys across `saltBuckets` salts, salt the fact side, join on
    * (key, salt). Result equals the plain join. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedFacts = facts.withColumn("salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val explodedDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFacts.join(explodedDim, Seq(key, "salt")).drop("salt")
  }

  /** Binned range join: point-in-interval joins degenerate to a
    * nested-loop (broadcast-NL at best, cartesian at worst) because the
    * predicate has no equi-key. When BOTH sides are large, the scalable
    * shape is binning: each interval explodes to the `binWidth`-sized
    * bins it overlaps, each point maps to its single bin, and the join
    * becomes an EQUI-join on the bin id with the exact range predicate
    * re-applied as a residual filter — same rows out, but the shuffle is
    * keyed and partitionable. Bin count per interval = O(span/binWidth),
    * so pick binWidth near the typical interval span (a handful of bins
    * per interval). The standard interval-join strategy in distributed
    * engines; composes with broadcast when one side IS small. */
  def binnedRangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val binned = intervals.withColumn("bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    points
      .withColumn("bin", floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, Seq("bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("bin")
  }

  /** J6c — interval×interval OVERLAP join, both sides large: the
    * two-sided sibling of [[binnedRangeJoin]] (which joins POINTS to
    * intervals). Every interval explodes to the binWidth-sized bins it
    * covers, the join is an EQUI-join on (keys, bin), and the exact
    * overlap predicate (aS ≤ bE ∧ bS ≤ aE) re-applies as a residual.
    * A pair overlapping several shared bins would be emitted once per
    * bin; instead of a distinct over the output, each pair is emitted
    * ONLY in its canonical bin — the bin of max(aS, bS), which both
    * sides cover exactly when they overlap — so the join output is
    * duplicate-free by construction (the standard distributed
    * interval-join trick; no post-shuffle dedup).
    *
    * Bin fan-out per interval = span/binWidth + 1: pick binWidth near
    * the typical interval length (the [[binnedRangeJoin]] sizing rule).
    * Caller pre-renames payload columns so the two sides don't collide;
    * both frames must carry `keyCols`. */
  def intervalOverlapJoin(a: DataFrame, aS: String, aE: String,
      b: DataFrame, bS: String, bE: String,
      keyCols: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, s: String, e: String) =
      df.withColumn("_bin", explode(sequence(
        expr(s"$s div ${binWidth}L"), expr(s"$e div ${binWidth}L"))))
    binned(a, aS, aE)
      .join(binned(b, bS, bE), keyCols :+ "_bin")
      .filter(col(aS) <= col(bE) && col(bS) <= col(aE))
      .filter(col("_bin") ===
        greatest(expr(s"$aS div ${binWidth}L"), expr(s"$bS div ${binWidth}L")))
      .drop("_bin")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * shuffle-free (co-located scan -> SortMergeJoin without Exchange).
    * Bucketing metadata lives in the session catalog; at cluster scale
    * this is the standard pre-partitioning for repeated fact-fact joins. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", s"$p/$table")).saveAsTable(table)
  }

  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
