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
  * All arithmetic is built-in higher-order functions (zip_with/aggregate)
  * — codegen'd, no UDF, no driver-side collect.
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

  /** Hot-path cosine: the custom codegen'd Catalyst expression
    * (functions.CosineSimilarity) — one fused loop, no allocation,
    * bit-identical numerics to the sequential fold above. */
  private def cosine(df: DataFrame): org.apache.spark.sql.Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    expr("graft_cosine(qv, cv)")
  }

  /** X3a — exact top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` is expected to be small (it is
    * broadcast); ranking is over rounded similarity with vec_id tie-break
    * so results are stable across engines. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val pairs = broadcast(queries.select(col("vec_id").as("query_id"),
        asDouble("embedding").as("qv")))
      .crossJoin(corpus.select(col("vec_id"), asDouble("embedding").as("cv")))
      .filter(col("query_id") =!= col("vec_id"))
    val simmed = pairs.withColumn("sim", round(cosine(pairs), 6))
    simmed
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  /** X2d — embedding-cosine near-dup pairs: the top-N most similar
    * vector pairs. Brute-force pair generation at test scale; the corpus²
    * blowup is bounded by `maxId` (only vectors below it pair up — the
    * "block" here; at 100 TB the block is an LSH bucket from withBucket,
    * same downstream kernel). */
  def cosineNearDupPairs(corpus: DataFrame, maxId: Long, topN: Int): DataFrame = {
    val a = corpus.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("v1"), asDouble("embedding").as("qv"))
    val b = corpus.filter(col("vec_id") < maxId)
      .select(col("vec_id").as("v2"), asDouble("embedding").as("cv"))
    val pairs = a.join(b, col("v1") < col("v2"))
    pairs
      .withColumn("sim", round(cosine(pairs), 6))
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

  /** X3c — IVF (inverted-file) index: corpus vectors are assigned to
    * their nearest of `k` coarse centroids; a query probes its `nProbe`
    * nearest centroids and re-ranks exactly inside those cells only.
    *
    * Centroids here are a deterministic sample (lowest `k` vec_ids) —
    * production would Lloyd-iterate, which only changes centroid quality,
    * not the operator shape. At 100 TB: centroids broadcast (k is small),
    * the assignment is one narrow pass over the corpus, and the probe join
    * is an equi-join on cid — per-cell work, never corpus × queries. */
  def ivfAssign(corpus: DataFrame, k: Int): DataFrame = {
    val cents = broadcast(corpus.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), asDouble("embedding").as("cv")))
    val scored = corpus.select(col("vec_id"), asDouble("embedding").as("qv"))
      .crossJoin(cents)
    val ranked = scored.withColumn("csim", cosine(scored))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
    ranked.filter(col("crnk") === 1)
      .select(col("vec_id"), col("cid"), col("qv").as("cv"))
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val assigned = ivfAssign(corpus, nCentroids)
    val cents = broadcast(corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), asDouble("embedding").as("cv")))
    val qscored = queries.select(col("vec_id").as("query_id"),
        asDouble("embedding").as("qv"))
      .crossJoin(cents)
    val probes = qscored.withColumn("csim", cosine(qscored))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("crnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("cid"))
    val cands = probes.join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
    cands.withColumn("sim", round(cosine(cands), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }

  /** X3b — approximate top-k: candidates restricted to the query's LSH
    * bucket, exact cosine re-ranking inside the bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 8): DataFrame = {
    val q = withBucket(queries, "embedding", nPlanes)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
    val c = withBucket(corpus, "embedding", nPlanes)
      .select(col("vec_id"), col("v").as("cv"), col("bucket"))
    val cands = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
    cands
      .withColumn("sim", round(cosine(cands), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id"), col("sim"), col("rnk"))
  }
}
