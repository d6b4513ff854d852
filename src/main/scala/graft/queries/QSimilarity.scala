package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** X3 similarity/ANN family: exact, LSH, IVF, PQ, rerank, RRF, MMR, recall eval.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QSimilarity {

  /** X3e — Lloyd k-means assignments (rows-only: float centroid means
    * are summation-order-dependent across engines, so cross-engine
    * hash-parity is out of reach BY DESIGN; determinism, inertia
    * monotonicity, and cluster semantics are ClusteringSpec's job). */
  val x3Kmeans = QuerySpec("x3_kmeans",
    (s, d) => Clustering.kmeans(T(s, d, "embeddings"), 8, 3)
      .select(col("vec_id"), col("cid"))
      .orderBy(col("vec_id")),
    None)


  val x3TopkCosine = QuerySpec("x3_topk_cosine",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           |  FROM embeddings WHERE vec_id < 10),
           |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
           |p AS (SELECT query_id, vec_id,
           |    round(list_cosine_similarity(qv, cv), 6) AS sim
           |  FROM q, c WHERE query_id <> vec_id),
           |r AS (SELECT query_id, vec_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, vec_id) AS INT) AS rnk
           |  FROM p)
           |SELECT query_id, vec_id, sim, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin),
    bench = true)


  /** Approximate ANN — bucket membership is engine-defined, no oracle;
    * AnnSpec unit-tests recall vs the exact top-k. */
  val x3AnnLsh = QuerySpec("x3_ann_lsh",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .orderBy(col("query_id"), col("rnk"))
    },
    None)


  /** IVF ANN — fully oracle-checked since round 7: centroids are the
    * lowest-16 vec_ids (deterministic), and BOTH the cell assignment and
    * the probe choice rank over 6dp-ROUNDED cosine with cid tie-break, so
    * the whole index construction + probe + re-rank chain replays in
    * DuckDB (raw-float ranking would flip on last-ulp kernel differences
    * between engines — rounding is what buys portability). */
  val x3Ivf = QuerySpec("x3_ivf_topk",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, 5,
        nCentroids = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
           |asr AS (
           |  SELECT e.vec_id, cents.cid,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY round(list_cosine_similarity(e.v, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM e, cents),
           |assigned AS (SELECT vec_id, cid FROM asr WHERE crnk = 1),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
           |qpr AS (
           |  SELECT q.query_id, cents.cid,
           |    row_number() OVER (PARTITION BY q.query_id
           |      ORDER BY round(list_cosine_similarity(q.qv, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM q, cents),
           |probes AS (SELECT query_id, cid FROM qpr WHERE crnk <= 4),
           |cand AS (
           |  SELECT p.query_id, a.vec_id
           |  FROM probes p JOIN assigned a ON a.cid = p.cid
           |  WHERE a.vec_id <> p.query_id),
           |scored AS (
           |  SELECT cand.query_id, cand.vec_id,
           |    round(list_cosine_similarity(qe.v, ce.v), 6) AS sim
           |  FROM cand
           |  JOIN e qe ON qe.vec_id = cand.query_id
           |  JOIN e ce ON ce.vec_id = cand.vec_id),
           |r AS (SELECT query_id, vec_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, vec_id) AS INT) AS rnk
           |  FROM scored)
           |SELECT query_id, vec_id, sim, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin))


  /** X3r — IVF RECALL@5 judged in-engine (round 13): the x2_minhash_est
    * pattern applied to the similarity lane — the approximate index's
    * quality METRIC is itself a judged query, not a spec-only claim.
    * Per query: |IVF top-5 ∩ exact top-5| · 200000 ppm, computed by one
    * semi-join of the two (query, vec) lists; queries whose probed
    * cells miss every true neighbor surface with recall 0 rather than
    * dropping out. Both input lanes already hash-match their own
    * oracles, so this composition is judged end to end (the oracle
    * replays BOTH retrievals and the intersection). At 100 TB the
    * exact side runs on a held-out query sample — recall estimation
    * never needs the full corpus scanned more than once per query
    * batch, and the metric frame is |Q| rows. */
  val x3IvfRecall = QuerySpec("x3_ivf_recall",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val ivf = Similarity.ivfTopK(q, emb, 5, nCentroids = 16, nProbe = 4)
        .select(col("query_id"), col("vec_id"))
      val exact = Similarity.bruteForceTopK(q, emb, 5)
        .select(col("query_id"), col("vec_id"))
      val hits = exact.join(ivf, Seq("query_id", "vec_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      q.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hit"), lit(0L)) * 200000).cast("long")
            .as("recall_ppm"))
        .orderBy(col("query_id"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
           |asr AS (
           |  SELECT e.vec_id, cents.cid,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY round(list_cosine_similarity(e.v, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM e, cents),
           |assigned AS (SELECT vec_id, cid FROM asr WHERE crnk = 1),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
           |qpr AS (
           |  SELECT q.query_id, cents.cid,
           |    row_number() OVER (PARTITION BY q.query_id
           |      ORDER BY round(list_cosine_similarity(q.qv, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM q, cents),
           |probes AS (SELECT query_id, cid FROM qpr WHERE crnk <= 4),
           |cand AS (
           |  SELECT p.query_id, a.vec_id
           |  FROM probes p JOIN assigned a ON a.cid = p.cid
           |  WHERE a.vec_id <> p.query_id),
           |scored AS (
           |  SELECT cand.query_id, cand.vec_id,
           |    round(list_cosine_similarity(qe.v, ce.v), 6) AS sim
           |  FROM cand
           |  JOIN e qe ON qe.vec_id = cand.query_id
           |  JOIN e ce ON ce.vec_id = cand.vec_id),
           |ivf5 AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY sim DESC, vec_id) AS rnk
           |    FROM scored) WHERE rnk <= 5),
           |exp AS (
           |  SELECT q.query_id, e.vec_id,
           |    round(list_cosine_similarity(q.qv, e.v), 6) AS sim
           |  FROM q, e WHERE e.vec_id <> q.query_id),
           |ex5 AS (
           |  SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY sim DESC, vec_id) AS rnk
           |    FROM exp) WHERE rnk <= 5),
           |hits AS (
           |  SELECT x.query_id, count(*) AS n
           |  FROM ex5 x JOIN ivf5 i
           |    ON i.query_id = x.query_id AND i.vec_id = x.vec_id
           |  GROUP BY 1)
           |SELECT q.query_id,
           |  CAST(coalesce(h.n, 0) * 200000 AS BIGINT) AS recall_ppm
           |FROM q LEFT JOIN hits h ON h.query_id = q.query_id
           |ORDER BY q.query_id""".stripMargin))


  /** X3b' — oracle-checked ANN: md5-plane single-table sign-LSH with
    * Hamming-1 multi-probe (Similarity.md5AnnTopK). The DuckDB twin
    * replays bucket derivation, probe expansion (xor), the bucket
    * equi-join, and the rounded re-rank — approximate search in the
    * hash-checked artifact (x3_ann_lsh keeps the murmur3 multi-table
    * recall story as rows-only + recall spec). */
  val x3AnnMd5 = QuerySpec("x3_ann_md5",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.md5AnnTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            |b AS (SELECT vec_id, v, ${cosineBucketSqlN(4)} AS bucket FROM e),
            |q AS (
            |  SELECT vec_id AS query_id, v AS qv,
            |    unnest([bucket, xor(bucket, 1), xor(bucket, 2),
            |            xor(bucket, 4), xor(bucket, 8)]) AS bucket
            |  FROM b WHERE vec_id < 10),
            |scored AS (
            |  SELECT q.query_id, c.vec_id,
            |    round(list_cosine_similarity(q.qv, c.v), 6) AS sim
            |  FROM q JOIN b c ON c.bucket = q.bucket
            |  WHERE c.vec_id <> q.query_id),
            |dedup AS (
            |  SELECT query_id, vec_id, max(sim) AS sim
            |  FROM scored GROUP BY 1, 2),
            |r AS (SELECT query_id, vec_id, sim,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY sim DESC, vec_id) AS INT) AS rnk
            |  FROM dedup)
            |SELECT query_id, vec_id, sim, rnk FROM r WHERE rnk <= 5
            |ORDER BY query_id, rnk""".stripMargin))


  /** X3k — reciprocal-rank fusion (round 11): the hybrid-retrieval
    * combiner over the engine's own two proven lists — the EXACT cosine
    * top-5 (x3_topk_cosine) and the md5-plane multiprobe ANN top-5
    * (x3_ann_md5). Score = Σ 1e9 div (60 + rank) in fixed point, so the
    * fused ordering is exact-integer; the oracle composes the two
    * already-proven CTE chains and replays the fusion bit for bit. The
    * fusion itself touches only |Q|×k rows per list — corpus-sized work
    * stays in the retrieval lanes. */
  val x3Rrf = QuerySpec("x3_rrf",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      Similarity.rrfFuse(
        Similarity.bruteForceTopK(q, emb, 5),
        Similarity.md5AnnTopK(q, emb, 5), 5)
        .orderBy(col("query_id"), col("rrf_rnk"))
    },
    Some(s"""-- nonneg-div(2): reciprocal-rank numerators
           |WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
            |  FROM embeddings),
            |p AS (SELECT q.vec_id AS query_id, c.vec_id,
            |    round(list_cosine_similarity(q.v, c.v), 6) AS sim
            |  FROM e q, e c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
            |la AS (SELECT * FROM (
            |    SELECT query_id, vec_id,
            |      CAST(row_number() OVER (PARTITION BY query_id
            |        ORDER BY sim DESC, vec_id) AS INT) AS rnk_a
            |    FROM p) WHERE rnk_a <= 5),
            |b AS (SELECT vec_id, v, ${cosineBucketSqlN(4)} AS bucket FROM e),
            |q2 AS (
            |  SELECT vec_id AS query_id, v AS qv,
            |    unnest([bucket, xor(bucket, 1), xor(bucket, 2),
            |            xor(bucket, 4), xor(bucket, 8)]) AS bucket
            |  FROM b WHERE vec_id < 10),
            |sc AS (
            |  SELECT q2.query_id, c.vec_id,
            |    round(list_cosine_similarity(q2.qv, c.v), 6) AS sim
            |  FROM q2 JOIN b c ON c.bucket = q2.bucket
            |  WHERE c.vec_id <> q2.query_id),
            |dd AS (SELECT query_id, vec_id, max(sim) AS sim
            |  FROM sc GROUP BY 1, 2),
            |lb AS (SELECT * FROM (
            |    SELECT query_id, vec_id,
            |      CAST(row_number() OVER (PARTITION BY query_id
            |        ORDER BY sim DESC, vec_id) AS INT) AS rnk_b
            |    FROM dd) WHERE rnk_b <= 5),
            |f AS (
            |  SELECT coalesce(la.query_id, lb.query_id) AS query_id,
            |    coalesce(la.vec_id, lb.vec_id) AS vec_id, rnk_a, rnk_b,
            |    CAST(coalesce(1000000000 // (60 + rnk_a), 0)
            |      + coalesce(1000000000 // (60 + rnk_b), 0) AS BIGINT)
            |      AS score_fp
            |  FROM la FULL JOIN lb
            |    ON la.query_id = lb.query_id AND la.vec_id = lb.vec_id)
            |SELECT * FROM (
            |  SELECT query_id, vec_id, rnk_a, rnk_b, score_fp,
            |    CAST(row_number() OVER (PARTITION BY query_id
            |      ORDER BY score_fp DESC, vec_id) AS INT) AS rrf_rnk
            |  FROM f)
            |WHERE rrf_rnk <= 5 ORDER BY query_id, rrf_rnk""".stripMargin),
    bench = true)


  /** X3l — MMR diversified retrieval (round 11): greedy maximal marginal
    * relevance over the exact top-20 candidates, k = 5 picks, λ = 0.7.
    * The WHOLE greedy draw — every per-step argmax — is judged, because
    * the race key is exact-integer (6dp-rounded sims fixed-pointed, λ as
    * the 7/3 integer weights) and the oracle unrolls the same k steps
    * mechanically. Candidate and pair frames are |Q|·nCand and
    * |Q|·nCand² rows; the corpus is touched only by the retrieval lane
    * that produced the candidates. */
  val x3Mmr = QuerySpec("x3_mmr",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.mmrSelect(emb.filter(col("vec_id") < 10), emb,
          nCand = 20, k = 5)
        .orderBy(col("query_id"), col("pick_rank"))
    },
    Some(mmrSql(20, 5)))


  /** X3d — int8 symmetric embedding quantization: per-vector scale and
    * quantized components (the 4x storage/bandwidth lever for ANN at
    * corpus scale). floor(+0.5) quantizer so the oracle reproduces ties
    * bit-exactly; the reconstruction-error bound is spec-asserted. */
  val x3Quant = QuerySpec("x3_quant",
    (s, d) => Similarity.quantizeInt8(T(s, d, "embeddings"), "embedding")
      .select(col("vec_id"),
        expr("floor(qscale * 1e6 + 0.5) / 1e6").as("qscale_r"),
        element_at(col("q"), 1).as("q1"),
        element_at(col("q"), 2).as("q2"),
        element_at(col("q"), 3).as("q3"),
        element_at(col("q"), 4).as("q4"))
      .orderBy(col("vec_id")),
    Some("""WITH v AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS e,
           |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
           |      AS maxabs
           |  FROM embeddings),
           |s AS (
           |  SELECT vec_id, e,
           |    CASE WHEN maxabs > 0 THEN 127.0 / maxabs END AS qscale
           |  FROM v)
           |SELECT vec_id,
           |  floor(qscale * 1e6 + 0.5) / 1e6 AS qscale_r,
           |  CAST(floor(e[1] * qscale + 0.5) AS INT) AS q1,
           |  CAST(floor(e[2] * qscale + 0.5) AS INT) AS q2,
           |  CAST(floor(e[3] * qscale + 0.5) AS INT) AS q3,
           |  CAST(floor(e[4] * qscale + 0.5) AS INT) AS q4
           |FROM s ORDER BY vec_id""".stripMargin))


  /** X3d — quantized top-k: exact search over the int8 view (cosine is
    * scale-invariant, so no dequantization happens anywhere). The oracle
    * replays quantization and ranks with the same tie-break. */
  val x3QuantTopk = QuerySpec("x3_quant_topk",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.quantizedTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS e,
           |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
           |      AS maxabs
           |  FROM embeddings),
           |s AS (
           |  SELECT vec_id, e, 127.0 / maxabs AS qscale
           |  FROM v WHERE maxabs > 0),
           |qt AS (
           |  -- x * qscale, matching the engine's association exactly:
           |  -- (x*127)/maxabs can differ in the last ulp and flip floor()
           |  SELECT vec_id,
           |    list_transform(e, x -> CAST(floor(x * qscale + 0.5)
           |      AS DOUBLE)) AS q
           |  FROM s),
           |p AS (SELECT a.vec_id AS query_id, b.vec_id,
           |    round(list_cosine_similarity(a.q, b.q), 6) AS sim
           |  FROM qt a, qt b
           |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
           |r AS (SELECT query_id, vec_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, vec_id) AS INT) AS rnk
           |  FROM p)
           |SELECT query_id, vec_id, sim, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin))


  /** X3i — binary (sign) quantization + Hamming top-k: 64 float dims
    * pack into ONE long (32× compression — the 8-bytes-per-vector tier
    * that makes a trillion-row index memory-resident at 100 TB) and the
    * per-pair kernel is bit_count(xor), two codegen'd integer ops. The
    * oracle replays Hamming through the sign-dot identity
    * (dim − Σsᵢqᵢ)/2 on ±1 lists — exact integers on both engines. */
  val x3BinaryTopk = QuerySpec("x3_binary_topk",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.binaryTopK(emb.filter(col("vec_id") < 10), emb, 5)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH s AS (SELECT vec_id,
           |    list_transform(embedding::DOUBLE[],
           |      x -> CASE WHEN x > 0 THEN 1 ELSE -1 END) AS sg
           |  FROM embeddings),
           |p AS (SELECT q.vec_id AS query_id, c.vec_id,
           |    CAST((64 - CAST(list_dot_product(q.sg, c.sg) AS BIGINT)) / 2
           |      AS INT) AS hamming
           |  FROM s q, s c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
           |r AS (SELECT query_id, vec_id, hamming,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY hamming, vec_id) AS INT) AS rnk
           |  FROM p)
           |SELECT query_id, vec_id, hamming, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin))


  val x3RpRecall = QuerySpec("x3_rp_recall",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      val proj = Similarity.rpProject(emb, "embedding", 16, 64)
      val projQ = proj.filter(col("vec_id") < 10)
      Similarity.evalRanking(
          Similarity.bruteForceTopK(projQ, proj, 5),
          Similarity.bruteForceTopK(q, emb, 5), 5)
        .orderBy(col("query_id"))
    },
    Some(x3RpRecallText),
    bench = true)


  val x3EvalRank = QuerySpec("x3_eval_rank",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      val q = emb.filter(col("vec_id") < 10)
      Similarity.evalRanking(
          Similarity.binaryTopK(q, emb, 5),
          Similarity.bruteForceTopK(q, emb, 5), 5)
        .orderBy(col("query_id"))
    },
    Some(x3EvalRankText),
    bench = true)


  /** X3i (serving shape) — binary candidates → exact re-rank: the coarse
    * pass reads 8 bytes/vector, floats are touched for queries × 25
    * candidate rows only. Cut boundary (exact Hamming, vec_id tie-break)
    * and final ranking (6dp cosine) both replay in the oracle. */
  val x3BinaryRerank = QuerySpec("x3_binary_rerank",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.binaryRerankTopK(emb.filter(col("vec_id") < 10), emb,
          candidates = 25, k = 5)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH s AS (SELECT vec_id,
           |    list_transform(embedding::DOUBLE[],
           |      x -> CASE WHEN x > 0 THEN 1 ELSE -1 END) AS sg
           |  FROM embeddings),
           |p AS (SELECT q.vec_id AS query_id, c.vec_id,
           |    CAST((64 - CAST(list_dot_product(q.sg, c.sg) AS BIGINT)) / 2
           |      AS INT) AS hamming
           |  FROM s q, s c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
           |b AS (SELECT query_id, vec_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY hamming, vec_id) AS brnk
           |  FROM p),
           |cand AS (SELECT query_id, vec_id FROM b WHERE brnk <= 25),
           |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |x AS (SELECT c.query_id, c.vec_id,
           |    round(list_cosine_similarity(qe.v, ce.v), 6) AS sim
           |  FROM cand c
           |  JOIN e qe ON qe.vec_id = c.query_id
           |  JOIN e ce ON ce.vec_id = c.vec_id),
           |r AS (SELECT query_id, vec_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, vec_id) AS INT) AS rnk
           |  FROM x)
           |SELECT query_id, vec_id, sim, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin))


  /** X7a — bucketed co-located join: both fact tables are written
    * bucketed by the join key (Scale.writeBucketed), so the join needs NO
    * exchange on either side — each bucket pair joins in place. At 100 TB
    * this is THE lever for repeated fact-fact joins: the shuffle is paid
    * once at write time and amortized over every subsequent join on that
    * key. The MERGE hint keeps the judged plan the sort-merge shape the
    * layout exists for (a tiny test side would otherwise broadcast);
    * ScaleSpec asserts the no-Exchange plan property. Oracle = the plain
    * join SQL: layout must be invisible in results. */
  /** X3g — product quantization + asymmetric-distance search (round 10):
    * the corpus is PQ-encoded (4 subspaces × 16 deterministic codes —
    * 64 float dims become 4 byte-sized codes, the ~64× compression that
    * lets a 100 TB embedding index fit in memory) and queries rank the
    * corpus through the classic ADC lookup table without ever re-reading
    * the float vectors. Encoding argmin is 6dp-rounded L2² with code-id
    * tie-break and partial dots travel as 1e-6 fixed-point longs, so the
    * oracle replays the ENTIRE chain — codebook, encoding, LUT, ranking
    * — in plain SQL. */
  val x3PqTopk = QuerySpec("x3_pq_topk",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb, 5,
          dim = 64, m = 4, ks = 16)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |sub AS (SELECT unnest(range(0, 4)) AS sub),
           |cb AS (
           |  SELECT sub, CAST(vec_id AS INT) AS code,
           |    e[sub*16+1 : sub*16+16] AS cv
           |  FROM v, sub WHERE vec_id < 16),
           |sv AS (
           |  SELECT vec_id, sub, e[sub*16+1 : sub*16+16] AS sv
           |  FROM v, sub),
           |enc0 AS (
           |  SELECT sv.vec_id, sv.sub, cb.code,
           |    round(list_sum(list_transform(range(1, 17),
           |      i -> (sv.sv[i] - cb.cv[i]) * (sv.sv[i] - cb.cv[i]))), 6) AS d2
           |  FROM sv JOIN cb USING (sub)),
           |enc AS (
           |  SELECT vec_id, sub, code FROM (
           |    SELECT enc0.*, row_number() OVER (PARTITION BY vec_id, sub
           |      ORDER BY d2, code) AS crnk
           |    FROM enc0) WHERE crnk = 1),
           |lut AS (
           |  SELECT q.vec_id AS query_id, cb.sub, cb.code,
           |    CAST(floor(list_sum(list_transform(range(1, 17),
           |      i -> q.e[cb.sub*16+i] * cb.cv[i])) * 1e6 + 0.5)
           |      AS BIGINT) AS pfix
           |  FROM v q, cb WHERE q.vec_id < 10),
           |adc AS (
           |  SELECT l.query_id, e.vec_id,
           |    CAST(sum(l.pfix) AS BIGINT) / 1e6 AS adc
           |  FROM enc e JOIN lut l ON l.sub = e.sub AND l.code = e.code
           |  WHERE l.query_id <> e.vec_id
           |  GROUP BY l.query_id, e.vec_id),
           |r AS (
           |  SELECT query_id, vec_id, adc,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY adc DESC, vec_id) AS INT) AS rnk
           |  FROM adc)
           |SELECT query_id, vec_id, adc, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin))


  /** X3g — IVF-PQ composed (round 11, promoted from spec-only): the full
    * FAISS serving shape. IVF bounds WHICH vectors a query scores (its
    * nProbe cells only), PQ bounds WHAT is read per scored vector (m byte
    * codes against the broadcast ADC table — floats never re-read). This
    * is the benched PQ lane: the unrestricted full-corpus ADC scan
    * (x3_pq_topk) stays judged as the IndexPQ baseline, but the shape a
    * 100 TB index actually serves is this composition. Oracle = the
    * x3_ivf_topk assignment/probe CTE chain feeding the x3_pq_topk
    * codebook/encode/LUT chain, ADC restricted to the candidate pairs. */
  val x3IvfPq = QuerySpec("x3_ivf_pq",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb, 5,
          dim = 64, m = 4, ks = 16, nCentroids = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |cents AS (SELECT vec_id AS cid, e AS cv FROM v WHERE vec_id < 16),
           |asr AS (
           |  SELECT v.vec_id, cents.cid,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY round(list_cosine_similarity(v.e, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM v, cents),
           |assigned AS (SELECT vec_id, cid FROM asr WHERE crnk = 1),
           |qpr AS (
           |  SELECT q.vec_id AS query_id, cents.cid,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY round(list_cosine_similarity(q.e, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM v q, cents WHERE q.vec_id < 10),
           |probes AS (SELECT query_id, cid FROM qpr WHERE crnk <= 4),
           |cand AS (
           |  SELECT p.query_id, a.vec_id
           |  FROM probes p JOIN assigned a ON a.cid = p.cid
           |  WHERE a.vec_id <> p.query_id),
           |sub AS (SELECT unnest(range(0, 4)) AS sub),
           |cb AS (
           |  SELECT sub, CAST(vec_id AS INT) AS code,
           |    e[sub*16+1 : sub*16+16] AS cv
           |  FROM v, sub WHERE vec_id < 16),
           |sv AS (
           |  SELECT vec_id, sub, e[sub*16+1 : sub*16+16] AS sv
           |  FROM v, sub),
           |enc0 AS (
           |  SELECT sv.vec_id, sv.sub, cb.code,
           |    round(list_sum(list_transform(range(1, 17),
           |      i -> (sv.sv[i] - cb.cv[i]) * (sv.sv[i] - cb.cv[i]))), 6) AS d2
           |  FROM sv JOIN cb USING (sub)),
           |enc AS (
           |  SELECT vec_id, sub, code FROM (
           |    SELECT enc0.*, row_number() OVER (PARTITION BY vec_id, sub
           |      ORDER BY d2, code) AS crnk
           |    FROM enc0) WHERE crnk = 1),
           |lut AS (
           |  SELECT q.vec_id AS query_id, cb.sub, cb.code,
           |    CAST(floor(list_sum(list_transform(range(1, 17),
           |      i -> q.e[cb.sub*16+i] * cb.cv[i])) * 1e6 + 0.5)
           |      AS BIGINT) AS pfix
           |  FROM v q, cb WHERE q.vec_id < 10),
           |adc AS (
           |  SELECT c.query_id, c.vec_id,
           |    CAST(sum(l.pfix) AS BIGINT) / 1e6 AS adc
           |  FROM cand c
           |  JOIN enc e ON e.vec_id = c.vec_id
           |  JOIN lut l ON l.query_id = c.query_id
           |    AND l.sub = e.sub AND l.code = e.code
           |  GROUP BY c.query_id, c.vec_id),
           |r AS (
           |  SELECT query_id, vec_id, adc,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY adc DESC, vec_id) AS INT) AS rnk
           |  FROM adc)
           |SELECT query_id, vec_id, adc, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin),
    bench = true)


  /** X3g'' — RESIDUAL IVF-PQ (round 11): PQ codes quantize v − c(v)
    * (FAISS IndexIVFPQ's default encoding) and the score decomposes
    * exactly into the broadcast (query × centroid) dot plus the
    * residual-ADC term. The whole chain — assignment, residual
    * subtraction, residual codebook, encoding, both fixed-point score
    * terms — is deterministic arithmetic, so the oracle replays it all
    * in plain SQL. */
  val x3IvfPqResidual = QuerySpec("x3_ivf_pq_residual",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.ivfPqResidualTopK(emb.filter(col("vec_id") < 10), emb, 5,
          dim = 64, m = 4, ks = 16, nCentroids = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
           |cents AS (SELECT vec_id AS cid, e AS cv FROM v WHERE vec_id < 16),
           |asr AS (
           |  SELECT v.vec_id, cents.cid,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY round(list_cosine_similarity(v.e, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM v, cents),
           |assigned AS (SELECT vec_id, cid FROM asr WHERE crnk = 1),
           |qpr AS (
           |  SELECT q.vec_id AS query_id, cents.cid,
           |    row_number() OVER (PARTITION BY q.vec_id
           |      ORDER BY round(list_cosine_similarity(q.e, cents.cv), 6) DESC,
           |        cents.cid) AS crnk
           |  FROM v q, cents WHERE q.vec_id < 10),
           |probes AS (SELECT query_id, cid FROM qpr WHERE crnk <= 4),
           |cand AS (
           |  SELECT p.query_id, a.vec_id, a.cid
           |  FROM probes p JOIN assigned a ON a.cid = p.cid
           |  WHERE a.vec_id <> p.query_id),
           |res AS (
           |  SELECT a.vec_id,
           |    list_transform(range(1, 65), i -> ve.e[i] - c.cv[i]) AS r
           |  FROM assigned a
           |  JOIN v ve ON ve.vec_id = a.vec_id
           |  JOIN cents c ON c.cid = a.cid),
           |sub AS (SELECT unnest(range(0, 4)) AS sub),
           |rcb AS (
           |  SELECT sub, CAST(vec_id - 16 AS INT) AS code,
           |    r[sub*16+1 : sub*16+16] AS cv
           |  FROM res, sub WHERE vec_id >= 16 AND vec_id < 32),
           |rsv AS (
           |  SELECT vec_id, sub, r[sub*16+1 : sub*16+16] AS sv
           |  FROM res, sub),
           |enc0 AS (
           |  SELECT rsv.vec_id, rsv.sub, rcb.code,
           |    round(list_sum(list_transform(range(1, 17),
           |      i -> (rsv.sv[i] - rcb.cv[i]) * (rsv.sv[i] - rcb.cv[i]))), 6) AS d2
           |  FROM rsv JOIN rcb USING (sub)),
           |enc AS (
           |  SELECT vec_id, sub, code FROM (
           |    SELECT enc0.*, row_number() OVER (PARTITION BY vec_id, sub
           |      ORDER BY d2, code) AS crnk
           |    FROM enc0) WHERE crnk = 1),
           |lut AS (
           |  SELECT q.vec_id AS query_id, rcb.sub, rcb.code,
           |    CAST(floor(list_sum(list_transform(range(1, 17),
           |      i -> q.e[rcb.sub*16+i] * rcb.cv[i])) * 1e6 + 0.5)
           |      AS BIGINT) AS pfix
           |  FROM v q, rcb WHERE q.vec_id < 10),
           |qc AS (
           |  SELECT q.vec_id AS query_id, c.cid,
           |    CAST(floor(list_sum(list_transform(range(1, 65),
           |      i -> q.e[i] * c.cv[i])) * 1e6 + 0.5) AS BIGINT) AS qcfix
           |  FROM v q, cents c WHERE q.vec_id < 10),
           |adc AS (
           |  SELECT c.query_id, c.vec_id,
           |    (CAST(sum(l.pfix) AS BIGINT) + max(qc2.qcfix)) / 1e6 AS adc
           |  FROM cand c
           |  JOIN enc e ON e.vec_id = c.vec_id
           |  JOIN lut l ON l.query_id = c.query_id
           |    AND l.sub = e.sub AND l.code = e.code
           |  JOIN qc qc2 ON qc2.query_id = c.query_id AND qc2.cid = c.cid
           |  GROUP BY c.query_id, c.vec_id),
           |r AS (
           |  SELECT query_id, vec_id, adc,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY adc DESC, vec_id) AS INT) AS rnk
           |  FROM adc)
           |SELECT query_id, vec_id, adc, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin))


  val x3Rerank = QuerySpec("x3_rerank",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.rerankTopK(emb.filter(col("vec_id") < 10), emb,
          candidates = 30, k = 5)
        .orderBy(col("query_id"), col("rnk"))
    },
    Some("""WITH v AS (
           |  SELECT vec_id, embedding::DOUBLE[] AS e,
           |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x)))
           |      AS maxabs
           |  FROM embeddings),
           |s AS (
           |  SELECT vec_id, e, 127.0 / maxabs AS qscale
           |  FROM v WHERE maxabs > 0),
           |qt AS (
           |  SELECT vec_id, e,
           |    list_transform(e, x -> CAST(floor(x * qscale + 0.5)
           |      AS DOUBLE)) AS q
           |  FROM s),
           |p AS (SELECT a.vec_id AS query_id, b.vec_id,
           |    round(list_cosine_similarity(a.q, b.q), 6) AS qsim
           |  FROM qt a, qt b
           |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
           |cand AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id, row_number() OVER (
           |      PARTITION BY query_id ORDER BY qsim DESC, vec_id) AS rn
           |    FROM p) WHERE rn <= 30),
           |ex AS (SELECT c.query_id, c.vec_id,
           |    round(list_cosine_similarity(qa.e, qb.e), 6) AS sim
           |  FROM cand c
           |  JOIN qt qa ON qa.vec_id = c.query_id
           |  JOIN qt qb ON qb.vec_id = c.vec_id),
           |r AS (SELECT query_id, vec_id, sim,
           |    CAST(row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, vec_id) AS INT) AS rnk
           |  FROM ex)
           |SELECT query_id, vec_id, sim, rnk FROM r WHERE rnk <= 5
           |ORDER BY query_id, rnk""".stripMargin),
    bench = true)


  /** X3s — k-NN classification (ops/Similarity.knnClassify): majority
    * label among the 5 nearest cosine neighbors per query, composed
    * from the judged brute-force ranking (6dp-rounded sims) with the
    * (votes desc, label asc) deterministic tie-break. */
  val x3KnnClassify = QuerySpec("x3_knn_classify",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.knnClassify(emb.filter(col("vec_id") < 50), emb, 5)
        .orderBy(col("query_id"))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           |  FROM embeddings WHERE vec_id < 50),
           |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
           |p AS (SELECT query_id, vec_id,
           |    round(list_cosine_similarity(qv, cv), 6) AS sim
           |  FROM q, c WHERE query_id <> vec_id),
           |r AS (SELECT query_id, vec_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, vec_id) AS rnk
           |  FROM p),
           |t AS (SELECT r.query_id, e.label FROM r
           |  JOIN embeddings e ON e.vec_id = r.vec_id WHERE rnk <= 5),
           |v AS (SELECT query_id, label, CAST(count(*) AS BIGINT) AS cnt
           |  FROM t GROUP BY 1, 2),
           |w AS (SELECT query_id, label AS pred_label, cnt AS n_votes,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cnt DESC, label) AS rn
           |  FROM v)
           |SELECT query_id, pred_label, n_votes FROM w WHERE rn = 1
           |ORDER BY query_id""".stripMargin))


  /** X3t — ANN-STAGED k-NN classification
    * (ops/Similarity.knnClassifyAnn): the x3_knn_classify vote tail
    * over the IVF retrieval instead of the brute-force scan — the
    * production shape against a corpus too large to scan per query.
    * The oracle replays the full chain: IVF assignment, probe choice,
    * cell-restricted ranking (all on 6dp-rounded cosine with cid/vec
    * tie-breaks), then votes. */
  val x3KnnAnn = QuerySpec("x3_knn_ann",
    (s, d) => {
      val emb = T(s, d, "embeddings")
      Similarity.knnClassifyAnn(emb.filter(col("vec_id") < 50), emb, 5,
          nCentroids = 16, nProbe = 4)
        .orderBy(col("query_id"))
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
           |  FROM embeddings),
           |cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
           |asr AS (
           |  SELECT e.vec_id, cents.cid,
           |    row_number() OVER (PARTITION BY e.vec_id
           |      ORDER BY round(list_cosine_similarity(e.v, cents.cv), 6)
           |        DESC, cents.cid) AS crnk
           |  FROM e, cents),
           |assigned AS (SELECT vec_id, cid FROM asr WHERE crnk = 1),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e
           |  WHERE vec_id < 50),
           |qpr AS (
           |  SELECT q.query_id, cents.cid,
           |    row_number() OVER (PARTITION BY q.query_id
           |      ORDER BY round(list_cosine_similarity(q.qv, cents.cv), 6)
           |        DESC, cents.cid) AS crnk
           |  FROM q, cents),
           |probes AS (SELECT query_id, cid FROM qpr WHERE crnk <= 4),
           |cand AS (
           |  SELECT p.query_id, a.vec_id
           |  FROM probes p JOIN assigned a ON a.cid = p.cid
           |  WHERE a.vec_id <> p.query_id),
           |scored AS (
           |  SELECT cand.query_id, cand.vec_id,
           |    round(list_cosine_similarity(qe.v, ce.v), 6) AS sim
           |  FROM cand
           |  JOIN e qe ON qe.vec_id = cand.query_id
           |  JOIN e ce ON ce.vec_id = cand.vec_id),
           |r AS (SELECT query_id, vec_id,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY sim DESC, vec_id) AS rnk
           |  FROM scored),
           |t AS (SELECT r.query_id, e.label FROM r
           |  JOIN e ON e.vec_id = r.vec_id WHERE rnk <= 5),
           |vv AS (SELECT query_id, label, CAST(count(*) AS BIGINT) AS cnt
           |  FROM t GROUP BY 1, 2),
           |w AS (SELECT query_id, label AS pred_label, cnt AS n_votes,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY cnt DESC, label) AS rn
           |  FROM vv)
           |SELECT query_id, pred_label, n_votes FROM w WHERE rn = 1
           |ORDER BY query_id""".stripMargin))
}
