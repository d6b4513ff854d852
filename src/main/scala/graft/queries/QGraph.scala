package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** X10 graph family.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QGraph {

  /** X10 — DISTRIBUTION DRIFT between two snapshot versions (round 12):
    * the streaming drift monitor's kernel (DriftMonitor.l1DriftFrame),
    * judged batch-to-batch — bin v1's values against the BASELINE
    * (v0) histogram's pinned bounds, per-bin integer shares
    * floor(cnt·1e6/n), L1-sum the share deltas. Exact-integer end to
    * end, so the ppm alarm value itself is oracle-replayed, not just
    * the mechanism. The streaming wrapper (ST10) stays unit-covered;
    * this is the same code path on the same sketch. */
  val x10Drift = QuerySpec("x10_drift",
    (s, d) => {
      val root = mergeCdcSnapshot(s, d)
      val snap = s"$root/snap"
      val v0 = Cdc.snapshotAt(s, snap, 0)
      val bounds = v0.agg(min(col("price").cast("double")).as("lo"),
        max(col("price").cast("double")).as("hi"))
      val baseline = Sketch.histBuildWith(v0, "price", 32, bounds)
      graft.streaming.DriftMonitor.l1DriftFrame(
        Cdc.latestSnapshot(s, snap), "price", baseline, 32)
    },
    Some(mergedSnapshotSql + ",\n" +
      "b AS (SELECT min(price) AS lo, max(price) AS hi FROM t),\n" +
      "h0 AS (SELECT CAST(greatest(0, least(31,\n" +
      "    CAST(floor((price - lo) / ((hi - lo) / 32)) AS INT))) AS INT)\n" +
      "    AS bin, count(*) AS cnt\n" +
      "  FROM t, b GROUP BY 1),\n" +
      "h1 AS (SELECT CAST(greatest(0, least(31,\n" +
      "    CAST(floor((price - lo) / ((hi - lo) / 32)) AS INT))) AS INT)\n" +
      "    AS bin, count(*) AS cnt\n" +
      "  FROM merged, b GROUP BY 1),\n" +
      "s0 AS (SELECT bin,\n" +
      "    CAST(floor(cnt * 1000000 / (SELECT sum(cnt) FROM h0)) AS BIGINT)\n" +
      "    AS sh FROM h0),\n" +
      "s1 AS (SELECT bin,\n" +
      "    CAST(floor(cnt * 1000000 / (SELECT sum(cnt) FROM h1)) AS BIGINT)\n" +
      "    AS sh FROM h1)\n" +
      "SELECT CAST(sum(abs(coalesce(s1.sh, 0) - coalesce(s0.sh, 0)))\n" +
      "    AS BIGINT) AS l1_ppm\n" +
      "FROM s0 FULL OUTER JOIN s1 USING (bin)"))


  /** X10b — PAGERANK over the customer↔supplier trade graph (round 12):
    * iterative link centrality — the curation signal CommonCrawl-scale
    * pipelines weight page/domain quality with — in EXACT integer ppm
    * fixed point (contrib = score div outdeg; damp = 150000 +
    * (850·Σ) div 1000), so all three unrolled iterations hash-match the
    * oracle's CTE chain. Per iteration: one equi-join of the static
    * degree-annotated edge frame against the node-sized rank frame +
    * one partial-combining sum — shuffles on node ids only, state is
    * one row per node. */
  val x10Pagerank = QuerySpec("x10_pagerank",
    (s, d) => Graph.pageRank(
        // the edge frame is read twice inside pageRank (degrees + the
        // annotated join) — one materialization, not two fact scans
        Graph.tradeEdges(T(s, d, "lineitem"), T(s, d, "orders"))
          .localCheckpoint(eager = false), 3)
      .orderBy(col("node")),
    Some("""-- nonneg-div(6): ppm rank mass >= 0 throughout
           |WITH e0 AS (
           |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
           |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS (SELECT src, dst FROM e0
           |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
           |        FROM e GROUP BY src),
           |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score
           |       FROM deg),
           |c1 AS (SELECT e.dst AS node,
           |    CAST(sum(r.score // d.outdeg) AS BIGINT) AS c
           |  FROM e JOIN r0 r ON e.src = r.node
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |r1 AS (SELECT node,
           |    CAST(150000 + (850 * c) // 1000 AS BIGINT) AS score FROM c1),
           |c2 AS (SELECT e.dst AS node,
           |    CAST(sum(r.score // d.outdeg) AS BIGINT) AS c
           |  FROM e JOIN r1 r ON e.src = r.node
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |r2 AS (SELECT node,
           |    CAST(150000 + (850 * c) // 1000 AS BIGINT) AS score FROM c2),
           |c3 AS (SELECT e.dst AS node,
           |    CAST(sum(r.score // d.outdeg) AS BIGINT) AS c
           |  FROM e JOIN r2 r ON e.src = r.node
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |r3 AS (SELECT node,
           |    CAST(150000 + (850 * c) // 1000 AS BIGINT) AS score FROM c3)
           |SELECT node, score FROM r3 ORDER BY node""".stripMargin),
    bench = true)


  /** X10b' — PAGERANK WITH DANGLING MASS (round 14): judged on the
    * UN-symmetrized trade graph, where every supplier is a sink — the
    * graph class plain pageRank is silently wrong on (sinks drop their
    * mass; total rank deflates). Same exact integer-ppm contract, plus
    * the redistribution term: dsh = (Σ dangling score) div N added to
    * every node's damped input each round. The oracle unrolls all three
    * iterations — dangling sum, floor-divided share, contribution join,
    * and the left join that keeps in-degree-0 customers alive — so the
    * mechanism is hash-checked end to end, not just "ranks look sane". */
  val x10PagerankDangling = QuerySpec("x10_pagerank_dangling",
    (s, d) => Graph.pageRankDangling(
        Graph.tradeEdgesDirected(T(s, d, "lineitem"), T(s, d, "orders")), 3)
      .orderBy(col("node")),
    Some {
      val iters = (1 to 3).map { i =>
        s"""d$i AS (SELECT CAST(coalesce(sum(score), 0) AS BIGINT)
           |    // (SELECT n FROM nn) AS dsh
           |  FROM r${i - 1} WHERE outdeg IS NULL),
           |c$i AS (SELECT e.dst AS node,
           |    CAST(sum(r.score // r.outdeg) AS BIGINT) AS c
           |  FROM e JOIN r${i - 1} r ON e.src = r.node GROUP BY e.dst),
           |r$i AS (SELECT nd.node, nd.outdeg,
           |    CAST(150000 + (850 * (coalesce(c$i.c, 0) +
           |      (SELECT dsh FROM d$i))) // 1000 AS BIGINT) AS score
           |  FROM nd LEFT JOIN c$i ON nd.node = c$i.node),""".stripMargin
      }.mkString("\n")
      s"""-- nonneg-div(9): ppm rank mass >= 0 throughout
         |WITH e AS (
         |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
         |        FROM e GROUP BY src),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |nd AS (SELECT nodes.node, deg.outdeg FROM nodes
         |       LEFT JOIN deg ON nodes.node = deg.src),
         |r0 AS (SELECT node, outdeg, CAST(1000000 AS BIGINT) AS score
         |       FROM nd),
         |$iters
         |fin AS (SELECT node, score FROM r3)
         |SELECT node, score FROM fin ORDER BY node""".stripMargin
    })


  /** X10t — WEIGHTED PAGERANK (round 16, r15 VERDICT item 7): the
    * integer-ppm kernel with per-edge trade intensity (lineitem count
    * per customer↔supplier pair) steering the mass split —
    * contrib = (score · w) div Σw instead of the uniform div outdeg.
    * The oracle unrolls all three iterations with the weights in place,
    * so the weighted split itself is hash-checked. */
  val x10PagerankWeighted = QuerySpec("x10_pagerank_weighted",
    (s, d) => Graph.pageRankWeighted(
        Graph.tradeEdgesWeighted(T(s, d, "lineitem"), T(s, d, "orders"))
          .localCheckpoint(eager = false), 3)
      .orderBy(col("node")),
    Some {
      val iters = (1 to 3).map { i =>
        s"""c$i AS (SELECT e.dst AS node,
           |    CAST(sum((r.score * e.w) // s.wsum) AS BIGINT) AS c
           |  FROM e JOIN r${i - 1} r ON e.src = r.node
           |  JOIN ws s ON s.src = e.src GROUP BY e.dst),
           |r$i AS (SELECT node,
           |    CAST(150000 + (850 * c) // 1000 AS BIGINT) AS score
           |  FROM c$i),""".stripMargin
      }.mkString("\n")
      s"""-- nonneg-div(6): ppm rank mass and positive trade weights
         |WITH e0 AS (
         |  SELECT CAST(o_custkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |e AS (SELECT src, dst, w FROM e0
         |      UNION ALL SELECT dst, src, w FROM e0),
         |ws AS (SELECT src, CAST(sum(w) AS BIGINT) AS wsum FROM e
         |       GROUP BY src),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score
         |       FROM ws),
         |$iters
         |fin AS (SELECT node, score FROM r3)
         |SELECT node, score FROM fin ORDER BY node""".stripMargin
    })


  /** X10u — K-SOURCE BETWEENNESS (round 16, r15 VERDICT item 7):
    * Brandes dependency accumulation from the deterministic source set
    * (node % 20 = 0 — every 10th customer) over 3-hop-bounded BFS on
    * the thinned symmetric trade graph (the [[x10Kcore]] fixture
    * discipline). The oracle unrolls BOTH phases — three forward
    * levels carrying path counts, then the δ recurrence walked
    * deepest-first with per-term floor division — so the estimator's
    * mechanism is hash-checked end to end, truncation contract
    * included. */
  val x10Betweenness = QuerySpec("x10_betweenness",
    (s, d) => {
      val e = Graph.tradeEdges(
          T(s, d, "lineitem").filter(col("l_partkey") % 17 === 0),
          T(s, d, "orders"))
        .localCheckpoint(eager = false)
      val sources = e.select(col("src").as("node")).distinct()
        .filter(col("node") % 20 === 0)
      Graph.betweenness(e, sources, 3).orderBy(col("node"))
    },
    Some("""-- nonneg-div(2): path counts and ppm dependency masses >= 0
           |WITH e0 AS (
           |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
           |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE l_partkey % 17 = 0),
           |e AS MATERIALIZED (SELECT src, dst FROM e0
           |     UNION ALL SELECT dst, src FROM e0),
           |srcs AS (SELECT DISTINCT src AS v FROM e WHERE src % 20 = 0),
           |l0 AS MATERIALIZED (
           |  SELECT v AS s, v, CAST(1 AS BIGINT) AS sigma FROM srcs),
           |c1 AS (SELECT l.s, e.dst AS v,
           |    CAST(sum(l.sigma) AS BIGINT) AS sigma
           |  FROM l0 l JOIN e ON l.v = e.src GROUP BY 1, 2),
           |l1 AS MATERIALIZED (SELECT c.s, c.v, c.sigma FROM c1 c
           |  LEFT JOIN l0 p ON c.s = p.s AND c.v = p.v WHERE p.v IS NULL),
           |c2 AS (SELECT l.s, e.dst AS v,
           |    CAST(sum(l.sigma) AS BIGINT) AS sigma
           |  FROM l1 l JOIN e ON l.v = e.src GROUP BY 1, 2),
           |seen1 AS (SELECT s, v FROM l0 UNION ALL SELECT s, v FROM l1),
           |l2 AS MATERIALIZED (SELECT c.s, c.v, c.sigma FROM c2 c
           |  LEFT JOIN seen1 p ON c.s = p.s AND c.v = p.v
           |  WHERE p.v IS NULL),
           |c3 AS (SELECT l.s, e.dst AS v,
           |    CAST(sum(l.sigma) AS BIGINT) AS sigma
           |  FROM l2 l JOIN e ON l.v = e.src GROUP BY 1, 2),
           |seen2 AS (SELECT s, v FROM seen1 UNION ALL SELECT s, v FROM l2),
           |l3 AS MATERIALIZED (SELECT c.s, c.v, c.sigma FROM c3 c
           |  LEFT JOIN seen2 p ON c.s = p.s AND c.v = p.v
           |  WHERE p.v IS NULL),
           |d3 AS (SELECT s, v, sigma, CAST(0 AS BIGINT) AS delta FROM l3),
           |t3 AS (SELECT p.s, p.v,
           |    CAST(sum((p.sigma * (1000000 + d.delta)) // d.sigma)
           |      AS BIGINT) AS acc
           |  FROM l2 p JOIN e ON p.v = e.src
           |  JOIN d3 d ON d.s = p.s AND d.v = e.dst GROUP BY 1, 2),
           |d2 AS (SELECT l.s, l.v, l.sigma, coalesce(t.acc, 0) AS delta
           |  FROM l2 l LEFT JOIN t3 t ON l.s = t.s AND l.v = t.v),
           |t2 AS (SELECT p.s, p.v,
           |    CAST(sum((p.sigma * (1000000 + d.delta)) // d.sigma)
           |      AS BIGINT) AS acc
           |  FROM l1 p JOIN e ON p.v = e.src
           |  JOIN d2 d ON d.s = p.s AND d.v = e.dst GROUP BY 1, 2),
           |d1 AS (SELECT l.s, l.v, l.sigma, coalesce(t.acc, 0) AS delta
           |  FROM l1 l LEFT JOIN t2 t ON l.s = t.s AND l.v = t.v),
           |allv AS (SELECT v, delta FROM d1
           |  UNION ALL SELECT v, delta FROM d2
           |  UNION ALL SELECT v, delta FROM d3)
           |SELECT v AS node, CAST(sum(delta) AS BIGINT) AS bc_ppm
           |FROM allv GROUP BY 1 ORDER BY node""".stripMargin))


  /** X10v — NEIGHBORHOOD FUNCTION / HyperANF (round 16): per-node
    * md5-HLL ball sketches grown by register-max merges along edges —
    * N(h) for h = 0..3 on the thinned symmetric trade graph. The judged
    * artifact is (h, n_nodes, sum_est_fp): per-node estimates are
    * deterministic longs (exact-dyadic Z, pinned alpha text — the
    * a2_hll_md5 contract), and the per-hop total is an INTEGER sum, so
    * the whole curve hash-checks. The oracle replays the register
    * evolution hop by hop — the same nibble arithmetic text as the
    * judged HLL lanes, then three register-max merge rounds. */
  val x10Reach = QuerySpec("x10_reach",
    (s, d) => Graph.neighborhoodFunction(
        Graph.tradeEdges(
          T(s, d, "lineitem").filter(col("l_partkey") % 17 === 0),
          T(s, d, "orders")), 3)
      .orderBy(col("h")),
    Some {
      val rho =
        """CAST(1 + CASE WHEN ltrim(substr(h, 3, 13), '0') = '' THEN 52
          |    ELSE 4 * (13 - len(ltrim(substr(h, 3, 13), '0'))) +
          |      CASE WHEN substr(ltrim(substr(h, 3, 13), '0'), 1, 1) IN
          |          ('8','9','a','b','c','d','e','f') THEN 0
          |        WHEN substr(ltrim(substr(h, 3, 13), '0'), 1, 1) IN
          |          ('4','5','6','7') THEN 1
          |        WHEN substr(ltrim(substr(h, 3, 13), '0'), 1, 1) IN
          |          ('2','3') THEN 2
          |        ELSE 3 END END AS INT)""".stripMargin
      val merges = (1 to 3).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT v, bucket, CAST(max(reg) AS INT) AS reg FROM (
           |    SELECT v, bucket, reg FROM r${i - 1}
           |    UNION ALL
           |    SELECT e.src AS v, r.bucket, r.reg
           |    FROM e JOIN r${i - 1} r ON r.v = e.dst) t
           |  GROUP BY v, bucket),""".stripMargin
      }.mkString("\n")
      val ests = (0 to 3).map { i =>
        s"""z$i AS (SELECT v, 64.0 - count(*) + sum(pow(2.0, -reg)) AS z
           |  FROM r$i GROUP BY v),
           |s$i AS (SELECT CAST($i AS BIGINT) AS h,
           |    CAST(count(*) AS BIGINT) AS n_nodes,
           |    CAST(sum(CAST(floor(0.7213::DOUBLE / (1.0::DOUBLE +
           |      1.079::DOUBLE / 64) * 4096 / z * 1e4 + 0.5) AS BIGINT))
           |      AS BIGINT) AS sum_est_fp
           |  FROM z$i)""".stripMargin
      }.mkString(",\n")
      s"""-- nonneg-div(1): md5-derived unsigned hashes
         |WITH e0 AS (
         |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE l_partkey % 17 = 0),
         |e AS MATERIALIZED (SELECT src, dst FROM e0
         |     UNION ALL SELECT dst, src FROM e0),
         |nodes AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |p AS (SELECT v, md5(CAST(v AS VARCHAR)) AS h FROM nodes),
         |r0 AS MATERIALIZED (
         |  SELECT v, CAST(('0x' || substr(h, 1, 2))::BIGINT // 4 AS INT)
         |      AS bucket,
         |    $rho AS reg
         |  FROM p),
         |$merges
         |$ests
         |SELECT h, n_nodes, sum_est_fp FROM (
         |  SELECT * FROM s0 UNION ALL SELECT * FROM s1
         |  UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
         |ORDER BY h""".stripMargin
    })


  val x10Kcore = QuerySpec("x10_kcore",
    (s, d) => Graph.kCore(
        Graph.tradeEdgesDirected(
          T(s, d, "lineitem").filter(col("l_partkey") % 17 === 0),
          T(s, d, "orders")), 4, 5)
      .orderBy(col("node")),
    Some(x10KcoreText),
    bench = true)


  /** X10s — STRONGLY connected components (round 15): mutual-trade
    * rings in the directed trade-flow graph — customer→supplier on
    * supply, supplier→customer where goods came BACK (returnflag 'R'),
    * so SCCs are exactly the counterparty groups with circular flow.
    * The engine runs forward-backward min-label peeling (trim →
    * min-color → same-color backward reach, Graph.scc); the oracle
    * computes the ground truth DIRECTLY as a recursive mutual-
    * reachability closure — two entirely different algorithms, same
    * deterministic min-id labels, hash-checked. */
  val x10Scc = QuerySpec("x10_scc",
    (s, d) => Graph.scc(Graph.tradeFlowEdges(
        T(s, d, "lineitem"), T(s, d, "orders"), custMod = 10L,
        partMod = 3L))
      .orderBy(col("node")),
    Some("""WITH RECURSIVE
           |b AS (
           |  SELECT CAST(o_custkey * 2 AS BIGINT) AS c,
           |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS s, l_returnflag
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE o_custkey % 10 = 0 AND l_partkey % 3 = 0),
           |e AS (SELECT DISTINCT src, dst FROM (
           |        SELECT c AS src, s AS dst FROM b
           |        UNION ALL
           |        SELECT s, c FROM b WHERE l_returnflag = 'R')),
           |n AS (SELECT DISTINCT node FROM (
           |        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
           |reach AS (
           |  SELECT src AS a, dst AS rb FROM e
           |  UNION
           |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.rb),
           |m AS (
           |  SELECT r1.a AS node, min(r1.rb) AS scc_min
           |  FROM reach r1 JOIN reach r2 ON r1.a = r2.rb AND r1.rb = r2.a
           |  GROUP BY r1.a)
           |SELECT n.node, coalesce(m.scc_min, n.node) AS scc_id
           |FROM n LEFT JOIN m ON m.node = n.node
           |ORDER BY n.node""".stripMargin))


  /** X10i — link prediction over the co-supply graph (round 15):
    * non-adjacent supplier pairs scored by shared neighbors — cn =
    * common-neighbor count, jaccard_ppm = ⌊cn·10⁶/|union|⌋, both exact
    * integers. Wedge enumeration with the center-degree cap applied
    * BEFORE the self-join (the capBuckets discipline — a mega-hub's
    * wedges are noise and d² cost); the oracle replays symmetrize →
    * cap → wedge join → count → anti-join → degree arithmetic. */
  val x10Linkpred = QuerySpec("x10_linkpred",
    (s, d) => Graph.linkPredict(
        Graph.coSupplyEdges(T(s, d, "lineitem"), 41L),
        maxDeg = 1000, minCommon = 2L)
      .orderBy(col("n1"), col("n2")),
    Some("""-- nonneg-div(1): common-neighbor counts
           |WITH sp AS (
           |  SELECT DISTINCT l_partkey AS p, CAST(l_suppkey AS BIGINT) AS s
           |  FROM lineitem WHERE l_partkey % 41 = 0),
           |ok AS (SELECT p FROM sp GROUP BY p HAVING count(*) <= 1000),
           |spb AS (SELECT sp.p, sp.s FROM sp JOIN ok USING (p)),
           |e AS (SELECT DISTINCT x.s AS a, y.s AS b
           |      FROM spb x JOIN spb y ON x.p = y.p AND x.s < y.s),
           |und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
           |deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS dg
           |        FROM und GROUP BY a),
           |ctr AS (SELECT node FROM deg WHERE dg <= 1000),
           |adj AS (SELECT u.a AS ctr, u.b AS leaf
           |        FROM und u JOIN ctr c ON u.a = c.node),
           |wdg AS (SELECT x.leaf AS n1, y.leaf AS n2
           |        FROM adj x JOIN adj y
           |          ON x.ctr = y.ctr AND x.leaf < y.leaf),
           |cnt AS (SELECT n1, n2, CAST(count(*) AS BIGINT) AS cn
           |        FROM wdg GROUP BY n1, n2 HAVING count(*) >= 2),
           |nonadj AS (SELECT cnt.n1, cnt.n2, cnt.cn FROM cnt
           |           LEFT JOIN e ON e.a = cnt.n1 AND e.b = cnt.n2
           |           WHERE e.a IS NULL)
           |SELECT n1, n2, cn,
           |  CAST(cn * 1000000 // (d1.dg + d2.dg - cn) AS BIGINT)
           |    AS jaccard_ppm
           |FROM nonadj
           |JOIN deg d1 ON d1.node = n1 JOIN deg d2 ON d2.node = n2
           |ORDER BY n1, n2""".stripMargin))


  val x10Triangles = QuerySpec("x10_triangles",
    (s, d) => Graph.triangles(Graph.coSupplyEdges(T(s, d, "lineitem"), 499L))
      .orderBy(col("node")),
    Some("""WITH sp AS (
           |  SELECT DISTINCT l_partkey AS p, CAST(l_suppkey AS BIGINT) AS s
           |  FROM lineitem WHERE l_partkey % 499 = 0),
           |ok AS (SELECT p FROM sp GROUP BY p HAVING count(*) <= 1000),
           |spb AS (SELECT sp.p, sp.s FROM sp JOIN ok USING (p)),
           |e AS (SELECT DISTINCT x.s AS a, y.s AS b
           |      FROM spb x JOIN spb y ON x.p = y.p AND x.s < y.s),
           |t AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
           |      FROM e e1 JOIN e e2 ON e2.a = e1.b
           |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
           |c AS (SELECT u AS node FROM t
           |      UNION ALL SELECT v FROM t
           |      UNION ALL SELECT w FROM t)
           |SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
           |FROM c GROUP BY node ORDER BY node""".stripMargin),
    bench = true)


  /** X10w — k-TRUSS decomposition (round 16): 3 synchronous edge peels
    * at k=4 (support ≥ 2) over the co-supply graph — the edge-level
    * cohesion filter k-core cannot express (a wedge-rich triangle-poor
    * hub survives any k-core and evaporates here). The oracle unrolls
    * the identical 3 rounds — per-edge common-neighbor support via the
    * symmetric adjacency self-join, then the ≥ k−2 filter — plus the
    * final-support computation over the surviving set, so the cascade
    * mechanism itself is hash-checked (the x10_kcore discipline). */
  val x10Ktruss = QuerySpec("x10_ktruss",
    (s, d) => Graph.kTruss(Graph.coSupplyEdges(T(s, d, "lineitem"), 499L),
        4, 3)
      .orderBy(col("a"), col("b")),
    Some {
      val rounds = (0 to 3).map { i =>
        val nxt = if (i < 3)
          s""",\ne${i + 1} AS MATERIALIZED (SELECT a, b FROM s$i
             |  WHERE sup >= 2)""".stripMargin
        else ""
        s"""adj$i AS (SELECT a, b FROM e$i
           |  UNION ALL SELECT b AS a, a AS b FROM e$i),
           |s$i AS MATERIALIZED (
           |  SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS sup
           |  FROM e$i e JOIN adj$i j1 ON j1.a = e.a
           |  JOIN adj$i j2 ON j2.a = e.b AND j2.b = j1.b
           |  GROUP BY e.a, e.b)$nxt""".stripMargin
      }.mkString(",\n")
      s"""WITH sp AS (
         |  SELECT DISTINCT l_partkey AS p, CAST(l_suppkey AS BIGINT) AS s
         |  FROM lineitem WHERE l_partkey % 499 = 0),
         |ok AS (SELECT p FROM sp GROUP BY p HAVING count(*) <= 1000),
         |spb AS (SELECT sp.p, sp.s FROM sp JOIN ok USING (p)),
         |e0 AS MATERIALIZED (SELECT DISTINCT x.s AS a, y.s AS b
         |      FROM spb x JOIN spb y ON x.p = y.p AND x.s < y.s),
         |$rounds
         |SELECT e.a, e.b, CAST(coalesce(s.sup, 0) AS BIGINT) AS support
         |FROM e3 e LEFT JOIN s3 s ON e.a = s.a AND e.b = s.b
         |ORDER BY e.a, e.b""".stripMargin
    })


  /** X10o — local clustering coefficient (ops/Graph.clusteringCoeff):
    * per node, the ppm fraction of its neighbor pairs that are
    * themselves connected, over the co-supply graph — the hub-quality
    * signal beside raw triangle counts (same oriented wedge core). */
  val x10ClusteringCoeff = QuerySpec("x10_clustering_coeff",
    (s, d) => Graph.clusteringCoeff(
        Graph.coSupplyEdges(T(s, d, "lineitem"), 499L))
      .orderBy(col("node")),
    Some("""-- nonneg-div(1): triangle counts and degree products
           |WITH sp AS (
           |  SELECT DISTINCT l_partkey AS p, CAST(l_suppkey AS BIGINT) AS s
           |  FROM lineitem WHERE l_partkey % 499 = 0),
           |ok AS (SELECT p FROM sp GROUP BY p HAVING count(*) <= 1000),
           |spb AS (SELECT sp.p, sp.s FROM sp JOIN ok USING (p)),
           |e AS (SELECT DISTINCT x.s AS a, y.s AS b
           |      FROM spb x JOIN spb y ON x.p = y.p AND x.s < y.s),
           |d AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
           |    SELECT a AS v FROM e UNION ALL SELECT b FROM e)
           |  GROUP BY v),
           |t AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
           |      FROM e e1 JOIN e e2 ON e2.a = e1.b
           |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
           |c AS (SELECT u AS node FROM t
           |      UNION ALL SELECT v FROM t
           |      UNION ALL SELECT w FROM t),
           |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt
           |  FROM c GROUP BY node)
           |SELECT d.v AS node, d.dg,
           |  CAST(coalesce(tc.tri_cnt, 0) AS BIGINT) AS tri_cnt,
           |  CASE WHEN d.dg >= 2 THEN
           |    coalesce(tc.tri_cnt, 0) * 2000000 // (d.dg * (d.dg - 1))
           |  END AS cc_ppm
           |FROM d LEFT JOIN tc ON tc.node = d.v
           |ORDER BY node""".stripMargin),
    bench = false)


  /** X10p — degree assortativity (ops/Graph.assortativity): Pearson of
    * endpoint degrees over the symmetrized co-supply edge list — one
    * exact-ppm number; negative = hubs link to leaves. Identical
    * marginals kill the sqrt; the oracle replays the floor division
    * with the explicit floor-mod correction (numerator can be
    * negative; DuckDB's bare `//` truncates). */
  val x10Assortativity = QuerySpec("x10_assortativity",
    (s, d) => Graph.assortativity(
        Graph.coSupplyEdges(T(s, d, "lineitem"), 499L)),
    Some("""WITH sp AS (
           |  SELECT DISTINCT l_partkey AS p, CAST(l_suppkey AS BIGINT) AS s
           |  FROM lineitem WHERE l_partkey % 499 = 0),
           |ok AS (SELECT p FROM sp GROUP BY p HAVING count(*) <= 1000),
           |spb AS (SELECT sp.p, sp.s FROM sp JOIN ok USING (p)),
           |e AS (SELECT DISTINCT x.s AS a, y.s AS b
           |      FROM spb x JOIN spb y ON x.p = y.p AND x.s < y.s),
           |b2 AS (SELECT a AS s, b AS t FROM e
           |       UNION ALL SELECT b, a FROM e),
           |d AS (SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
           |    SELECT a AS v FROM e UNION ALL SELECT b FROM e)
           |  GROUP BY v),
           |j AS (SELECT dx.dg AS dx, dy.dg AS dy FROM b2
           |  JOIN d dx ON dx.v = b2.s JOIN d dy ON dy.v = b2.t),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n_endpoints,
           |    CAST(sum(dx) AS HUGEINT) AS sx,
           |    CAST(sum(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy,
           |    CAST(sum(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx
           |  FROM j),
           |f AS (SELECT n_endpoints,
           |    CAST(n_endpoints AS HUGEINT) * sxy - sx * sx AS num,
           |    CAST(n_endpoints AS HUGEINT) * sxx - sx * sx AS den
           |  FROM m)
           |SELECT n_endpoints,
           |  CASE WHEN den > 0 THEN CAST((1000000 * num -
           |    ((1000000 * num % den) + den) % den) // den AS BIGINT)
           |  END AS assort_ppm
           |FROM f""".stripMargin))


  /** X10q — HITS hubs/authorities (ops/Graph.hits): 2 max-normalized
    * rounds over the customer→supplier trade digraph — buyers ranked by
    * the quality of the suppliers they buy from, and vice versa. Every
    * intermediate is an exact BIGINT (integer max-rescale instead of L2
    * normalization), so the oracle unrolls both rounds verbatim. */
  val x10Hits = QuerySpec("x10_hits",
    (s, d) => Graph.hits(
        Graph.tradeEdgesDirected(T(s, d, "lineitem"), T(s, d, "orders")), 2)
      .orderBy(col("node")),
    Some {
      val rounds = (1 to 2).map { i =>
        val prevH = if (i == 1) "h0" else s"h${i - 1}"
        s"""a${i}r AS (SELECT e.dst AS node, CAST(sum(p.h) AS BIGINT) AS a
           |  FROM e JOIN $prevH p ON p.node = e.src GROUP BY 1),
           |a$i AS (SELECT node, CAST(CAST(a AS HUGEINT) * 1000000 //
           |    (SELECT max(a) FROM a${i}r) AS BIGINT) AS a FROM a${i}r),
           |h${i}r AS (SELECT e.src AS node, CAST(sum(q.a) AS BIGINT) AS h
           |  FROM e JOIN a$i q ON q.node = e.dst GROUP BY 1),
           |h$i AS (SELECT node, CAST(CAST(h AS HUGEINT) * 1000000 //
           |    (SELECT max(h) FROM h${i}r) AS BIGINT) AS h FROM h${i}r)"""
          .stripMargin
      }.mkString(",\n")
      s"""-- nonneg-div(4): max-normalized HITS scores stay >= 0
         |WITH e AS (
         |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |h0 AS (SELECT DISTINCT src AS node,
         |    CAST(1000000 AS BIGINT) AS h FROM e),
         |$rounds
         |SELECT coalesce(h2.node, a2.node) AS node,
         |  coalesce(h2.h, 0) AS hub_ppm,
         |  coalesce(a2.a, 0) AS auth_ppm
         |FROM h2 FULL OUTER JOIN a2 ON a2.node = h2.node
         |ORDER BY node""".stripMargin
    })


  /** X10f — multi-source BFS hop distance (ops/Graph.bfsHops) on the
    * symmetrized co-supply graph: min hops from every supplier whose id
    * ≡ 0 (mod 7), within 4 hops. Frontier-join propagation — each round
    * joins only the just-discovered rows against the edge list; the
    * oracle is the bounded recursive CTE over the identical edges. */
  val x10Bfs = QuerySpec("x10_bfs",
    (s, d) => {
      val e0 = Graph.coSupplyEdges(T(s, d, "lineitem"), 499L)
      // one materialization feeds both the source derivation and every
      // BFS round — the edge subtree is never re-derived
      val und = e0.unionAll(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(eager = false)
      val sources = und.select(col("src").as("node")).distinct()
        .filter(col("node") % 7 === 0)
      Graph.bfsHops(und, sources, 4).orderBy(col("node"))
    },
    Some("""WITH RECURSIVE sp AS (
           |  SELECT DISTINCT l_partkey AS p, CAST(l_suppkey AS BIGINT) AS s
           |  FROM lineitem WHERE l_partkey % 499 = 0),
           |ok AS (SELECT p FROM sp GROUP BY p HAVING count(*) <= 1000),
           |spb AS (SELECT sp.p, sp.s FROM sp JOIN ok USING (p)),
           |e0 AS (SELECT DISTINCT x.s AS a, y.s AS b
           |       FROM spb x JOIN spb y ON x.p = y.p AND x.s < y.s),
           |e AS (SELECT a AS src, b AS dst FROM e0
           |      UNION ALL SELECT b, a FROM e0),
           |srcs AS (SELECT DISTINCT src AS node FROM e WHERE src % 7 = 0),
           |b(node, hops) AS (
           |  SELECT node, CAST(0 AS BIGINT) FROM srcs
           |  UNION
           |  SELECT e.dst, b.hops + 1 FROM b JOIN e ON e.src = b.node
           |  WHERE b.hops < 4)
           |SELECT node, CAST(min(hops) AS BIGINT) AS hops
           |FROM b GROUP BY node ORDER BY node""".stripMargin),
    bench = true)


  /** X10p — personalized PageRank (ops/Graph.personalizedPageRank):
    * proximity to the mod-100 customer seed set on the symmetrized
    * trade graph — teleport mass lands only on S, so scores rank
    * "nearness to these customers", not global centrality. Oracle
    * unrolls the identical 3 integer-ppm iterations. */
  val x10Ppr = QuerySpec("x10_ppr",
    (s, d) => {
      // the trade-edge subtree (lineitem ⋈ orders, distinct) feeds three
      // consumers (degrees, the annotated join, the source derivation) —
      // materialize it once instead of three fact scans
      val edges = Graph.tradeEdges(T(s, d, "lineitem"), T(s, d, "orders"))
        .localCheckpoint(eager = false)
      val sources = edges.select(col("src").as("node")).distinct()
        .filter(col("node") % 100 === 0)
      Graph.personalizedPageRank(edges, sources, 3)
        .orderBy(col("node"))
    },
    Some("""-- nonneg-div(6): ppm rank mass >= 0 throughout
           |WITH e0 AS (
           |  SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
           |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |e AS (SELECT src, dst FROM e0
           |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
           |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
           |        FROM e GROUP BY src),
           |nodes AS (SELECT DISTINCT x AS node FROM
           |  (SELECT src AS x FROM e UNION ALL SELECT dst FROM e) u),
           |base AS (SELECT node, CAST(CASE WHEN node % 100 = 0
           |    THEN 150000 ELSE 0 END AS BIGINT) AS b FROM nodes),
           |r0 AS (SELECT node, CAST(CASE WHEN b > 0 THEN 1000000
           |    ELSE 0 END AS BIGINT) AS score FROM base),
           |c1 AS (SELECT e.dst AS node,
           |    CAST(sum(r.score // d.outdeg) AS BIGINT) AS c
           |  FROM e JOIN r0 r ON e.src = r.node
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |r1 AS (SELECT b.node,
           |    CAST(b.b + (850 * coalesce(c.c, 0)) // 1000 AS BIGINT)
           |      AS score
           |  FROM base b LEFT JOIN c1 c USING (node)),
           |c2 AS (SELECT e.dst AS node,
           |    CAST(sum(r.score // d.outdeg) AS BIGINT) AS c
           |  FROM e JOIN r1 r ON e.src = r.node
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |r2 AS (SELECT b.node,
           |    CAST(b.b + (850 * coalesce(c.c, 0)) // 1000 AS BIGINT)
           |      AS score
           |  FROM base b LEFT JOIN c2 c USING (node)),
           |c3 AS (SELECT e.dst AS node,
           |    CAST(sum(r.score // d.outdeg) AS BIGINT) AS c
           |  FROM e JOIN r2 r ON e.src = r.node
           |  JOIN deg d ON d.src = e.src GROUP BY e.dst),
           |r3 AS (SELECT b.node,
           |    CAST(b.b + (850 * coalesce(c.c, 0)) // 1000 AS BIGINT)
           |      AS score
           |  FROM base b LEFT JOIN c3 c USING (node))
           |SELECT node, score FROM r3 ORDER BY node""".stripMargin),
    bench = true)


  val x10Lpa = QuerySpec("x10_lpa",
    (s, d) => Graph.labelPropagation(
        Graph.tradeEdges(T(s, d, "lineitem"), T(s, d, "orders")), 3)
      .orderBy(col("node")),
    Some(s"""WITH $lpaOracleCtes
            |SELECT node, label FROM l3 ORDER BY node""".stripMargin),
    bench = true)


  /** X10l — modularity of the LPA partition (ops/Graph.modularity):
    * exact-rational Newman Q in floored ppm over the same trade graph
    * and the same 3-round labeling — the "did LPA find structure"
    * score, judged end to end (the oracle re-unrolls LPA via the SHARED
    * CTE text, then replays the HUGEINT modularity arithmetic). */
  val x10Modularity = QuerySpec("x10_modularity",
    (s, d) => {
      val edges = Graph.tradeEdges(T(s, d, "lineitem"), T(s, d, "orders"))
        // read by LPA (per round) AND by modularity (canonicalize +
        // degree mass) — one materialization, not recurring fact scans
        .localCheckpoint(eager = false)
      Graph.modularity(edges, Graph.labelPropagation(edges, 3))
    },
    Some(s"""WITH $lpaOracleCtes,
            |u2 AS (SELECT DISTINCT least(src, dst) AS a,
            |    greatest(src, dst) AS b FROM und WHERE src <> dst),
            |le AS (SELECT u2.a, u2.b, x.label AS la, y.label AS lb
            |  FROM u2 JOIN l3 x ON x.node = u2.a
            |  JOIN l3 y ON y.node = u2.b),
            |mm AS (SELECT CAST(count(*) AS HUGEINT) AS m,
            |    CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS HUGEINT)
            |      AS e_in
            |  FROM le),
            |dm AS (SELECT label, CAST(count(*) AS HUGEINT) AS d_c
            |  FROM (SELECT la AS label FROM le
            |        UNION ALL SELECT lb FROM le)
            |  GROUP BY label),
            |cm AS (SELECT CAST(count(*) AS BIGINT) AS n_comms,
            |    CAST(sum(d_c * d_c) AS HUGEINT) AS d_sq FROM dm),
            |f AS (SELECT m, e_in, n_comms, d_sq,
            |    1000000 * (4 * m * e_in - d_sq) AS qn, 4 * m * m AS qd
            |  FROM mm, cm)
            |SELECT CAST(m AS BIGINT) AS n_edges,
            |  n_comms AS n_communities, CAST(e_in AS BIGINT) AS intra_edges,
            |  CAST((qn - ((qn % qd) + qd) % qd) // qd AS BIGINT) AS q_ppm
            |FROM f""".stripMargin))


  /** X10m — bounded-hop weighted shortest paths (ops/Graph.sssp): 4
    * Bellman–Ford relaxation rounds over the trade-flow digraph with
    * min-quantity edge weights, seeded at the mod-100 customers (the
    * x10_ppr seed set) — exact integer distances, oracle unrolls every
    * relaxation. */
  val x10Sssp = QuerySpec("x10_sssp",
    (s, d) => {
      val base = T(s, d, "lineitem")
        .join(T(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("c"),
          (col("l_suppkey") * 2 + 1).cast("long").as("s"),
          floor(col("l_quantity")).cast("long").as("q"),
          col("l_returnflag"))
        .localCheckpoint(eager = false)
      val fwd = base.groupBy(col("c").as("src"), col("s").as("dst"))
        .agg(min(col("q")).as("w"))
      val ret = base.filter(col("l_returnflag") === "R")
        .groupBy(col("s").as("src"), col("c").as("dst"))
        .agg(min(col("q")).as("w"))
      val seeds = T(s, d, "customer")
        .filter(col("c_custkey") % 100 === 0)
        .select((col("c_custkey") * 2).cast("long").as("node"))
      Graph.sssp(fwd.unionAll(ret), seeds, 4).orderBy(col("node"))
    },
    Some {
      val rounds = (1 to 4).map { i =>
        s"""d$i AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
           |    SELECT node, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT e.dst AS node, d.dist + e.w AS dist
           |    FROM d${i - 1} d JOIN e ON e.src = d.node)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH base AS (
         |  SELECT CAST(o_custkey * 2 AS BIGINT) AS c,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS s,
         |    CAST(floor(l_quantity) AS BIGINT) AS q, l_returnflag
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |fwd AS (SELECT c AS src, s AS dst, CAST(min(q) AS BIGINT) AS w
         |  FROM base GROUP BY 1, 2),
         |ret AS (SELECT s AS src, c AS dst, CAST(min(q) AS BIGINT) AS w
         |  FROM base WHERE l_returnflag = 'R' GROUP BY 1, 2),
         |e AS (SELECT * FROM fwd UNION ALL SELECT * FROM ret),
         |d0 AS (SELECT DISTINCT CAST(c_custkey * 2 AS BIGINT) AS node,
         |    CAST(0 AS BIGINT) AS dist
         |  FROM customer WHERE c_custkey % 100 = 0),
         |$rounds
         |SELECT node, dist FROM d4 ORDER BY node""".stripMargin
    },
    bench = true)
}
