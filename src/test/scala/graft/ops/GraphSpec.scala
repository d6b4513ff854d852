package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Star with hub 1 (symmetrized): the hub must out-rank every leaf,
    * and leaves are symmetric so their scores are identical. */
  private def star(nLeaves: Int) = {
    val fwd = (2 to nLeaves + 1).map(l => (1L, l.toLong))
    (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
  }

  test("X10b pagerank: hub dominates, leaves tie, scores are bounded and deterministic") {
    val r = Graph.pageRank(star(8), 3)
      .as[(Long, Long)].collect().toMap
    assert(r.size == 9)
    val hub = r(1L)
    val leaves = (2L to 9L).map(r)
    assert(leaves.distinct.size == 1, "symmetric leaves must tie")
    assert(hub > leaves.head * 4,
      s"hub $hub should dominate leaf ${leaves.head}")
    // every score carries at least the undamped base mass
    assert(r.values.forall(_ >= 150000L))
    // exact-integer arithmetic: a second run is bit-identical
    val r2 = Graph.pageRank(star(8), 3).as[(Long, Long)].collect().toMap
    assert(r2 == r)
  }

  test("X10b trade-graph edges: disjoint id spaces, symmetrized") {
    val li = Seq((10L, 3L)).toDF("l_orderkey", "l_suppkey")
    val ord = Seq((10L, 7L)).toDF("o_orderkey", "o_custkey")
    val e = Graph.tradeEdges(li, ord).as[(Long, Long)].collect().toSet
    // customer 7 -> node 14 (even), supplier 3 -> node 7 (odd), both ways
    assert(e == Set((14L, 7L), (7L, 14L)))
  }
}
