package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf("sf0.001"))

  test("X3e kmeans: deterministic across runs, every vector assigned exactly once") {
    val a = Clustering.kmeans(emb, 4, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    val b = Clustering.kmeans(emb, 4, 2)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(a == b) // deterministic seeds + tie-breaks: no RNG anywhere
    assert(a.size == emb.count())
    assert(a.values.toSet.subsetOf((0L until 4L).toSet))
  }

  test("X3e kmeans: Lloyd inertia never increases with more iterations") {
    val inertias = (0 to 3).map(i =>
      Clustering.inertia(Clustering.kmeans(emb, 8, i)))
    info(s"inertia by iteration: ${inertias.mkString(", ")}")
    assert(inertias.sliding(2).forall { case Seq(prev, next) =>
      next <= prev + 1e-9 })
    // and the iterations actually move: round 1 must strictly improve on
    // the raw seed assignment for this corpus
    assert(inertias(1) < inertias(0))
  }

  test("X3e kmeans: identical vectors land in the same cluster; empty clusters keep centroids") {
    val planted = Seq(
      (0L, Array(10.0f, 0.0f)), (1L, Array(-10.0f, 0.0f)),
      (2L, Array(10.0f, 0.1f)), (3L, Array(10.0f, 0.1f)), // identical pair
      (4L, Array(-10.0f, 0.2f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeans(planted, 2, 3)
      .select("vec_id", "cid").as[(Long, Long)].collect().toMap
    assert(out(2L) == out(3L)) // identical vectors: same argmin, same cluster
    assert(out(0L) == out(2L)) // near (10, *) mass clusters together
    assert(out(1L) == out(4L)) // near (-10, *) mass clusters together
    assert(out(0L) != out(1L)) // the two modes separate
  }

  test("X5e clusterSample keeps at most perCluster vectors, nearest-first") {
    val sampled = Clustering.clusterSample(emb, 8, 1, perCluster = 5)
      .select("cid", "rnk").as[(Long, Int)].collect()
    assert(sampled.nonEmpty)
    assert(sampled.forall(_._2 <= 5))
    val perCid = sampled.groupBy(_._1).view.mapValues(_.length)
    assert(perCid.values.forall(_ <= 5))
  }
}
