package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round 18: the nearest-centroid argmin/argmax became a per-row FOLD
  * over the broadcast centroid array (narrow, shuffle-free). These
  * tests pin the fold against an inline copy of the window-rank
  * formulation it replaced, on inputs chosen to exercise the ordering
  * edge cases the real corpus never hits: exact score ties (duplicate
  * centroids under distinct ids), duplicate corpus vectors, and the
  * degenerate zero vector whose cosine is NaN everywhere. */
class AssignFoldSpec extends SparkSpec {

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  private def corpus(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  /** The pre-round-18 ivfAssignWith: crossJoin + window rank. */
  private def windowAssign(c: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    def withNorm(df: DataFrame, v: String, as: String) =
      df.withColumn(as, sqrt(expr(s"graft_dot($v, $v)")))
    val cc = broadcast(withNorm(cents.select(col("cid"), col("cv")), "cv", "cn"))
    val scored = withNorm(c.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("qv")),
        "qv", "qn")
      .crossJoin(cc)
    scored.withColumn("csim",
        round(expr("graft_dot(qv, cv)") / (col("qn") * col("cn")), 6))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("csim").desc, col("cid"))))
      .filter(col("crnk") === 1)
      .select(col("vec_id"), col("cid"))
  }

  private def cents(c: DataFrame, ids: Long*): DataFrame =
    c.filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("cid"),
        expr("transform(embedding, x -> cast(x as double))").as("cv"))

  private def picks(df: DataFrame): Seq[(Long, Long)] =
    df.select(col("vec_id").cast("long"), col("cid").cast("long"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1))).sorted

  test("fold assignment == window assignment with duplicate centroids " +
      "(exact tie -> lowest cid) and duplicate corpus vectors") {
    // no zero vector here: a zero NORM throws ANSI DIVIDE_BY_ZERO in
    // BOTH formulations (the engine-wide cosine contract, unchanged by
    // the fold) — non-degenerate input is a caller precondition
    val c = corpus(
      0L -> vec(1, 0, 0), 1L -> vec(1, 0, 0), // duplicate centroids: tie
      2L -> vec(0, 1, 0),
      10L -> vec(0.9f, 0.1f, 0), 11L -> vec(0.9f, 0.1f, 0), // dup corpus
      12L -> vec(0, 0.5, 0))
    val cn = cents(c, 0L, 1L, 2L)
    val fold = picks(Similarity.ivfAssignWith(c, cn))
    val win = picks(windowAssign(c, cn))
    assert(fold == win)
    // the tie lands on the LOWEST cid in both
    assert(fold.toMap.apply(10L) == 0L)
  }

  test("pq encode fold == window form on tied code distances") {
    val c = corpus(
      0L -> vec(1, 0, 1, 0), 1L -> vec(1, 0, 1, 0), // duplicate codes
      2L -> vec(0, 1, 0, 1),
      10L -> vec(0.6, 0.4, 0.6, 0.4))
    val enc = Similarity.pqEncode(c, dim = 4, m = 2, ks = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted
    // subvectors of vec 10 are equidistant from codes 0 and 1 -> code 0
    assert(enc.filter(_._1 == 10L).map(_._3).forall(_ == 0))
    // every (vec, sub) present exactly once
    assert(enc.map(t => (t._1, t._2)).distinct.length == enc.length)
  }

  test("empty centroid frame -> empty assignment, not sentinel cells " +
      "(the global collect_list still emits one empty-array row)") {
    val c = corpus(10L -> vec(1, 0, 0), 11L -> vec(0, 1, 0))
    val none = cents(c, 99L) // matches nothing
    assert(Similarity.ivfAssignWith(c, none).count() == 0)
    assert(Clustering.assign(
      c.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v")),
      none.select(col("cid"), col("cv"))).count() == 0)
  }

  test("ragged vector (null score everywhere) lands on the LOWEST cid " +
      "like the window's NULLS LAST ordering, never the fold seed") {
    import spark.implicits._
    val c = Seq(
      (0L, Seq(1f, 0f, 0f)), (1L, Seq(0f, 1f, 0f)),
      (10L, Seq(0.5f, 0.5f, 0f)),
      (11L, Seq(1f, 0f))) // wrong dimension: graft_dot null vs every cell
      .toDF("vec_id", "embedding")
    val cn = cents(c, 0L, 1L)
    val picks = Similarity.ivfAssignWith(c, cn)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(picks(11L) == 0L, s"ragged row must fall to cid 0, got $picks")
    assert(picks(10L) == 0L) // real rows unaffected (tie -> lowest)
  }

  test("MIN direction, mixed null/real scores: a ragged centroid LOSES " +
      "(intentional divergence from the replaced ASC NULLS FIRST window, " +
      "where the uncomputable distance won the rank)") {
    import spark.implicits._
    // cid 0 is ragged (2-dim) against the 3-dim corpus -> graft_l2sq
    // null; cid 5 is computable. The fold must pick 5 even though 0 is
    // the smaller id — nulls lose in BOTH directions.
    val cn = Seq((0L, Seq(1.0, 0.0)), (5L, Seq(9.0, 9.0, 9.0)))
      .toDF("cid", "cv")
    val base = Seq((10L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "v")
    val got = Clustering.assign(base, cn)
      .select(col("vec_id"), col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(10L) == 5L,
      s"ragged centroid must lose to a computable one, got $got")
    // fully-ragged row: every distance null -> smallest cid, NaN dist2
    // (the loud-NaN contract in the assign scaladoc)
    val ragged = Seq((11L, Seq(1.0))).toDF("vec_id", "v")
    val r = Clustering.assign(ragged, cn)
      .select(col("cid"), col("dist2")).collect().head
    assert(r.getLong(0) == 0L && r.getDouble(1).isNaN)
  }

  test("MIN direction, pq encode: a ragged codebook entry LOSES to a " +
      "computable one (nulls-lose contract on the encode path)") {
    import spark.implicits._
    // sub 0: code 0 ragged (width 1 vs subvector width 2), code 7 real
    val cb = Seq((0, 0, Seq(1.0)), (0, 7, Seq(9.0, 9.0)),
        (1, 0, Seq(0.0, 0.0)), (1, 7, Seq(9.0, 9.0)))
      .toDF("sub", "code", "cv")
    val c = corpus(10L -> vec(0, 0, 0, 0))
    val enc = Similarity.pqEncodeWith(c, dim = 4, m = 2, cb)
      .collect().map(r => (r.getInt(1), r.getInt(2))).toMap
    assert(enc(0) == 7, s"ragged code must lose on sub 0, got $enc")
    assert(enc(1) == 0) // both computable on sub 1 -> true argmin
  }

  test("clustering assign fold matches argmin-with-cid-tie-break and " +
      "keeps corpus columns") {
    val c = corpus(
      0L -> vec(0, 0), 1L -> vec(0, 0), 2L -> vec(4, 4),
      10L -> vec(1, 1), 11L -> vec(3, 3))
    val assigned = Clustering.kmeans(c, k = 3, iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // vec 10 ties centroids 0 and 1 at d2=2 -> lowest cid 0
    assert(assigned(10L) == 0L)
    assert(assigned(11L) == 2L)
  }
}
