package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round 19: the codegen'd argbest kernels must walk EXACTLY the total
  * order of the interpreted ArgFold aggregate() they replace — same
  * sentinel discipline, same HALF_UP rounding, same tie direction. The
  * sweep compares both formulations cell-for-cell on adversarial
  * inputs: exact score ties, NaN scores (zero-norm cosine), ±Infinity,
  * -0.0 vs 0.0, ragged cells (null kernel score), and random vectors. */
class ArgBestCellSpec extends SparkSpec {

  import spark.implicits._

  /** The replaced fold, verbatim ArgFold.best text (max direction over
    * (cid, cv, cn) cells, cosine score). */
  private val foldMaxSql =
    """aggregate(_cents,
      |  struct(cast('-Infinity' as double) as s,
      |         cast(-9223372036854775807 as bigint) as i),
      |  (acc, c) -> greatest(acc,
      |    struct(coalesce(round(graft_dot(qv, c.cv) / (qn * c.cn), 6),
      |             cast('-Infinity' as double)) as s,
      |           -cast(c.cid as bigint) as i)))""".stripMargin

  private val foldMinSql =
    """aggregate(_codes,
      |  struct(cast('NaN' as double) as s,
      |         cast(9223372036854775807 as bigint) as i),
      |  (acc, c) -> least(acc,
      |    struct(coalesce(round(graft_l2sq(sv, c.cv), 6),
      |             cast('NaN' as double)) as s,
      |           cast(c.code as bigint) as i)))""".stripMargin

  private def maxCase(qv: Seq[Double],
      cents: Seq[(Long, Seq[Double])]): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((qv, cents)).toDF("qv", "rawc")
      .withColumn("qn", sqrt(expr("graft_dot(qv, qv)")))
      .withColumn("_cents", expr(
        "transform(rawc, c -> struct(c._1 as cid, c._2 as cv, " +
          "sqrt(coalesce(aggregate(c._2, cast(0 as double), " +
          "(a, x) -> a + x * x), cast(0 as double))) as cn))"))
    val r = df.select(
      expr(foldMaxSql).as("fold"),
      expr("graft_argmax_cos(qv, qn, _cents)").as("kern")).collect().head
    val fold = r.getStruct(0); val kern = r.getStruct(1)
    // the fold negates ids; the kernel reports them directly
    assert(-fold.getLong(1) == kern.getLong(1),
      s"id mismatch for qv=$qv cents=$cents: fold=${-fold.getLong(1)} " +
        s"kern=${kern.getLong(1)}")
    val fs = fold.getDouble(0); val ks = kern.getDouble(0)
    assert(java.lang.Double.compare(fs, ks) == 0,
      s"score mismatch for qv=$qv cents=$cents: fold=$fs kern=$ks")
  }

  private def minCase(sv: Seq[Double], dp: Int,
      codes: Seq[(Int, Seq[Double])]): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val foldSql = if (dp == 6) foldMinSql
      else foldMinSql.replace("round(graft_l2sq(sv, c.cv), 6)",
        "graft_l2sq(sv, c.cv)")
    val df = Seq((sv, codes)).toDF("sv", "rawc")
      .withColumn("_codes", expr(
        "transform(rawc, c -> struct(c._1 as code, c._2 as cv))"))
    val r = df.select(
      expr(foldSql).as("fold"),
      expr(s"graft_argmin_l2(sv, _codes, $dp)").as("kern")).collect().head
    val fold = r.getStruct(0); val kern = r.getStruct(1)
    assert(fold.getLong(1) == kern.getLong(1),
      s"id mismatch for sv=$sv codes=$codes: fold=${fold.getLong(1)} " +
        s"kern=${kern.getLong(1)}")
    assert(java.lang.Double.compare(fold.getDouble(0),
      kern.getDouble(0)) == 0,
      s"score mismatch for sv=$sv codes=$codes: " +
        s"fold=${fold.getDouble(0)} kern=${kern.getDouble(0)}")
  }

  test("max direction: ties, duplicate cells, ragged cells, reversed " +
      "id order all match the fold") {
    maxCase(Seq(1.0, 0.0), Seq(
      5L -> Seq(1.0, 0.0), 2L -> Seq(1.0, 0.0), // exact tie, ids reversed
      9L -> Seq(0.0, 1.0)))
    maxCase(Seq(1.0, 0.0), Seq(
      3L -> Seq(1.0), // ragged -> null score, must lose
      7L -> Seq(0.0, 1.0)))
    maxCase(Seq(1.0, 0.0), Seq(
      4L -> Seq(0.5), 2L -> Seq(1.0, 2.0, 3.0))) // ALL ragged -> lowest id
  }

  test("min direction: ties, ragged, rounding-boundary distances match " +
      "the fold at dp=6 and unrounded (dp=-1)") {
    for (dp <- Seq(6, -1)) {
      minCase(Seq(0.0, 0.0), dp, Seq(
        8 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0), // exact tie at d2=1
        5 -> Seq(3.0, 3.0)))
      minCase(Seq(0.0), dp, Seq(
        2 -> Seq(1.0, 1.0), 6 -> Seq(0.5))) // first ragged, second real
      minCase(Seq(0.5), dp, Seq(
        9 -> Seq(1.0, 2.0), 4 -> Seq(0.0, 1.0))) // all ragged -> lowest id
      // distances landing exactly on a .0000005 rounding boundary
      minCase(Seq(0.0), dp, Seq(1 -> Seq(0.0011180339887), 2 -> Seq(0.001118034)))
    }
  }

  test("seeded randomized sweep: kernel == fold across random vectors, " +
      "dims and cell counts (both directions)") {
    val rnd = new scala.util.Random(190342)
    for (_ <- 1 to 40) {
      val dim = 1 + rnd.nextInt(6)
      def v(d: Int) = Seq.fill(d)(
        math.floor(rnd.nextDouble() * 2000 - 1000) / 100)
      val nc = 1 + rnd.nextInt(5)
      val cents = (0 until nc).map { _ =>
        val raggy = rnd.nextInt(8) == 0
        (rnd.nextInt(6).toLong, v(if (raggy) dim + 1 else dim))
      }
      maxCase(v(dim).map(x => if (x == 0.0) 1.0 else x), cents)
      minCase(v(dim), if (rnd.nextBoolean()) 6 else -1,
        cents.map(c => (c._1.toInt, c._2)))
    }
  }

  test("NULL top-level input returns NULL, never a fabricated " +
      "(sentinel, lowest-id) cell — the documented fold divergence") {
    graft.functions.GraftFunctions.register(spark)
    // null qv / qn / cells for the cosine form; null sv / cells for l2.
    // The fold coalesced these into (sentinel, lowest id); the kernel
    // null-propagates — a row with no query vector has no assignment.
    val df = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("v", "nv")
      .withColumn("cells3", expr(
        "array(struct(1L as cid, array(1.0d) as cv, 1.0d as cn))"))
      .withColumn("cells2", expr(
        "array(struct(1 as code, array(1.0d) as cv))"))
    val r = df.select(
      expr("graft_argmax_cos(nv, 1.0d, cells3)").as("a"),
      expr("graft_argmax_cos(v, cast(null as double), cells3)").as("b"),
      expr("graft_argmax_cos(v, 1.0d, " +
        "cast(null as array<struct<cid: bigint, cv: array<double>, " +
        "cn: double>>))").as("c"),
      expr("graft_argmin_l2(nv, cells2, 6)").as("d"),
      expr("graft_argmin_l2(v, cast(null as array<struct<code: int, " +
        "cv: array<double>>>), 6)").as("e")).collect().head
    for (i <- 0 until 5) assert(r.isNullAt(i),
      s"column $i: NULL top-level input must yield NULL, got ${r.get(i)}")
  }

  test("empty cell array returns NULL (empty-in, empty-out contract) " +
      "and the kernel appears inside whole-stage codegen") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0), Seq.empty[(Int, Seq[Double])]))
      .toDF("sv", "rawc")
      .withColumn("_codes", expr(
        "transform(rawc, c -> struct(c._1 as code, c._2 as cv))"))
      .select(expr("graft_argmin_l2(sv, _codes, 6)").as("k"))
    assert(df.collect().head.isNullAt(0))
    // not CodegenFallback: over a non-literal source (literals constant-
    // fold into a LocalTableScan) the projection containing the kernel
    // must sit INSIDE a WholeStageCodegen span
    val live = spark.range(4)
      .selectExpr("cast(array(cast(id as double)) as array<double>) as sv",
        "array(struct(cast(id as int) as code, " +
          "array(cast(id + 1 as double)) as cv)) as _codes")
      .select(expr("graft_argmin_l2(sv, _codes, 6)").as("k"))
    assert(live.collect().length == 4)
    // executedPlan.toString marks codegen'd operators with "*(n)"; a
    // CodegenFallback expression would strip the star from its Project
    val plan = planOf(live)
    assert(plan.contains("*(1) Project"),
      s"argbest kernel fell out of whole-stage codegen:\n$plan")
  }
}
