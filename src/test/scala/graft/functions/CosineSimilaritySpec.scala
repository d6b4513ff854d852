package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
    (Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
    (Seq(0.3, -0.7, 0.2), Seq(-0.1, 0.9, 0.4)),
    (Seq(1e-8, 2e-8, 3e8), Seq(4.0, 5.0, 6.0))
  ).toDF("qv", "cv")

  test("codegen'd cosine is bit-identical to the builtin fold route") {
    GraftFunctions.register(spark)
    val out = vecs.select(
      expr("graft_cosine(qv, cv)").as("fast"),
      expr(Similarity.cosineExprBuiltin).as("ref"))
    assert(out.filter(col("fast") =!= col("ref")).count() == 0)
  }

  test("self-similarity is 1, orthogonal is 0, nulls propagate") {
    GraftFunctions.register(spark)
    val r = vecs.select(expr("graft_cosine(qv, cv)")).as[Double].collect()
    assert(math.abs(r(0) - 1.0) < 1e-15)
    assert(r(1) == 0.0)
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("qv", "cv")
    assert(withNull.select(expr("graft_cosine(qv, cv)")).head().isNullAt(0))
  }

  test("ragged (unequal-length) vectors yield null, in both eval paths") {
    GraftFunctions.register(spark)
    // codegen path: arrays built from range stay inside whole-stage codegen
    val ragged = spark.range(3).select(
      expr("array(cast(id as double), 1.0)").as("qv"),
      expr("array(cast(id as double), 1.0, 2.0)").as("cv"))
    assert(ragged.select(expr("graft_cosine(qv, cv)")).collect()
      .forall(_.isNullAt(0)))
    // interpreted path: evaluate the expression directly
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == null)
  }

  test("graft_dot decomposition is bit-identical to the fused cosine kernel") {
    GraftFunctions.register(spark)
    // the precomputed-norm route Similarity uses: dot/(sqrt(dot(a,a))*...)
    val out = vecs.select(
      expr("graft_cosine(qv, cv)").as("fused"),
      (expr("graft_dot(qv, cv)") /
        (sqrt(expr("graft_dot(qv, qv)")) * sqrt(expr("graft_dot(cv, cv)"))))
        .as("decomposed"))
    assert(out.filter(col("fused") =!= col("decomposed")).count() == 0)
    // ragged inputs: null, same contract as graft_cosine
    val ragged = spark.range(2).select(
      expr("array(cast(id as double), 1.0)").as("qv"),
      expr("array(cast(id as double), 1.0, 2.0)").as("cv"))
    assert(ragged.select(expr("graft_dot(qv, cv)")).collect()
      .forall(_.isNullAt(0)))
  }

  test("graft_l2sq is bit-identical to the builtin fold it replaced, " +
      "and nulls on ragged input") {
    GraftFunctions.register(spark)
    // adversarial magnitudes: FP addition order matters, so equality
    // here proves the loop accumulates exactly like the fold
    val df = spark.range(500).select(
      expr("transform(sequence(0, 15), d -> " +
        "cast(pmod(hash(id, d), 1000000) as double) / 997.0 " +
        "- 500.0 + cast(d as double) * 1e6)").as("sv"),
      expr("transform(sequence(0, 15), d -> " +
        "cast(pmod(hash(id + 7, d), 1000000) as double) / 31.0)").as("cv"))
    val out = df.select(
      expr("graft_l2sq(sv, cv)").as("fast"),
      expr("aggregate(zip_with(sv, cv, (x, y) -> (x - y) * (x - y)), " +
        "cast(0 as double), (acc, v) -> acc + v)").as("ref"))
    assert(out.filter(col("fast") =!= col("ref")).count() == 0)
    val ragged = spark.range(2).select(
      expr("array(cast(id as double))").as("sv"),
      expr("array(cast(id as double), 1.0)").as("cv"))
    assert(ragged.select(expr("graft_l2sq(sv, cv)")).collect()
      .forall(_.isNullAt(0)))
  }

  test("the expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // literal inputs constant-fold to LocalTableScan, and transform()
    // lambdas are CodegenFallback (they'd poison the stage) — build the
    // vectors with codegen-friendly array() from a range
    val df = spark.range(100).select(
      expr("array(cast(id as double), cast(id + 1 as double), 3.0)").as("qv"),
      expr("array(cast(id + 2 as double), 1.0, cast(id as double))").as("cv"))
    val out = df.select(expr("graft_cosine(qv, cv)").as("c"))
      .filter(col("c") > -2)
    // whole-stage-codegen'd operators print with a "*(n)" prefix
    assert(planOf(out).linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*")))
    assert(out.count() == 100) // and the generated code actually runs
  }
}
