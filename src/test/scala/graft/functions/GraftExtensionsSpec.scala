package graft.functions

import graft.SparkSpec

/** The extensions route: sessions built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the shared test
  * builder sets it, as a cluster deployment would via spark-defaults) get
  * graft_cosine in SQL with no per-session register() call. */
class GraftExtensionsSpec extends SparkSpec {
  test("spark.sql.extensions installs graft_cosine for SQL resolution") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("spark.sql.extensions installs graft_minhash for SQL resolution") {
    val r = spark.sql(
      "SELECT graft_minhash(array('a b c d'), 2, 1) AS sig").head()
      .getSeq[String](0)
    assert(r.length == 2 && r.forall(_.matches("[0-9a-f]{32}")))
    // 2-arg form (pre-shingled) resolves too
    assert(spark.sql("SELECT graft_minhash(array('x'), 1) AS s").head()
      .getSeq[String](0).length == 1)
  }

  test("spark.sql.extensions installs graft_dot; minhash rejects numHashes > 8") {
    val d = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
      .getDouble(0)
    assert(d == 11.0)
    // the rotation family has at most 8 distinct members (2-byte steps
    // over a 16-byte digest) — larger numHashes must fail analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash(array('x'), 9)").head()
    }
  }

  test("SimplifySelfCosine folds graft_cosine(x, x) to a literal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = spark.range(10)
      .select(expr("array(cast(id as double), 2.0, 3.0)").as("v"))
      .select(expr("graft_cosine(v, v)").as("c"))
    // the optimized plan must not contain the cosine kernel at all
    assert(!df.queryExecution.optimizedPlan.toString.contains("cosinesimilarity"))
    assert(df.as[Double].collect().forall(_ == 1.0))
    // null vectors still propagate null
    val withNull = spark.sql(
      "SELECT graft_cosine(CAST(NULL AS ARRAY<DOUBLE>), CAST(NULL AS ARRAY<DOUBLE>)) AS c")
    assert(withNull.head().isNullAt(0))
  }
}
