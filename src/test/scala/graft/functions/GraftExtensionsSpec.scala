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
}
