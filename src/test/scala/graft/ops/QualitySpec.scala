package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, 10.0, "ok"), (2L, -5.0, "ok"), (3L, 200.0, "bad"),
    (4L, 50.0, null), (5L, 500.0, "ok"))
    .toDF("id", "v", "tag")

  private val rules = Seq(
    Quality.Rule("v_non_negative", col("v") >= 0),
    Quality.Rule("v_le_400", col("v") <= 400),
    Quality.Rule("tag_ok", col("tag") === "ok"))

  test("violationReport counts per rule, NULL verdict counts as fail") {
    val rep = Quality.violationReport(df, rules)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rep("v_non_negative") == ((5L, 1L, 200000L)))
    assert(rep("v_le_400") == ((5L, 1L, 200000L)))
    // row 3 fails (tag bad), row 4 fails (NULL tag -> NULL verdict -> fail)
    assert(rep("tag_ok") == ((5L, 2L, 400000L)))
  }

  test("quarantine splits exhaustively and tags failed rules in order") {
    val (clean, bad) = Quality.quarantine(df, rules)
    assert(clean.count() + bad.count() == 5)
    assert(clean.select("id").as[Long].collect().sorted.toSeq == Seq(1L))
    val tags = bad.select(col("id"), array_join(col("_failed"), ",").as("f"))
      .as[(Long, String)].collect().toMap
    assert(tags(2L) == "v_non_negative")
    assert(tags(3L) == "tag_ok")
    assert(tags(4L) == "tag_ok")
    assert(tags(5L) == "v_le_400")
    assert(!clean.columns.contains("_failed"))
  }

  test("rule and column names are validated before splicing into stack()") {
    intercept[IllegalArgumentException](Quality.Rule("bad name'", lit(true)))
    intercept[IllegalArgumentException](
      Quality.profile(df, Seq("id; drop")))
  }

  test("profile reports completeness, distinctness and string bounds") {
    val p = Quality.profile(df, Seq("id", "v", "tag"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(p("id") == ((5L, 0L, 5L, "1", "5")))
    assert(p("tag")._1 == 4L)  // one null
    assert(p("tag")._2 == 1L)
    assert(p("tag")._3 == 2L)  // ok, bad
    assert(p("tag")._4 == "bad" && p("tag")._5 == "ok")
    // numeric min/max ordered numerically before stringification
    assert(p("v")._4 == "-5.0" && p("v")._5 == "500.0")
  }

  test("approx-distinct path yields the same shape without an Expand") {
    val approx = Quality.profile(df, Seq("id", "tag"), exactDistinct = false)
    assert(approx.columns.toSeq == Seq("column_name", "n_non_null", "n_null",
      "n_distinct", "min_val", "max_val"))
    assert(approx.count() == 2)
    val exactPlan = Quality.profile(df, Seq("id", "tag")).queryExecution
      .executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    assert(!approxPlan.contains("Expand"))
  }
}
