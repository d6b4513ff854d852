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

  test("X11d iqrOutliers: pinned quartile positions, Tukey fences flag " +
      "exactly the planted extremes, groups are independent") {
    // group a: 1..8 plus extremes -100 and 120.
    // n=10 -> q1 at rn (10+3) div 4 = 3, q3 at rn (31) div 4 = 7.
    // sorted: -100,1,2,3,4,5,6,7,8,120 -> q1=2, q3=6, iqr=4;
    // fences: lo 2-6=-4, hi 6+6=12 -> -100 low, 120 high, nothing else
    val a = Seq(-100L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 120L)
      .zipWithIndex.map { case (v, i) => ("a", i.toLong, v) }
    // group b: constant -> iqr 0, fences collapse to the point, 0 out
    val b = (0 until 5).map(i => ("b", (100 + i).toLong, 7L))
    val out = Quality.iqrOutliers((a ++ b).toDF("g", "id", "cents"),
        "g", "id", col("cents"))
      .orderBy(col("g"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 2L, 6L, 1L, 1L),
      ("b", 5L, 7L, 7L, 0L, 0L)))
  }

  test("X11e benfordProfile: digits partition the positives, ppm shares " +
      "sum to ~1e6, expected column carries the spliced literals") {
    // 1, 19, 100, 2, 25, 3 -> digits 1,1,1,2,2,3; zero row dropped
    val vals = Seq(1L, 19L, 100L, 2L, 25L, 3L, 0L)
    val out = Quality.benfordProfile(vals.toDF("v"), col("v"))
      .orderBy(col("digit"))
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1, 3L), (2, 2L), (3, 1L)))
    assert(out.map(_._3) == Seq(500000L, 333333L, 166666L))
    assert(out.map(_._4) == Seq(Quality.benfordPpm(1),
      Quality.benfordPpm(2), Quality.benfordPpm(3)))
    out.foreach(r => assert(r._5 == r._3 - r._4))
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

  test("X11f referential audit counts orphans, null FKs and clean links " +
      "per relation") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val out = Quality.referentialAudit(Seq(
        Quality.FkRule("child__parent", child, "fk", parent, "pk"),
        Quality.FkRule("parent__parent", parent, "pk", parent, "pk")))
      .orderBy($"relation")
      .select($"relation", $"n_child", $"n_null_fk", $"n_orphans",
        $"orphan_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("child__parent", 5L, 1L, 1L, 200000L),
      ("parent__parent", 3L, 0L, 0L, 0L)))
  }

  test("X11g uniqueness audit: a true key reports zero dups, a fanned " +
      "key counts every extra copy, composite keys audit as a unit") {
    val t = Seq((1L, 1), (1L, 2), (2L, 1), (3L, 1), (3L, 1))
      .toDF("k", "sub")
    val out = Quality.uniquenessAudit(Seq(
        ("k_alone", t, Seq("k")),
        ("k_sub", t, Seq("k", "sub"))))
      .orderBy($"relation")
      .select($"relation", $"n_rows", $"n_keys", $"n_dup_rows", $"dup_ppm")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // k alone: keys {1,2,3}, 5 rows -> 2 extra copies (1x k=1, 1x k=3)
    // (k, sub): keys {(1,1),(1,2),(2,1),(3,1)} -> 1 extra copy
    assert(out == Seq(
      ("k_alone", 5L, 3L, 2L, 400000L),
      ("k_sub", 5L, 4L, 1L, 200000L)))
  }

  test("X11h FD audit: a held dependency reports zero violations, a " +
      "broken one counts violating lhs values with max fanout") {
    val t = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "z")).toDF("l", "r")
    val out = Quality.fdAudit(Seq(("l__r", t, "l", "r")))
      .select($"fd", $"n_lhs", $"n_violating", $"max_fanout", $"viol_ppm")
      .as[(String, Long, Long, Long, Long)].collect().head
    // lhs 1 -> {a} ok; lhs 2 -> {a,b,c} violates with fanout 3; 3 -> ok
    assert(out == (("l__r", 3L, 1L, 3L, 333333L)))
    // duplicates of the SAME (lhs, rhs) pair never count as violations
    val dup = Seq((9L, "x"), (9L, "x"), (9L, "x")).toDF("l", "r")
    val clean = Quality.fdAudit(Seq(("d", dup, "l", "r")))
      .select($"n_violating").as[Long].collect().head
    assert(clean == 0L)
  }
}
