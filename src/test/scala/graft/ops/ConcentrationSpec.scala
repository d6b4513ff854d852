package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  test("X8s giniBy: equal shares score 0, a monopoly scores (n-1)/n, " +
      "groups never mix, all-zero groups report null") {
    val rows = Seq(
      ("eq", 1L, 50L), ("eq", 2L, 50L), ("eq", 3L, 50L), ("eq", 4L, 50L),
      ("mono", 1L, 0L), ("mono", 2L, 0L), ("mono", 3L, 0L),
      ("mono", 4L, 80L),
      ("zero", 1L, 0L), ("zero", 2L, 0L))
      .toDF("g", "m", "x")
    val out = Concentration.giniBy(rows, "g", "m", $"x")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out("eq") == Some(0L), s"equal shares must be 0: $out")
    // monopoly of 4: G = (2*(1*0+2*0+3*0+4*80) - 5*80) / (4*80) = 3/4
    assert(out("mono") == Some(750000L), s"monopoly gini wrong: $out")
    assert(out("zero").isEmpty, "all-zero group must report null")
  }

  test("X8t hhiBy: n equal members score 1/n, a monopoly scores 1, " +
      "member rows pre-aggregate before squaring") {
    val rows = Seq(
      ("eq", 1L, 25L), ("eq", 2L, 25L), ("eq", 3L, 25L), ("eq", 4L, 25L),
      // member 1 split across two rows: must square the SUM (30), not
      // the pieces (10² + 20²)
      ("split", 1L, 10L), ("split", 1L, 20L), ("split", 2L, 30L),
      ("mono", 7L, 99L))
      .toDF("g", "m", "x")
    val out = Concentration.hhiBy(rows, "g", "m", $"x")
      .select($"g", $"n_members", $"hhi_ppm")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("eq") == ((4L, 250000L)), s"4 equal members = 1/4: $out")
    assert(out("split") == ((2L, 500000L)),
      s"two equal members after pre-aggregation = 1/2: $out")
    assert(out("mono") == ((1L, 1000000L)), s"monopoly = 1: $out")
  }
}
