package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketSpec extends SparkSpec {
  import spark.implicits._

  // baskets: 1 {x,y,z}, 2 {x,y}, 3 {x,y}, 4 {x}, 5 {q,r,s,t} (dropped
  // at maxBasket = 3), plus a duplicate line of x in basket 1 that must
  // collapse before pairing
  private def rows = Seq(
    (1L, "x"), (1L, "x"), (1L, "y"), (1L, "z"),
    (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"), (4L, "x"),
    (5L, "q"), (5L, "r"), (5L, "s"), (5L, "t")).toDF("bk", "item")

  test("X12a pairCounts: within-basket distinct pairs, ordered a < b, " +
      "over-cap baskets dropped before the fan-out, support floor") {
    val p = Basket.pairCounts(rows, "bk", "item", maxBasket = 3)
      .as[(String, String, Long)].collect().toSet
    // capped-in baskets 1..4 -> pairs: (x,y)×3 from 1,2,3; (x,z),(y,z) from 1
    assert(p == Set(("x", "y", 3L), ("x", "z", 1L), ("y", "z", 1L)))
    // basket 5's items never pair (q<r would otherwise appear)
    assert(!p.exists(_._1 == "q"))
    // support floor prunes the singletons
    val p2 = Basket.pairCounts(rows, "bk", "item", maxBasket = 3,
        minSupport = 2L)
      .as[(String, String, Long)].collect().toSet
    assert(p2 == Set(("x", "y", 3L)))
  }

  test("X12b rules: both directions, exact confidence and lift ppm " +
      "against hand-rolled values") {
    val r = Basket.rules(rows, "bk", "item", maxBasket = 3)
      .collect().map(row => (row.getString(0), row.getString(1),
        row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
        row.getLong(6))).toSet
    // capped population: baskets 1,2,3,4 (n_baskets = 4)
    // supports: x=4, y=3, z=1; pair (x,y)=3, (x,z)=1, (y,z)=1
    // x->y: conf 3/4 = 750000; lift 3·4·1e6/(4·3) = 1000000 (independent)
    // y->x: conf 3/3 = 1e6; lift same 1000000
    // x->z: conf 1/4 = 250000; lift 1·4·1e6/(4·1) = 1000000
    // z->x: conf 1/1 = 1e6
    // y->z: conf 1/3 = 333333; lift 1·4·1e6/(3·1) = 1333333
    assert(r == Set(
      ("x", "y", 3L, 4L, 3L, 750000L, 1000000L),
      ("y", "x", 3L, 3L, 4L, 1000000L, 1000000L),
      ("x", "z", 1L, 4L, 1L, 250000L, 1000000L),
      ("z", "x", 1L, 1L, 4L, 1000000L, 1000000L),
      ("y", "z", 1L, 3L, 1L, 333333L, 1333333L),
      ("z", "y", 1L, 1L, 3L, 1000000L, 1333333L)))
  }

  test("NULL basket ids and NULL items are excluded from supports AND " +
      "n_baskets (r19 ADVICE: the anti-join reshape must not retain " +
      "NULL-key rows the old semi join dropped)") {
    val withNulls = rows
      .unionAll(Seq((Option.empty[Long], Option("x")),
        (Option.empty[Long], Option("y")),
        (Option(2L), Option.empty[String])).toDF("bk", "item"))
    // pairs unchanged: the NULL-bk pseudo-basket never pairs
    val p = Basket.pairCounts(withNulls, "bk", "item", maxBasket = 3)
      .as[(String, String, Long)].collect().toSet
    assert(p == Set(("x", "y", 3L), ("x", "z", 1L), ("y", "z", 1L)))
    // rules unchanged: NULL-bk rows inflate neither n_lhs nor
    // n_baskets, NULL item contributes no support — byte-identical to
    // the clean-input run above
    val r = Basket.rules(withNulls, "bk", "item", maxBasket = 3)
      .collect().map(row => (row.getString(0), row.getString(1),
        row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
        row.getLong(6))).toSet
    val clean = Basket.rules(rows, "bk", "item", maxBasket = 3)
      .collect().map(row => (row.getString(0), row.getString(1),
        row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5),
        row.getLong(6))).toSet
    assert(r == clean)
  }

  test("the over-cap broadcast ceiling fires LOUDLY past the bound " +
      "(r19 ADVICE guard, red-proven via the test seam)") {
    // four over-cap baskets against a ceiling of 3: the lazy window
    // guard must raise the descriptive error instead of broadcasting
    // an unbounded over-cap list
    val many = (1L to 4L).flatMap(bk =>
      (1 to 4).map(i => (bk, s"i$i"))).toDF("bk", "item")
    sys.props.put("graft.basket.overCapCeiling", "3")
    try {
      val e = intercept[Exception] {
        Basket.pairCounts(many, "bk", "item", maxBasket = 3).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("not broadcast-class")),
        s"expected the descriptive ceiling error, got: ${msgs(e)}")
      // and with the ceiling satisfied the same input caps quietly
      sys.props.put("graft.basket.overCapCeiling", "4")
      assert(Basket.pairCounts(many, "bk", "item", maxBasket = 3)
        .collect().isEmpty)
    } finally sys.props.remove("graft.basket.overCapCeiling")
  }

  test("X12c itemCosine: hand-computed cosine-squared ppm; identical " +
      "co-membership hits 10^6 exactly") {
    val rows = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (4L, "B"), (4L, "C")).toDF("bk", "item")
    val out = Basket.itemCosine(rows, "bk", "item")
      .select($"a", $"b", $"n_ab", $"n_a", $"n_b", $"sim2_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // A:{1,2,3} B:{1,2,4} C:{4}; AB cooc 2 -> 4e6/9; BC cooc 1 -> 1e6/3
    assert(out == Set(
      ("A", "B", 2L, 3L, 3L, 444444L),
      ("B", "C", 1L, 3L, 1L, 333333L)))
    // two items in exactly the same baskets: cosine^2 exactly 1
    val same = Seq((1L, "P"), (1L, "Q"), (2L, "P"), (2L, "Q"))
      .toDF("bk", "item")
    val one = Basket.itemCosine(same, "bk", "item")
      .select($"sim2_ppm").as[Long].collect().head
    assert(one == 1000000L)
  }
}
