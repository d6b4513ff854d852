package graft.ops

import graft.SparkSpec
import graft.schema.CurrencyDim

class DimJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("dim has 84 unique ISINs and pairs (currency.py:7-91)") {
    assert(CurrencyDim.rows.size == 84)
    assert(CurrencyDim.rows.map(_.isin).distinct.size == 84)
    assert(CurrencyDim.rows.map(_.pair).distinct.size == 84)
    assert(CurrencyDim.rows.forall(r => r.pair == r.base + r.quote))
    assert(CurrencyDim.rows.head.isin == "XFC000000001")
  }

  test("J1 forward join drops unknown ISINs (KeyError semantics)") {
    val facts = Seq("XFC000000001", "XFC000000999").toDF("isin")
    val out = DimJoins.forward(spark)(facts)
    assert(out.count() == 1)
    assert(out.select("pair").as[String].head() == "btceur")
  }

  test("J2 reverse join keeps unknown pairs with null isin (None semantics)") {
    val facts = Seq("btceur", "nosuchpair").toDF("pair")
    val out = DimJoins.reverse(spark)(facts)
    assert(out.count() == 2)
    val m = out.select("pair", "isin_resolved").as[(String, Option[String])]
      .collect().toMap
    assert(m("btceur").contains("XFC000000001"))
    assert(m("nosuchpair").isEmpty)
  }

  test("both dim joins plan as BroadcastHashJoin (no shuffle of the fact side)") {
    val facts = Seq("XFC000000001").toDF("isin")
    assert(planOf(DimJoins.forward(spark)(facts)).contains("BroadcastHashJoin"))
    val facts2 = Seq("btceur").toDF("pair")
    assert(planOf(DimJoins.reverse(spark)(facts2)).contains("BroadcastHashJoin"))
  }
}
