package graft.functions

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

class OhlcAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("U1 typed Aggregator OHLC matches the built-in min_by/max_by route") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), expr("unix_micros(ts)").as("tsMicros"),
        col("value").as("price"))
    val viaAgg = ev.as[(String, Long, Double)]
      .map { case (k, t, p) => (k, TickIn(t, p)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(OhlcAggregator.toColumn.name("ohlc"))
      .select($"key", $"ohlc.open", $"ohlc.high", $"ohlc.low", $"ohlc.close",
        round($"ohlc.priceSum", 6).as("priceSum"), $"ohlc.n")
      .as[(String, Double, Double, Double, Double, Double, Long)]
      .collect().map { case (k, o, h, l, c, ps, n) => k -> ((o, h, l, c, ps, n)) }.toMap

    val viaBuiltins = ev.groupBy(col("event_type"))
      .agg(expr("min_by(price, tsMicros)").as("open"), max("price").as("high"),
        min("price").as("low"), expr("max_by(price, tsMicros)").as("close"),
        round(sum("price"), 6).as("priceSum"),
        count(lit(1)).as("n"))
      .as[(String, Double, Double, Double, Double, Double, Long)]
      .collect().map { case (k, o, h, l, c, ps, n) => k -> ((o, h, l, c, ps, n)) }.toMap

    assert(viaAgg == viaBuiltins)
  }

  test("U1 merge is associative across partition splits") {
    val ticks = (1 to 100).map(i => TickIn(i.toLong, (i * 37 % 11).toDouble))
    val whole = ticks.foldLeft(OhlcAggregator.zero)(OhlcAggregator.reduce)
    val (a, b) = ticks.splitAt(33)
    val merged = OhlcAggregator.merge(
      a.foldLeft(OhlcAggregator.zero)(OhlcAggregator.reduce),
      b.foldLeft(OhlcAggregator.zero)(OhlcAggregator.reduce))
    assert(OhlcAggregator.finish(whole) == OhlcAggregator.finish(merged))
  }
}
