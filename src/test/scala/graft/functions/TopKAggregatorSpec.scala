package graft.functions

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private val agg = new TopKAggregator(3)

  test("reduce keeps the buffer sorted, capped, and tie-broken by id") {
    val rows = Seq(Ranked(5, 1.0), Ranked(1, 3.0), Ranked(2, 3.0),
      Ranked(9, 2.0), Ranked(7, 3.0), Ranked(3, 0.5))
    val out = rows.foldLeft(agg.zero)(agg.reduce).items
    // score DESC, then id ASC among the 3.0 ties; capped at 3.
    assert(out == List(Ranked(1, 3.0), Ranked(2, 3.0), Ranked(7, 3.0)))
  }

  test("merge result is independent of how rows were partitioned") {
    val rows = (1 to 200).map(i => Ranked(i.toLong, (i * 37 % 23).toDouble))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(1, 50, 133, 199)) {
      val (a, b) = rows.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(merged == whole, s"cut=$cut")
    }
    // merge is commutative too
    val (a, b) = rows.splitAt(77)
    val ab = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
      b.foldLeft(agg.zero)(agg.reduce))
    val ba = agg.merge(b.foldLeft(agg.zero)(agg.reduce),
      a.foldLeft(agg.zero)(agg.reduce))
    assert(ab == ba)
  }

  test("under-full groups return all rows, still sorted") {
    val out = Seq(Ranked(4, 1.0), Ranked(2, 9.0))
      .foldLeft(agg.zero)(agg.reduce).items
    assert(out == List(Ranked(2, 9.0), Ranked(4, 1.0)))
  }

  test("typed route matches the window formulation on real data") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), col("event_id"), col("value"))
    val topk = new TopKAggregator(5)
    val viaAgg = ev.as[(String, Long, Double)]
      .map { case (g, id, v) => (g, Ranked(id, v)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(topk.toColumn.name("topk"))
      .select($"key".as("g"), posexplode($"topk.items"))
      .select($"g", $"col.id", $"col.score")
      .as[(String, Long, Double)].collect().toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy($"value".desc, $"event_id")
    val viaWindow = ev.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 5).select($"event_type", $"event_id", $"value")
      .as[(String, Long, Double)].collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("k bounds are enforced") {
    intercept[IllegalArgumentException](new TopKAggregator(0))
    intercept[IllegalArgumentException](new TopKAggregator(10001))
  }
}
