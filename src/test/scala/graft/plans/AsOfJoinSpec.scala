package graft.plans

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("custom as-of operator on a hand-built case: latest right ts <= left ts") {
    val trades = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("user_id", "ts_us")
    val quotes = Seq((1L, 90L), (1L, 150L), (1L, 250L), (3L, 10L))
      .toDF("user_id", "ts_us")
    val out = AsOfJoin(trades, quotes, "user_id", "ts_us", "ts_us", "asof_us")
      .select("user_id", "ts_us", "asof_us")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 100L, Some(90L)),   // 90 <= 100 < 150
      (1L, 200L, Some(150L)),  // 150 <= 200 < 250
      (2L, 50L, None)))        // no quotes for user 2
  }

  test("tie contract: a right row at exactly the left ts matches (inclusive <=)") {
    val trades = Seq((1L, 100L)).toDF("user_id", "ts_us")
    val quotes = Seq((1L, 100L), (1L, 101L)).toDF("user_id", "ts_us")
    val out = AsOfJoin(trades, quotes, "user_id", "ts_us", "ts_us", "asof_us")
      .select("asof_us").as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(100L)))
  }

  test("tie contract: inclusive=false takes strictly-preceding, cursor not lost") {
    val trades = Seq((1L, 100L), (1L, 200L)).toDF("user_id", "ts_us")
    val quotes = Seq((1L, 90L), (1L, 100L), (1L, 200L)).toDF("user_id", "ts_us")
    val out = AsOfJoin(trades, quotes, "user_id", "ts_us", "ts_us", "asof_us",
        inclusive = false)
      .select("ts_us", "asof_us").as[(Long, Option[Long])].collect().toSet
    // at 100: the equal-ts quote is excluded, 90 wins; at 200: the quote
    // at 100 (skipped earlier, now strictly preceding) must be seen — the
    // merge cursor must not have consumed past it
    assert(out == Set((100L, Some(90L)), (200L, Some(100L))))
  }

  test("null contract: null keys/ts never match on either side") {
    val trades = Seq((Some(1L), Some(100L)), (None, Some(100L)), (Some(1L), None))
      .toDF("user_id", "ts_us")
    val quotes = Seq((Some(1L), Some(90L)), (None, Some(95L)), (Some(1L), None))
      .toDF("user_id", "ts_us")
    val out = AsOfJoin(trades, quotes, "user_id", "ts_us", "ts_us", "asof_us")
      .select("user_id", "asof_us")
      .as[(Option[Long], Option[Long])].collect().toSet
    // the only match pairs non-null (1, 100) with non-null (1, 90); the
    // null-key quote must not be read back as key 0, the null-ts quote and
    // the null left rows must simply never match
    assert(out == Set(
      (Some(1L), Some(90L)), (None, None), (Some(1L), None)))
  }

  test("forward direction: smallest right ts >= left ts; answer row is peeked, not consumed") {
    val trades = Seq((1L, 100L), (1L, 140L), (1L, 200L), (2L, 50L))
      .toDF("user_id", "ts_us")
    val quotes = Seq((1L, 90L), (1L, 150L), (1L, 250L), (3L, 10L))
      .toDF("user_id", "ts_us")
    val out = AsOfJoin(trades, quotes, "user_id", "ts_us", "ts_us", "next_us",
        forward = true)
      .select("user_id", "ts_us", "next_us")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 100L, Some(150L)), // 90 is behind; 150 is the next at/after 100
      (1L, 140L, Some(150L)), // the SAME 150 serves this left row too
      (1L, 200L, Some(250L)),
      (2L, 50L, None)))       // no quotes for user 2
  }

  test("forward tie contract (inclusive vs strict) and null keys/ts") {
    val trades = Seq((Some(1L), Some(100L)), (None, Some(100L)), (Some(1L), None))
      .toDF("user_id", "ts_us")
    val quotes = Seq((Some(1L), Some(100L)), (None, Some(95L)), (Some(1L), None))
      .toDF("user_id", "ts_us")
    val incl = AsOfJoin(trades, quotes, "user_id", "ts_us", "ts_us", "next_us",
        forward = true)
      .select("user_id", "next_us")
      .as[(Option[Long], Option[Long])].collect().toSet
    // equal-ts quote matches under the inclusive default; null left rows
    // and null right rows never match in either direction
    assert(incl == Set(
      (Some(1L), Some(100L)), (None, None), (Some(1L), None)))
    val strict = AsOfJoin(
        Seq((1L, 100L)).toDF("user_id", "ts_us"),
        Seq((1L, 100L), (1L, 120L)).toDF("user_id", "ts_us"),
        "user_id", "ts_us", "ts_us", "next_us",
        inclusive = false, forward = true)
      .select("next_us").as[Option[Long]].collect()
    assert(strict.toSeq == Seq(Some(120L)))
  }

  test("custom as-of operator matches the window-composed j7 on real data") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("ts_us", expr("unix_micros(ts)"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us")
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts_us")
    val custom = AsOfJoin(purchases, clicks, "user_id", "ts_us", "ts_us",
        "last_click_us")
      .select("event_id", "last_click_us")
      .as[(Long, Option[Long])].collect().toMap
    val windowed = graft.Queries.byName("j7_asof_join").fn(spark, sf("sf0.001"))
      .select("event_id", "last_click_us")
      .as[(Long, Option[Long])].collect().toMap
    assert(custom == windowed)
  }

  test("the physical plan is the custom exec with co-partitioned sorted children") {
    val trades = Seq((1L, 100L)).toDF("user_id", "ts_us")
    val quotes = Seq((1L, 90L)).toDF("user_id", "ts_us")
    val plan = planOf(AsOfJoin(trades, quotes, "user_id", "ts_us", "ts_us", "a"))
    assert(plan.contains("AsOfJoin")) // exec nodeName strips the Exec suffix
    assert(plan.contains("Sort"))
    assert(plan.contains("Exchange hashpartitioning(user_id"))
  }
}
