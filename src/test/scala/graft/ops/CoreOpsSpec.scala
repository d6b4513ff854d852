package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  test("P1 decode splits value into exchange/isin") {
    val df = Seq("btsp#XFC000000001", "btfx#XFC000000002")
      .toDF("value")
    val out = CoreOps.decodeJobValue(df)
      .select("exchange", "isin").as[(String, String)].collect().toSet
    assert(out == Set(("btsp", "XFC000000001"), ("btfx", "XFC000000002")))
  }

  test("P1 decode on malformed value (no '#') yields null isin, not a crash") {
    val df = Seq("malformed-no-hash").toDF("value")
    val row = CoreOps.decodeJobValue(df).select("exchange", "isin").head()
    assert(row.getString(0) == "malformed-no-hash")
    assert(row.isNullAt(1))
  }

  test("P3 mid is the bid/ask midpoint") {
    val df = Seq((10.0, 12.0), (5.0, 5.0)).toDF("bid", "ask")
    val mids = CoreOps.withMid(df).select("mid").as[Double].collect().toSeq
    assert(mids == Seq(11.0, 5.0))
  }

  test("P6 eligibility keeps only id!=0, action=1000, type=2 (main.py:277,301)") {
    val jobs = Seq(
      (1L, 1000, "btsp#A", 2),  // eligible
      (0L, 1000, "btsp#B", 2),  // id 0
      (2L, 1100, "btsp#C", 2),  // wrong action
      (3L, 1000, "btsp#D", 1)   // wrong type
    ).toDF("downloader_jq_id", "action", "value", "type_idtype")
    val kept = CoreOps.eligibleJobs(jobs)
      .select("downloader_jq_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("P7 status filter drops non-200 rows (bitstamp/client.py:39-42)") {
    val df = Seq((200, "ok"), (404, "gone"), (500, "err")).toDF("status", "body")
    assert(CoreOps.okStatus(df).count() == 1)
  }

  test("P8 dispatch routes btsp->rest, btfx->wss, other->unknown") {
    val df = Seq("btsp", "btfx", "nyse").toDF("exchange")
    val routes = CoreOps.withRoute(df)
      .select("exchange", "route").as[(String, String)].collect().toMap
    assert(routes == Map("btsp" -> "rest", "btfx" -> "wss", "nyse" -> "unknown"))
  }

  test("F8 normalizeDecimal round-trips string decimals to double") {
    val df = Seq(6.55, 12.0, 0.0001).toDF("v")
    val out = CoreOps.normalizeDecimal("v", "d")(df)
      .select("d").as[Double].collect().toSeq
    assert(out == Seq(6.55, 12.0, 0.0001))
  }

  test("F5 envelope serializes enrichment columns to JSON (main.py:214-217)") {
    val df = Seq((655L, 1704067207179575L)).toDF("price_cents", "ts_us")
    val enriched = CoreOps.enrich(lit("btsp"), lit("XFC000000001"))(df)
    val json = enriched.select(CoreOps.toEnvelope(
      col("exchange"), col("isin"), col("price_cents"), col("ts_us"))).head().getString(0)
    assert(json ==
      """{"exchange":"btsp","isin":"XFC000000001","price_cents":655,"ts_us":1704067207179575}""")
  }
}
