package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "status", "price")

  test("applyCdc: upsert, latest-wins, delete, insert, pass-through") {
    val changes = Seq(
      (2L, 1L, "U", "b1", 21.0),   // update, superseded
      (2L, 2L, "U", "b2", 22.0),   // latest wins
      (3L, 1L, "U", "c1", 31.0),   // update then delete
      (3L, 2L, "D", null, 0.0),
      (5L, 1L, "U", "new", 50.0),  // insert (upsert-of-absent)
      (9L, 1L, "D", null, 0.0))    // delete-of-absent: no row out
      .toDF("k", "seq", "op", "status", "price")
    val out = Cdc.applyCdc(target, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (4L, "d", 40.0), (5L, "new", 50.0)))
  }

  test("applyCdc: null change payload falls back to the target value (partial update)") {
    val changes = Seq((1L, 1L, "U", null.asInstanceOf[String], 11.5))
      .toDF("k", "seq", "op", "status", "price")
    val out = Cdc.applyCdc(target, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out.head == ((1L, "a", 11.5))) // status kept, price updated
  }

  test("applyCdc: unknown op code fails loudly") {
    val changes = Seq((1L, 1L, "X", "zz", 0.0))
      .toDF("k", "seq", "op", "status", "price")
    val e = intercept[Exception] {
      Cdc.applyCdc(target, changes, Seq("k"), "seq", "op").collect()
    }
    assert(e.getMessage != null)
  }

  test("applyCdc: missing payload column in target is rejected at plan time") {
    val changes = Seq((1L, 1L, "U", "zz", 0.0, "extra"))
      .toDF("k", "seq", "op", "status", "price", "not_in_target")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyCdc(target, changes, Seq("k"), "seq", "op")
    }
    assert(e.getMessage.contains("not_in_target"))
  }

  test("applyCdc over a BUCKETED target shuffles only the change log") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cdc_wh").toString
    val bigTarget = spark.range(0, 10000)
      .select(col("id").as("k"), concat(lit("s"), col("id")).as("status"),
        (col("id") * 1.5).as("price"))
    Scale.writeBucketed(bigTarget, "cdc_target_bucketed", "k", 8, Some(wh))
    val changes = spark.range(0, 500)
      .select((col("id") * 20).as("k"), lit(1L).as("seq"), lit("U").as("op"),
        lit("upd").as("status"), lit(9.9).as("price"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = Cdc.applyCdc(spark.table("cdc_target_bucketed"), changes,
        Seq("k"), "seq", "op")
      // the bucketed target scan already satisfies the full-outer SMJ's
      // clustering requirement, so the (huge) target side joins with NO
      // exchange — the Cdc scaladoc claim, pinned here. In the plan
      // string the target is the SMJ's left branch (lines prefixed ":").
      // All shuffling happens on the (small) change-log side: its window
      // exchange plus, when spark.sql.shuffle.partitions != the bucket
      // count, one realignment exchange to the bucket distribution —
      // a production merge sets them equal and pays exactly one.
      val plan = planOf(merged)
      val targetBranch = plan.linesIterator
        .filter(_.trim.startsWith(":")).toSeq
      assert(targetBranch.exists(_.contains("Bucketed: true")),
        "target scan not bucketed:\n" + plan.take(2500))
      assert(!targetBranch.exists(_.contains("Exchange")),
        "bucketed target side should not shuffle:\n" + plan.take(2500))
      assert(merged.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS cdc_target_bucketed")
    }
  }

  test("applyCdcStream maintains a versioned snapshot across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_stream").toString
    Cdc.initSnapshot(target, dir) // v0: (1,a,10) (2,b,20) (3,c,30) (4,d,40)
    val in = MemoryStream[(Long, Long, String, String, Double)](spark)
    val changes = in.toDF().toDF("k", "seq", "op", "status", "price")
    val q = Cdc.applyCdcStream(changes, Seq("k"), "seq", "op", dir,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData((2L, 1L, "U", "b2", 22.0), (5L, 1L, "U", "new", 50.0))
      q.processAllAvailable() // batch 1: update k=2, insert k=5
      in.addData((5L, 2L, "D", null, 0.0), (1L, 2L, "U", "a2", 11.0))
      q.processAllAvailable() // batch 2: delete the k=5 just inserted, update k=1
    } finally q.stop()
    val snap = Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(snap == Seq(
      (1L, "a2", 11.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // versions accreted, previous ones intact (crash safety / time travel)
    assert(spark.read.parquet(s"$dir/v0").count() == 4)
    assert(spark.read.parquet(s"$dir/v1").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq.contains((5L, "new", 50.0)))
    // retention prunes old versions but never the latest
    assert(Cdc.pruneSnapshots(spark, dir, keep = 1) == Seq(1, 0))
    assert(Cdc.pruneSnapshots(spark, dir, keep = 0) == Seq.empty) // clamped
    assert(Cdc.latestSnapshot(spark, dir).count() == 4)
  }

  test("latestWins keeps exactly one row per key (max seq)") {
    val changes = (1 to 100).map(i => (i.toLong % 10, i.toLong, "U", s"v$i", 0.0))
      .toDF("k", "seq", "op", "status", "price")
    val latest = Cdc.latestWins(changes, Seq("k"), "seq")
      .as[(Long, Long, String, String, Double)].collect()
    assert(latest.length == 10)
    // key k sees seqs {k, k+10, ..}; max is 90+k, except key 0 whose
    // members are {10, 20, .., 100}
    latest.foreach { case (k, seq, _, _, _) =>
      assert(seq == (if (k == 0) 100 else 90 + k))
    }
  }
}
