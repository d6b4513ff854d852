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
