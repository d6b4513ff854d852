package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "status", "price")

  /** The snapshot's routing function, replicated for assertions. */
  private def bucketsOf(keys: Seq[Long], n: Int): Set[Int] =
    keys.toDF("k").select(pmod(hash(col("k")), lit(n)).as("b"))
      .as[Int].collect().toSet

  private def bucketDirs(dir: String): Set[Int] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toInt).toSet

  /** (relative path -> md5 of bytes) for every data file under `dir`. */
  private def fileHashes(dir: String): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet")).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      f.getPath.stripPrefix(dir) -> md.map("%02x".format(_)).mkString
    }.toMap
  }

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

  test("applyCdc: partialUpdate=false replaces the whole payload, NULLs included") {
    val changes = Seq((1L, 1L, "U", null.asInstanceOf[String], 11.5))
      .toDF("k", "seq", "op", "status", "price")
    val out = Cdc.applyCdc(target, changes, Seq("k"), "seq", "op",
        partialUpdate = false)
      .orderBy("k").collect()
    assert(out.head.isNullAt(1) && out.head.getDouble(2) == 11.5) // status SET to null
    assert(out(1).getString(1) == "b") // untouched keys keep their payload
  }

  test("latestWins: duplicate (key, seq) resolves deterministically") {
    // a malformed log: same key, same seq, two different payloads — the
    // name-sorted descending tie-break (op, price, status here) must pick
    // the same winner every time
    val dup = Seq((1L, 1L, "U", "zzz", 1.0), (1L, 1L, "U", "aaa", 2.0))
    (1 to 5).foreach { _ =>
      val w = Cdc.latestWins(dup.toDF("k", "seq", "op", "status", "price"),
        Seq("k"), "seq").as[(Long, Long, String, String, Double)].head()
      assert(w == ((1L, 1L, "U", "aaa", 2.0))) // price 2.0 > 1.0 descending
    }
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

  test("applyCdcStream: key-scoped merges rewrite ONLY touched buckets; " +
      "untouched files stay byte-identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val n = 8
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_stream").toString
    Cdc.initSnapshot(target, dir, Seq("k"), n) // v0: (1,a,10) (2,b,20) (3,c,30) (4,d,40)
    val v0Before = fileHashes(s"$dir/v0")
    assert(v0Before.nonEmpty)

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

    // proportional writes: each version directory holds EXACTLY the
    // buckets its batch's keys hash into, nothing else
    assert(bucketDirs(s"$dir/v1") == bucketsOf(Seq(2L, 5L), n))
    assert(bucketDirs(s"$dir/v2").subsetOf(bucketsOf(Seq(5L, 1L), n)))
    // v0 was NEVER rewritten: every seed file still byte-identical
    assert(fileHashes(s"$dir/v0") == v0Before)

    // retention never deletes versions still owning live buckets: v0 holds
    // the untouched buckets (k=3, k=4 at least), so keep=1 must spare it
    val v0LiveBuckets = bucketsOf(Seq(3L, 4L), n) --
      bucketsOf(Seq(1L, 2L, 5L), n)
    if (v0LiveBuckets.nonEmpty) {
      Cdc.pruneSnapshots(spark, dir, keep = 1)
      assert(new java.io.File(s"$dir/v0").isDirectory,
        "pruned a version still referenced by the latest manifest")
      assert(Cdc.latestSnapshot(spark, dir).count() == 4)
    }

    // compaction folds every bucket into a fresh version; THEN old
    // versions are unreferenced and prunable, and data is unchanged
    val cv = Cdc.compactSnapshot(spark, dir)
    val pruned = Cdc.pruneSnapshots(spark, dir, keep = 1)
    assert(pruned.nonEmpty && !pruned.contains(cv))
    assert(!new java.io.File(s"$dir/v0").exists())
    val after = Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(after == snap)
  }

  test("mergeScoped: an all-deletes batch leaves an empty-but-readable bucket") {
    val n = 4
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_del").toString
    Cdc.initSnapshot(Seq((10L, "x", 1.0)).toDF("k", "status", "price"),
      dir, Seq("k"), n)
    Cdc.mergeScoped(
      Seq((10L, 1L, "D", null.asInstanceOf[String], 0.0))
        .toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    assert(Cdc.latestSnapshot(spark, dir).count() == 0)
    // and an insert after the wipe-out still lands
    Cdc.mergeScoped(
      Seq((11L, 2L, "U", "y", 2.0)).toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    assert(Cdc.latestSnapshot(spark, dir).as[(Long, String, Double)]
      .collect().toSeq == Seq((11L, "y", 2.0)))
  }

  test("snapshotAt time-travels; snapshotDiff labels I/U/D and skips unchanged") {
    val n = 8
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_tt").toString
    Cdc.initSnapshot(target, dir, Seq("k"), n)
    Cdc.mergeScoped(Seq(
        (2L, 1L, "U", "b2", 22.0),                        // payload change -> U
        (3L, 2L, "D", null.asInstanceOf[String], 0.0),    // delete -> D
        (5L, 3L, "U", "new", 50.0),                       // insert -> I
        (4L, 4L, "U", "d", 40.0))                         // upsert to SAME payload -> no diff row
        .toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    // time travel: v0 is still the seed
    assert(Cdc.snapshotAt(spark, dir, 0).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == Seq(
        (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    val diff = Cdc.snapshotDiff(spark, dir, 0, 1).orderBy("k").collect()
    assert(diff.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "U"), (3L, "D"), (5L, "I")))
    // D rows carry NULL payload; U/I carry the to-side payload
    assert(diff(1).isNullAt(2) && diff(1).isNullAt(3))
    assert(diff(0).getString(2) == "b2" && diff(2).getDouble(3) == 50.0)
    // diff of a version with itself is empty (same manifest, zero buckets read)
    assert(Cdc.snapshotDiff(spark, dir, 1, 1).isEmpty)
  }

  test("mergeScoped rejects keys that don't match the snapshot's bucketing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_keys").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 4)
    val e = intercept[IllegalArgumentException] {
      Cdc.mergeScoped(
        Seq((1L, 1L, "U", "x", 1.0)).toDF("status", "seq", "op", "k", "price")
          .select(col("k"), col("seq"), col("op"), col("status"), col("price")),
        Seq("status"), "seq", "op", dir)
    }
    assert(e.getMessage.contains("bucketing keys"))
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
