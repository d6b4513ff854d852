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

  test("snapshotDiff preimages: _before_ columns carry the from-side " +
      "payload (NULL for inserts), enabling incremental aggregates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_pre").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 8)
    Cdc.mergeScoped(Seq(
        (2L, 1L, "U", "b2", 22.0),                     // U: before=(b,20)
        (3L, 2L, "D", null.asInstanceOf[String], 0.0), // D: before=(c,30)
        (5L, 3L, "U", "new", 50.0))                    // I: before=NULL
        .toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    val diff = Cdc.snapshotDiff(spark, dir, 0, 1, includeBefore = true)
      .orderBy("k").collect()
    assert(diff.map(_.getString(1)).toSeq == Seq("U", "D", "I"))
    // U row: postimage new, preimage old
    assert(diff(0).getString(2) == "b2" && diff(0).getString(4) == "b" &&
      diff(0).getDouble(5) == 20.0)
    // D row: postimage NULL, preimage = the deleted row
    assert(diff(1).isNullAt(2) && diff(1).getString(4) == "c" &&
      diff(1).getDouble(5) == 30.0)
    // I row: preimage NULL
    assert(diff(2).isNullAt(4) && diff(2).isNullAt(5))
    // incremental maintenance closes exactly: base + delta == recompute
    val baseSum = Cdc.snapshotAt(spark, dir, 0)
      .agg(sum(col("price"))).head.getDouble(0)
    val delta = diff.map { r =>
      (if (r.getString(1) != "I") -r.getDouble(5) else 0.0) +
        (if (r.getString(1) != "D") r.getDouble(3) else 0.0)
    }.sum
    val direct = Cdc.latestSnapshot(spark, dir)
      .agg(sum(col("price"))).head.getDouble(0)
    assert(math.abs(baseSum + delta - direct) < 1e-9)
    // default shape unchanged: no _before_ columns unless asked
    assert(!Cdc.snapshotDiff(spark, dir, 0, 1).columns.exists(_.startsWith("_before_")))
  }

  test("snapshotCount answers from manifest stats with ZERO data reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_cnt").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 8)
    assert(Cdc.snapshotCount(spark, dir) == 4L)
    Cdc.mergeScoped(Seq(
        (5L, 1L, "U", "new", 50.0),                     // insert
        (3L, 2L, "D", null.asInstanceOf[String], 0.0))  // delete
        .toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    assert(Cdc.snapshotCount(spark, dir) == 4L) // +1 -1
    assert(Cdc.snapshotCount(spark, dir, Some(0)) == 4L) // time travel
    // and it really is metadata-only: poison every parquet file, count
    // still answers (any data-path read would now explode)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
        .toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.write(f.toPath, Array[Byte](0, 1)))
    assert(Cdc.snapshotCount(spark, dir) == 4L)
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

  test("concurrent writers: exactly one commits a version, the loser " +
      "raises SnapshotCommitConflict and leaves nothing visible") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_race").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 4)
    val bA = Seq((1L, 1L, "U", "A", 1.0)).toDF("k", "seq", "op", "status", "price")
    val bB = Seq((2L, 1L, "U", "B", 2.0)).toDF("k", "seq", "op", "status", "price")
    // writer A stages v1 fully, then — in the window before its rename —
    // writer B commits v1 first (the deterministic two-writer interleave)
    @volatile var fired = false
    Cdc.commitFence = () =>
      if (!fired) { fired = true; Cdc.mergeScoped(bB, Seq("k"), "seq", "op", dir) }
    val e = try intercept[Cdc.SnapshotCommitConflict] {
      Cdc.mergeScoped(bA, Seq("k"), "seq", "op", dir)
    } finally Cdc.commitFence = () => ()
    assert(e.getMessage.contains("concurrent"))
    // the winner's commit is intact, the loser dropped loudly — no
    // partially-applied state, no silently lost buckets
    assert(Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == Seq(
        (1L, "a", 10.0), (2L, "B", 2.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // the losing attempt's staging directory was reclaimed
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_stage_")))
    // the standard OCC recovery: re-read and retry on top of the winner
    Cdc.mergeScoped(bA, Seq("k"), "seq", "op", dir)
    assert(Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().head == ((1L, "A", 1.0)))
  }

  test("mergeScoped: a stale expectedVersion token is refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_occ").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 4)
    val b1 = Seq((1L, 1L, "U", "x", 1.0)).toDF("k", "seq", "op", "status", "price")
    val b2 = Seq((2L, 1L, "U", "y", 2.0)).toDF("k", "seq", "op", "status", "price")
    Cdc.mergeScoped(b1, Seq("k"), "seq", "op", dir,
      expectedVersion = Some(0)) // fresh token: commits v1
    val e = intercept[Cdc.SnapshotCommitConflict] {
      Cdc.mergeScoped(b2, Seq("k"), "seq", "op", dir,
        expectedVersion = Some(0)) // stale: someone committed in between
    }
    assert(e.getMessage.contains("v0") && e.getMessage.contains("v1"))
    Cdc.mergeScoped(b2, Seq("k"), "seq", "op", dir,
      expectedVersion = Some(1)) // re-read, retry
    assert(Cdc.latestSnapshot(spark, dir).count() == 4)
  }

  test("pointLookup reads ONLY the owning bucket's files; empty buckets " +
      "and out-of-range probes read zero files") {
    val n = 8
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_pt").toString
    Cdc.initSnapshot(target, dir, Seq("k"), n)
    Cdc.mergeScoped(
      Seq((2L, 1L, "U", "b2", 22.0)).toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    // merged key: served from v1, from its single bucket directory
    val hit = Cdc.pointLookup(spark, dir, Seq(Seq(2L)))
    assert(hit.as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "b2", 22.0)))
    val b2 = bucketsOf(Seq(2L), n).head
    assert(hit.inputFiles.nonEmpty &&
      hit.inputFiles.forall(f => f.contains(s"/v1/bucket=$b2")))
    // untouched key: served from the SEED version's bucket only
    val b3 = bucketsOf(Seq(3L), n).head
    if (b3 != b2) {
      val hit3 = Cdc.pointLookup(spark, dir, Seq(Seq(3L)))
      assert(hit3.inputFiles.nonEmpty &&
        hit3.inputFiles.forall(f => f.contains(s"/v0/bucket=$b3")))
    }
    // a key routing to an EMPTY bucket: stats say rows=0, no file touched
    val occupied = bucketsOf(Seq(1L, 2L, 3L, 4L), n)
    val emptyKey = (10L to 500L)
      .find(k => !occupied.contains(bucketsOf(Seq(k), n).head)).get
    val miss = Cdc.pointLookup(spark, dir, Seq(Seq(emptyKey)))
    assert(miss.inputFiles.isEmpty && miss.count() == 0)
    // a probe far outside the bucket's key [min,max] but routing to an
    // OCCUPIED bucket: the manifest stats prune it to zero files even
    // though the bucket directory exists and has data
    val far = (1000000L to 1000500L)
      .find(k => occupied.contains(bucketsOf(Seq(k), n).head)).get
    val missFar = Cdc.pointLookup(spark, dir, Seq(Seq(far)))
    assert(missFar.inputFiles.isEmpty && missFar.count() == 0)
    // the manifest's row counts are the snapshot's free COUNT(*) metadata
    assert(Cdc.statsOf(spark, dir, 1).values.sum == 4L)
  }

  test("pointLookup routes COMPOSITE keys (long + string) exactly like " +
      "the layout's hash — one bucket read, strings stat-pruned") {
    val n = 16
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_ck").toString
    val t = (0L to 19L).map(k => (k, s"ex${k % 3}", k * 1.5))
      .toDF("k", "venue", "price")
    Cdc.initSnapshot(t, dir, Seq("k", "venue"), n)
    // the driver-side Murmur3 must CHAIN over both key columns in the
    // same order as hash(k, venue) — a seed-order mismatch would read a
    // wrong (likely empty) bucket and silently return nothing
    val hit = Cdc.pointLookup(spark, dir, Seq(Seq(7L, "ex1")))
    assert(hit.as[(Long, String, Double)].collect().toSeq ==
      Seq((7L, "ex1", 10.5)))
    val owning = t.where(col("k") === 7)
      .select(pmod(hash(col("k"), col("venue")), lit(n)).as("b"))
      .as[Int].head()
    assert(hit.inputFiles.nonEmpty &&
      hit.inputFiles.forall(_.contains(s"/v0/bucket=$owning")))
    // absent composite key: present k, wrong venue -> zero rows (and the
    // string min/max stats prune a venue far outside the domain)
    assert(Cdc.pointLookup(spark, dir, Seq(Seq(7L, "ex2"))).count() == 0)
    val far = Cdc.pointLookup(spark, dir, Seq(Seq(7L, "zzzz")))
    assert(far.count() == 0)
  }

  test("pointLookup stat-prunes TIMESTAMP- and DOUBLE-keyed snapshots: " +
      "out-of-range probes read zero files (typed bounds, not strings)") {
    import java.sql.Timestamp
    // timestamp key: bounds stored as epoch micros, so a probe a year out
    // of range must prune even though its ISO string would compare wrong
    val tsDir = java.nio.file.Files.createTempDirectory("graft_cdc_ts").toString
    val tsRows = (0 until 20)
      .map(i => (Timestamp.valueOf(f"2024-03-01 10:00:${i}%02d"), s"r$i"))
      .toDF("ts", "payload")
    Cdc.initSnapshot(tsRows, tsDir, Seq("ts"), 1) // ONE bucket: always occupied
    val tsHit = Cdc.pointLookup(spark, tsDir,
      Seq(Seq(Timestamp.valueOf("2024-03-01 10:00:07"))))
    assert(tsHit.as[(Timestamp, String)].collect().toSeq ==
      Seq((Timestamp.valueOf("2024-03-01 10:00:07"), "r7")))
    val tsMiss = Cdc.pointLookup(spark, tsDir,
      Seq(Seq(Timestamp.valueOf("2025-03-01 10:00:00"))))
    assert(tsMiss.inputFiles.isEmpty && tsMiss.count() == 0)
    // double key: bounds stored as sortable IEEE bits — "9.5" < "10.5"
    // numerically but not lexically, so a string encoding would both
    // wrongly admit and wrongly prune; the typed one does neither
    val dDir = java.nio.file.Files.createTempDirectory("graft_cdc_dbl").toString
    val dRows = Seq(9.5, 10.5, 120.25, -3.5).map(d => (d, s"p$d"))
      .toDF("price", "payload")
    Cdc.initSnapshot(dRows, dDir, Seq("price"), 1)
    assert(Cdc.pointLookup(spark, dDir, Seq(Seq(10.5)))
      .as[(Double, String)].collect().toSeq == Seq((10.5, "p10.5")))
    val inRangeMiss = Cdc.pointLookup(spark, dDir, Seq(Seq(50.0)))
    assert(inRangeMiss.count() == 0) // inside [min,max]: reads, finds none
    val dMiss = Cdc.pointLookup(spark, dDir, Seq(Seq(1000.0)))
    assert(dMiss.inputFiles.isEmpty && dMiss.count() == 0)
    val dMissLow = Cdc.pointLookup(spark, dDir, Seq(Seq(-99.0)))
    assert(dMissLow.inputFiles.isEmpty && dMissLow.count() == 0)
  }

  test("pointLookup FLOAT-keyed snapshot: probes equal to a bucket's " +
      "recorded min/max hit — probe encoding must widen exactly, " +
      "not via toString (r12 ADVICE regression)") {
    // 0.1f widens exactly to 0.100000001490116...; "0.1".toDouble parses
    // to 0.1 < that, so a toString round-trip in the probe encoder maps
    // the bucket's own MIN below the stored bound and silently prunes an
    // occupied bucket — the exact silent-row-drop this test pins
    val fDir = java.nio.file.Files.createTempDirectory("graft_cdc_flt").toString
    val fRows = Seq(0.1f, 0.7f, 55.3f).map(f => (f, s"p$f"))
      .toDF("price", "payload")
    Cdc.initSnapshot(fRows, fDir, Seq("price"), 1) // ONE bucket: occupied
    // probe == bucket min (the value whose widened/parsed doubles differ)
    val atMin = Cdc.pointLookup(spark, fDir, Seq(Seq(0.1f)))
    assert(atMin.as[(Float, String)].collect().toSeq == Seq((0.1f, "p0.1")))
    // probe == bucket max
    val atMax = Cdc.pointLookup(spark, fDir, Seq(Seq(55.3f)))
    assert(atMax.as[(Float, String)].collect().toSeq == Seq((55.3f, "p55.3")))
    // interior float: reads the bucket, finds its row
    assert(Cdc.pointLookup(spark, fDir, Seq(Seq(0.7f)))
      .count() == 1)
    // genuinely out-of-range float still prunes to zero files
    val fMiss = Cdc.pointLookup(spark, fDir, Seq(Seq(1000.5f)))
    assert(fMiss.inputFiles.isEmpty && fMiss.count() == 0)
  }

  test("mergeScoped: additive schema evolution — new payload column " +
      "null-backfills old buckets; type conflicts fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_evo").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 8)
    Cdc.mergeScoped(
      Seq((2L, 1L, "U", "b2", 22.0, "hello"))
        .toDF("k", "seq", "op", "status", "price", "note"),
      Seq("k"), "seq", "op", dir)
    val snap = Cdc.latestSnapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("k", "status", "price", "note"))
    assert(snap.orderBy("k")
      .as[(Long, String, Double, Option[String])].collect().toSeq == Seq(
        (1L, "a", 10.0, None), (2L, "b2", 22.0, Some("hello")),
        (3L, "c", 30.0, None), (4L, "d", 40.0, None)))
    // time travel keeps the pre-evolution shape
    assert(Cdc.snapshotAt(spark, dir, 0).columns.toSeq ==
      Seq("k", "status", "price"))
    // the change feed crosses the widening (from-side null-fills)
    val diff = Cdc.snapshotDiff(spark, dir, 0, 1)
    assert(diff.columns.contains("note") && diff.count() == 1)
    // a same-name column with a different type is a contract violation
    val e = intercept[IllegalArgumentException] {
      Cdc.mergeScoped(
        Seq((2L, 2L, "U", "x", "NaN-ish"))
          .toDF("k", "seq", "op", "status", "price"), // price arrives STRING
        Seq("k"), "seq", "op", dir)
    }
    assert(e.getMessage.contains("type conflict"))
  }

  test("mergeScoped aligns batch key TYPES to the snapshot's — an INT " +
      "batch key routes to the BIGINT hash's bucket") {
    val n = 8
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_kt").toString
    Cdc.initSnapshot(target, dir, Seq("k"), n)
    // k arrives as INT; hash(2:int) != hash(2L:bigint), so without the
    // alignment the manifest's touched set and the written bucket dirs
    // would disagree — silent data loss
    Cdc.mergeScoped(
      Seq((2, 1L, "U", "b2", 22.0)).toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    assert(bucketDirs(s"$dir/v1") == bucketsOf(Seq(2L), n))
    assert(Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == Seq(
        (1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("mergeScoped key-overflow guard fires the FRIENDLY error under " +
      "default ANSI mode — a LONG that doesn't fit an INT key never " +
      "wraps into a wrong bucket") {
    val n = 8
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_ovf").toString
    val intKeyed = Seq((1, "a"), (2, "b")).toDF("k", "status")
    Cdc.initSnapshot(intKeyed, dir, Seq("k"), n)
    val tooBig = Seq((Int.MaxValue.toLong + 7L, 1L, "U", "x"))
      .toDF("k", "seq", "op", "status")
    val e = intercept[Exception] {
      Cdc.mergeScoped(tooBig, Seq("k"), "seq", "op", dir)
    }
    // the guard's raise_error, not an opaque ANSI cast failure — and
    // never a silent integral wrap (which would route to a wrong bucket)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("does not fit")), msgs(e).mkString(" | "))
    // snapshot untouched — still v0
    assert(Cdc.latestSnapshot(spark, dir).count() == 2)
  }

  test("latestWins tolerates non-orderable payload types (map column)") {
    val changes = Seq((1L, 1L, "U", Map("a" -> 1)), (1L, 2L, "U", Map("b" -> 2)))
      .toDF("k", "seq", "op", "attrs")
    // maps can't sort — they must be skipped by the tie-break, not fail
    // the whole query at analysis time
    val out = Cdc.latestWins(changes, Seq("k"), "seq").collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
  }

  test("pruneSnapshots keeps versions referenced by ANY retained " +
      "manifest — retained time travel stays readable") {
    val n = 8
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_ret").toString
    Cdc.initSnapshot(target, dir, Seq("k"), n)
    // two merges touching DIFFERENT buckets, so v2's manifest references
    // v0, v1 and v2 all at once
    val k2 = (5L to 200L)
      .find(k => bucketsOf(Seq(k), n).head != bucketsOf(Seq(1L), n).head).get
    Cdc.mergeScoped(
      Seq((1L, 1L, "U", "a1", 11.0)).toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    Cdc.mergeScoped(
      Seq((k2, 2L, "U", "new", 1.0)).toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir)
    val v2Content = Cdc.snapshotAt(spark, dir, 2).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    Cdc.compactSnapshot(spark, dir) // v3 owns every bucket
    // keep=2 retains v3 AND v2; v2's buckets still live in v0/v1, so the
    // union-of-retained-manifests live set must spare them (the r9 bug:
    // live from the LATEST manifest only would reclaim v0/v1 here)
    assert(Cdc.pruneSnapshots(spark, dir, keep = 2).isEmpty)
    assert(Cdc.snapshotAt(spark, dir, 2).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == v2Content)
    // keep=1: only v3 retained, which owns everything — history reclaimed
    assert(Cdc.pruneSnapshots(spark, dir, keep = 1).toSet == Set(0, 1, 2))
    assert(Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == v2Content)
  }

  test("applyCdcStream: checkpoint restart resumes exactly where it " +
      "stopped; a crashed attempt's staging dir is invisible and swept") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_resume").toString
    val snap = s"$root/snap"; val chDir = s"$root/changes"
    val ckpt = s"$root/ckpt"
    Cdc.initSnapshot(target, snap, Seq("k"), 8)
    def addFile(row: (Long, Long, String, String, Double)): Unit =
      Seq(row).toDF("k", "seq", "op", "status", "price")
        .coalesce(1).write.mode("append").parquet(chDir)
    def stream() = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "k BIGINT, seq BIGINT, op STRING, status STRING, price DOUBLE"))
      .option("maxFilesPerTrigger", "1")
      .parquet(chDir)
    def versions(): Set[Int] =
      Option(new java.io.File(snap).listFiles()).getOrElse(Array.empty)
        .flatMap(f => "^v(\\d+)$".r.findFirstMatchIn(f.getName)
          .map(_.group(1).toInt)).toSet
    // run 1: two single-file micro-batches, then the query STOPS (the
    // "kill after batch 2 of 4" point — AvailableNow drains and exits)
    addFile((2L, 1L, "U", "b2", 22.0))
    addFile((5L, 1L, "U", "new", 50.0))
    Cdc.applyCdcStream(stream(), Seq("k"), "seq", "op", snap,
      checkpoint = Some(ckpt)).awaitTermination()
    assert(versions() == Set(0, 1, 2))
    // a writer that died mid-commit leaves only a staging dir: readers
    // never see it and the resumed stream is unaffected
    val dead = new java.io.File(s"$snap/_stage_v3_dead")
    assert(dead.mkdirs())
    java.nio.file.Files.writeString(dead.toPath.resolve("junk"), "crashed")
    assert(Cdc.latestSnapshot(spark, snap).count() == 5)
    // run 2: two more files arrive; the SAME checkpoint replays only them
    addFile((1L, 2L, "U", "a2", 11.0))
    addFile((5L, 2L, "D", null, 0.0))
    Cdc.applyCdcStream(stream(), Seq("k"), "seq", "op", snap,
      checkpoint = Some(ckpt)).awaitTermination()
    assert(versions() == Set(0, 1, 2, 3, 4))
    assert(Cdc.latestSnapshot(spark, snap).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == Seq(
        (1L, "a2", 11.0), (2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // run 3: nothing new — no batch fires, no version churn
    Cdc.applyCdcStream(stream(), Seq("k"), "seq", "op", snap,
      checkpoint = Some(ckpt)).awaitTermination()
    assert(versions() == Set(0, 1, 2, 3, 4))
    // retention sweeps the crashed staging dir (and nothing live)
    Cdc.pruneSnapshots(spark, snap, keep = 99)
    assert(!dead.exists())
    assert(versions() == Set(0, 1, 2, 3, 4))
  }

  test("replaying an already-applied batch is content-idempotent (the " +
      "crash-between-commit-and-checkpoint case)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_idem").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 8)
    val batch = Seq(
      (2L, 1L, "U", "b2", 22.0),
      (3L, 2L, "D", null.asInstanceOf[String], 0.0),
      (5L, 3L, "U", "new", 50.0))
      .toDF("k", "seq", "op", "status", "price")
    Cdc.mergeScoped(batch, Seq("k"), "seq", "op", dir)
    val once = Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    // the stream redoing a batch whose snapshot commit survived a crash:
    // re-upserts write the same values, the re-delete hits an absent key
    Cdc.mergeScoped(batch, Seq("k"), "seq", "op", dir)
    val twice = Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(twice == once)
    assert(Cdc.snapshotCount(spark, dir) == once.size.toLong)
  }

  test("applyCdcStream widens the schema when a new column arrives " +
      "mid-stream (additive evolution, streaming path)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_sevo").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 8)
    // the widened feed: same stream schema carries the new column; the
    // FIRST batch that actually delivers it widens the snapshot
    val in = MemoryStream[(Long, Long, String, String, Double, String)](spark)
    val q = Cdc.applyCdcStream(
      in.toDF().toDF("k", "seq", "op", "status", "price", "note"),
      Seq("k"), "seq", "op", dir,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      in.addData((2L, 1L, "U", "b2", 22.0, "annotated"))
      q.processAllAvailable()
    } finally q.stop()
    val snap = Cdc.latestSnapshot(spark, dir)
    assert(snap.columns.toSeq == Seq("k", "status", "price", "note"))
    assert(snap.orderBy("k")
      .as[(Long, String, Double, Option[String])].collect().toSeq == Seq(
        (1L, "a", 10.0, None), (2L, "b2", 22.0, Some("annotated")),
        (3L, "c", 30.0, None), (4L, "d", 40.0, None)))
  }

  test("rebucketSnapshot resizes the rewrite unit: merges, point lookups " +
      "and counts route with the new bucket count; history stays readable") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_rb").toString
    Cdc.initSnapshot(target, dir, Seq("k"), 2) // grown table, too-few buckets
    Cdc.mergeScoped(
      Seq((5L, 1L, "U", "new", 50.0)).toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir) // v1
    val before = Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    val rv = Cdc.rebucketSnapshot(spark, dir, 16) // v2
    // data identical, counts served from the new stats
    assert(Cdc.latestSnapshot(spark, dir).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq == before)
    assert(Cdc.snapshotCount(spark, dir) == 5L)
    // the new manifest routes by 16 buckets: the rewritten dirs are the
    // 16-bucket hash homes, and a point lookup reads exactly one of them
    assert(bucketDirs(s"$dir/v$rv") == bucketsOf(Seq(1L, 2L, 3L, 4L, 5L), 16))
    val hit = Cdc.pointLookup(spark, dir, Seq(Seq(5L)))
    assert(hit.as[(Long, String, Double)].collect().toSeq ==
      Seq((5L, "new", 50.0)))
    val b5 = bucketsOf(Seq(5L), 16).head
    assert(hit.inputFiles.forall(_.contains(s"/v$rv/bucket=$b5")))
    // merges after the resize route with 16 buckets too
    Cdc.mergeScoped(
      Seq((2L, 2L, "U", "b2", 22.0)).toDF("k", "seq", "op", "status", "price"),
      Seq("k"), "seq", "op", dir) // v3
    assert(bucketDirs(s"$dir/v${rv + 1}") == bucketsOf(Seq(2L), 16))
    // pre-resize versions time-travel with THEIR bucketing
    assert(Cdc.snapshotAt(spark, dir, 0).count() == 4)
    assert(Cdc.pointLookup(spark, dir, Seq(Seq(5L)), version = Some(1))
      .as[(Long, String, Double)].collect().toSeq == Seq((5L, "new", 50.0)))
    // diff across the bucketing boundary refuses loudly
    val e = intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(spark, dir, 1, rv)
    }
    assert(e.getMessage.contains("bucketing"))
    // diff within one bucketing era still works
    assert(Cdc.snapshotDiff(spark, dir, rv, rv + 1).count() == 1)
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

  test("X7p content fingerprint: order/partitioning independent, flips " +
      "on any single-row tamper") {
    val rows = (1L to 500L).map(i => (i, s"g${i % 3}", i * 7))
    val df = rows.toDF("k", "g", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      Cdc.contentFingerprint(d, Seq("g"), Seq("k", "g", "v"))
        .select($"g", $"n_rows", $"fingerprint")
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val base = fp(df)
    // row order and partitioning must not matter
    assert(fp(df.orderBy($"v".desc).repartition(7)) == base)
    // a one-row value tamper flips exactly that group's fingerprint
    val tampered = fp(df.withColumn("v",
      when($"k" === 123L, lit(0L)).otherwise($"v")))
    assert(tampered.map(_._2) == base.map(_._2), "counts unchanged")
    val diffs = base.zip(tampered).filter { case (a, b) => a._3 != b._3 }
    assert(diffs.map(_._1._1) == Seq("g0"), // 123 % 3 == 0
      s"exactly group g0 must flip, got ${diffs.map(_._1._1)}")
    // a dropped row flips too (count and fingerprint)
    val dropped = fp(df.filter($"k" =!= 123L))
    assert(dropped.find(_._1 == "g0").get._3 !=
      base.find(_._1 == "g0").get._3)
  }
}
