package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, StructType}

/** X7 — CDC / MERGE: apply a change log (upserts + deletes) to a snapshot.
  *
  * The reference's job table mutates via per-row HTTP PUTs
  * (`main.py:186-205`); the batch-engine equivalent is the lakehouse MERGE:
  * given a target snapshot and a stream of keyed change records, produce
  * the next snapshot. Two stages, both shuffle-bounded by the key:
  *
  *  1. [[latestWins]] — collapse the change log to one winning record per
  *     key (max sequence number). One window over the key — the change log
  *     may carry many versions of a hot key; nothing downstream sees more
  *     than one.
  *  2. [[applyCdc]] — ONE full-outer equi-join of target against the
  *     collapsed log: delete drops the row, update/insert takes the change
  *     payload, untouched keys keep the target payload. No per-row
  *     point lookups, no driver loop — the 100 TB shape is exactly this
  *     join, co-partitionable with a bucketed target (see
  *     Scale.writeBucketed) so routine merges don't even shuffle the
  *     target side.
  *
  * The CONTINUOUS form ([[applyCdcStream]]) is KEY-SCOPED: the snapshot is
  * stored hash-partitioned on the merge key (`bucket = pmod(hash(keys), N)`
  * as a Hive partition column) and each micro-batch rewrites ONLY the
  * buckets its keys fall into. Untouched buckets are never rewritten — the
  * new version's manifest keeps pointing at the older version's files —
  * so per-batch bytes written are proportional to TOUCHED KEYS, not table
  * size. That is the property that lets a minutes-cadence merge maintain a
  * 100 TB table (a full-snapshot rewrite per batch would re-write 100 TB
  * per merge); it is the same data-file-reuse idea Delta/Iceberg/Hudi
  * snapshots are built on, expressed with nothing but parquet directories
  * and one JSON manifest.
  */
object Cdc {

  /** Latest change per key by `seqCol` (strictly monotone per key —
    * CDC logs carry an LSN/offset with exactly that property).
    *
    * A malformed log CAN carry two records sharing (key, seq); the window
    * therefore adds every remaining column (name-sorted, descending,
    * nulls last) as a deterministic tie-break, so a replay — or the
    * DuckDB oracle — can never pick a different winner than this engine
    * did. The tie-break never fires on a well-formed log. */
  def latestWins(changes: DataFrame, keys: Seq[String],
      seqCol: String): DataFrame = {
    val tieBreak = changes.columns
      .filterNot(c => keys.contains(c) || c == seqCol).sorted
      .map(col(_).desc_nulls_last)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc +: tieBreak: _*)
    changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Apply `changes` (op column: "U" upsert, "D" delete; any other value
    * rejected loudly) to `target`. Payload = every change column that is
    * not a key, the sequence, or the op. Target must carry the same
    * payload columns; extra target columns are preserved for kept rows
    * and NULL for inserts (schema evolution stays explicit).
    *
    * NULL-payload contract: with `partialUpdate = true` (the default) a
    * NULL in a change payload column means "leave the target value" —
    * the coalesce-based PARTIAL update a sparse feed (the reference's
    * per-field PUTs) wants, and it follows that an upsert can never SET a
    * column to NULL. Feeds that legitimately null fields must use
    * `partialUpdate = false`, where the winning change row replaces the
    * whole payload verbatim (standard Delta/Iceberg MERGE semantics) and
    * NULL means NULL. This is a semantic switch, not a repair: pick per
    * feed, once. */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String,
      partialUpdate: Boolean = true): DataFrame = {
    val meta = keys ++ Seq(seqCol, opCol)
    val payload = changes.columns.filterNot(meta.contains)
    require(payload.forall(target.columns.contains),
      s"target is missing change payload columns: " +
        payload.filterNot(target.columns.contains).mkString(", "))
    val latest = latestWins(changes, keys, seqCol)
      .select(keys.map(col) ++
        (opCol +: payload.toSeq).map(c => col(c).as("_chg_" + c)): _*)
    val op = col("_chg_" + opCol)
    // keep = no change or upsert; delete drops (incl. delete-of-absent);
    // any other op code is a corrupt log — fail the job, don't guess
    val keep = when(op.isNull || op.isin("U", "D"), op.isNull || op === "U")
      .otherwise(raise_error(concat(lit("applyCdc: unknown op: "), op))
        .cast("boolean"))
    target.join(latest, keys, "full_outer")
      .filter(keep)
      .select(target.columns.map { c =>
        if (!payload.contains(c)) col(c)
        else if (partialUpdate) coalesce(col("_chg_" + c), col(c)).as(c)
        // full-row: the change row wins verbatim wherever a change exists
        // (op is non-null exactly on changed keys), NULLs included
        else when(op.isNotNull, col("_chg_" + c)).otherwise(col(c)).as(c)
      }.toSeq: _*)
  }

  // ---------------------------------------------------------------------
  // Key-scoped versioned snapshot
  //
  //   dir/v0/bucket=0/...parquet     (seed: every bucket)
  //   dir/v0/_MANIFEST.json
  //   dir/v1/bucket=3/...parquet     (merge 1: ONLY the touched buckets)
  //   dir/v1/_MANIFEST.json          {"buckets":{"0":0,...,"3":1,...}}
  //
  // The manifest maps every bucket to the version directory holding its
  // current files; it is written LAST (tmp + atomic rename), so it is the
  // commit point — a crashed batch leaves a version directory without a
  // manifest, which every reader and the next merge ignore/overwrite.
  // Readers resolve the latest manifest and read each bucket from its
  // owning version; untouched buckets are THE SAME physical files across
  // versions (never copied), which is what makes per-merge write cost
  // O(touched buckets) instead of O(table).
  // ---------------------------------------------------------------------

  private final case class Manifest(nBuckets: Int, schemaDdl: String,
      keys: Seq[String], buckets: Map[Int, Int])

  private def hadoopFs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The snapshot's partitioning function: which bucket a key lives in.
    * Spark's `hash` is seed-42 Murmur3 — deterministic across runs and
    * clusters, so the same key always routes to the same directory. */
  private def bucketOf(keys: Seq[String], nBuckets: Int): Column =
    pmod(hash(keys.map(col): _*), lit(nBuckets))

  private def jsonEsc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def writeManifest(spark: SparkSession, dir: String, version: Int,
      m: Manifest): Unit = {
    val body = s"""{"nBuckets":${m.nBuckets},""" +
      s""""schema":"${jsonEsc(m.schemaDdl)}",""" +
      m.keys.map(k => s""""${jsonEsc(k)}"""")
        .mkString(""""keys":[""", ",", "],") +
      m.buckets.toSeq.sortBy(_._1)
        .map { case (b, v) => s""""$b":$v""" }
        .mkString(""""buckets":{""", ",", "}}")
    val fs = hadoopFs(spark, dir)
    val tmp = new Path(s"$dir/v$version/_MANIFEST.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$dir/v$version/_MANIFEST.json")
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"manifest commit failed for $dst")
  }

  private def readManifest(spark: SparkSession, dir: String,
      version: Int): Manifest = {
    val fs = hadoopFs(spark, dir)
    val in = fs.open(new Path(s"$dir/v$version/_MANIFEST.json"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    val jv = org.json4s.jackson.JsonMethods.parse(text)
    Manifest(
      (jv \ "nBuckets").extract[Int],
      (jv \ "schema").extract[String],
      (jv \ "keys").extract[Seq[String]],
      (jv \ "buckets").extract[Map[String, Int]]
        .map { case (k, v) => k.toInt -> v })
  }

  /** Highest version with a COMMITTED manifest (crashed, manifest-less
    * attempts are invisible). */
  private def latestVersion(spark: SparkSession,
      dir: String): Option[Int] = {
    val p = new Path(dir)
    val fs = hadoopFs(spark, dir)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap(s => "^v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toInt))
      .filter(v => fs.exists(new Path(s"$dir/v$v/_MANIFEST.json")))
      .sorted.lastOption
  }

  private def requireVersion(spark: SparkSession, dir: String): Int =
    latestVersion(spark, dir).getOrElse(throw new IllegalStateException(
      s"no committed snapshot under $dir — call initSnapshot first"))

  /** One version directory's rows for `buckets`, schema pinned from the
    * manifest (an explicit schema also makes a version whose touched
    * buckets all emptied out — a legal all-deletes merge — readable). */
  private def readBuckets(spark: SparkSession, dir: String, version: Int,
      schemaDdl: String, buckets: Seq[Int]): DataFrame =
    spark.read
      .schema(StructType.fromDDL(schemaDdl).add("bucket", IntegerType))
      .parquet(s"$dir/v$version")
      .filter(col("bucket").isin(buckets: _*))

  /** Seed the snapshot: every row routed to its key bucket, all buckets
    * owned by v0. `nBuckets` is fixed for the snapshot's lifetime (it is
    * the unit of rewrite — size it so a bucket is a few files: touched-
    * bucket rewrite cost scales with table/nBuckets). */
  def initSnapshot(target: DataFrame, dir: String, keys: Seq[String],
      nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = target.sparkSession
    target.withColumn("bucket", bucketOf(keys, nBuckets))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/v0")
    writeManifest(spark, dir, 0,
      Manifest(nBuckets, target.schema.toDDL, keys,
        (0 until nBuckets).map(_ -> 0).toMap))
  }

  /** The current snapshot (what a reader consumes between merges): each
    * bucket read from the version that last rewrote it — at most one
    * parquet load per distinct live version, partition-pruned to its
    * buckets. */
  def latestSnapshot(spark: SparkSession, dir: String): DataFrame =
    snapshotAt(spark, dir, requireVersion(spark, dir))

  /** Time travel: the snapshot as of `version` — every committed version
    * keeps its own complete manifest, so any un-pruned version resolves
    * the same way the latest does. Retention ([[pruneSnapshots]]) is what
    * bounds how far back this reaches. */
  def snapshotAt(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val m = readManifest(spark, dir, version)
    m.buckets.groupBy(_._2).view.mapValues(_.keys.toSeq).toSeq
      .map { case (ver, bs) => readBuckets(spark, dir, ver, m.schemaDdl, bs) }
      .reduce(_.unionByName(_))
      .drop("bucket")
  }

  /** Change-data-feed between two snapshot versions: one row per key
    * whose state differs, labeled `change_op` I (inserted), U (payload
    * changed), or D (deleted), carrying the TO-side payload (NULL for
    * deletes). Unchanged keys emit nothing.
    *
    * The manifest makes this proportional to CHANGE, not table size:
    * a bucket whose owning version is the same in both manifests points
    * at the same physical files — identical by construction, skipped
    * without reading a byte. Only buckets that were rewritten between
    * the two versions are scanned and full-outer-joined (on the
    * manifest's own merge keys, null-safe payload compare). */
  def snapshotDiff(spark: SparkSession, dir: String, fromVersion: Int,
      toVersion: Int): DataFrame = {
    val mf = readManifest(spark, dir, fromVersion)
    val mt = readManifest(spark, dir, toVersion)
    require(mf.nBuckets == mt.nBuckets && mf.keys == mt.keys,
      s"snapshots $fromVersion and $toVersion do not share bucketing " +
        s"(${mf.nBuckets}/${mf.keys} vs ${mt.nBuckets}/${mt.keys})")
    val changed = mf.buckets.collect {
      case (b, vFrom) if mt.buckets(b) != vFrom => b
    }.toSeq.sorted
    val schema = StructType.fromDDL(mf.schemaDdl)
    val payload = schema.fieldNames.filterNot(mf.keys.contains).toSeq
    def side(m: Manifest, tag: String): DataFrame =
      m.buckets.view.filterKeys(changed.contains).toSeq
        .groupBy(_._2).view.mapValues(_.map(_._1)).toSeq
        .map { case (ver, bs) => readBuckets(spark, dir, ver, m.schemaDdl, bs) }
        .reduceOption(_.unionByName(_))
        .getOrElse(spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType.fromDDL(m.schemaDdl).add("bucket", IntegerType)))
        .drop("bucket")
        .select(mf.keys.map(col) ++
          payload.map(c => col(c).as(s"_${tag}_$c")): _*)
    // presence markers: NULL payload alone can't distinguish "absent key"
    // from "present with NULL payload", a constant column can
    val f = side(mf, "f").withColumn("_f_present", lit(1))
    val t = side(mt, "t").withColumn("_t_present", lit(1))
    val both = f.join(t, mf.keys.toSeq, "full_outer")
    val changedPayload = payload
      .map(c => !(col(s"_f_$c") <=> col(s"_t_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    both
      .withColumn("change_op",
        when(col("_f_present").isNull, "I")
          .when(col("_t_present").isNull, "D")
          .when(changedPayload, "U"))
      .filter(col("change_op").isNotNull)
      .select(mf.keys.map(col) ++ Seq(col("change_op")) ++
        payload.map(c => col(s"_t_$c").as(c)): _*)
  }

  /** ONE key-scoped merge: route the batch's keys to buckets, read ONLY
    * those buckets of the current snapshot, [[applyCdc]], write the merged
    * buckets as v(N+1), commit a manifest that points the touched buckets
    * at v(N+1) and everything else at wherever it already lives.
    *
    * Per-batch cost: read+write of touched buckets + the batch itself —
    * independent of table size when the batch's key spread is. The touched
    * set is driver metadata bounded by nBuckets (it IS the partition
    * pruning list), never the data. */
  def mergeScoped(batch: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String, dir: String, partialUpdate: Boolean = true): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val v = requireVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    // the snapshot's bucketing is a function of ITS keys; merging by any
    // other key would route rows to wrong directories and corrupt every
    // later partition-pruned read — fail at the first batch, loudly
    require(keys == m.keys,
      s"merge keys $keys do not match the snapshot's bucketing keys " +
        s"${m.keys} under $dir")
    val touched = batch.select(bucketOf(keys, m.nBuckets).as("bucket"))
      .distinct().as[Int].head(m.nBuckets).toSeq.sorted
    if (touched.nonEmpty) {
      val target = m.buckets.view.filterKeys(touched.contains).toSeq
        .groupBy(_._2).view.mapValues(_.map(_._1)).toSeq
        .map { case (ver, bs) =>
          readBuckets(spark, dir, ver, m.schemaDdl, bs) }
        .reduce(_.unionByName(_))
        .drop("bucket")
      val newV = v + 1
      // repartition by bucket so each touched bucket lands as one writer's
      // files (read amplification beats the one extra shuffle of TOUCHED
      // data; without it every join task writes a sliver into every bucket)
      applyCdc(target, batch, keys, seqCol, opCol, partialUpdate)
        .withColumn("bucket", bucketOf(keys, m.nBuckets))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/v$newV")
      writeManifest(spark, dir, newV,
        m.copy(buckets = m.buckets ++ touched.map(_ -> newV)))
    }
  }

  /** Retention: delete snapshot versions that are (a) older than the
    * newest `keep` (clamped to >= 1) and (b) not referenced by the latest
    * manifest — referenced versions still HOLD live buckets and are never
    * deleted regardless of age (that is the cost of file reuse; run
    * [[compactSnapshot]] first to re-own every bucket and make history
    * prunable). Returns pruned version numbers, newest first. */
  def pruneSnapshots(spark: SparkSession, dir: String, keep: Int): Seq[Int] = {
    latestVersion(spark, dir) match {
      case None => Seq.empty
      case Some(latest) =>
        val live = readManifest(spark, dir, latest).buckets.values.toSet + latest
        val fs = hadoopFs(spark, dir)
        val versions = fs.listStatus(new Path(dir)).toSeq.filter(_.isDirectory)
          .flatMap(s => "^v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
            .map(m => (m.group(1).toInt, s.getPath)))
          .sortBy(-_._1)
        versions.drop(math.max(1, keep))
          .filterNot { case (v, _) => live.contains(v) }
          .map { case (v, path) => fs.delete(path, true); v }
    }
  }

  /** Maintenance rewrite: fold every live bucket into one fresh version so
    * older versions hold no live data and [[pruneSnapshots]] can reclaim
    * them. The one deliberately O(table) operation — run it on the same
    * cadence as Layout.compact, not per batch. */
  def compactSnapshot(spark: SparkSession, dir: String): Int = {
    val v = requireVersion(spark, dir)
    val m = readManifest(spark, dir, v)
    val newV = v + 1
    // bucket routing is stable (same keys, same nBuckets), so this is a
    // straight re-ownership rewrite — the partition column rides along
    m.buckets.groupBy(_._2).view.mapValues(_.keys.toSeq).toSeq
      .map { case (ver, bs) => readBuckets(spark, dir, ver, m.schemaDdl, bs) }
      .reduce(_.unionByName(_))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/v$newV")
    writeManifest(spark, dir, newV,
      m.copy(buckets = m.buckets.keys.map(_ -> newV).toMap))
    newV
  }

  /** Apply a STREAM of change records to the snapshot, one [[mergeScoped]]
    * merge per micro-batch. Cross-batch ordering is arrival order (a CDC
    * feed's contract); within a batch latest-wins by `seqCol` as in the
    * batch operator. State is the snapshot itself — no streaming state
    * store — and per-batch write cost is proportional to the batch's key
    * spread (touched buckets), NOT table size. */
  def applyCdcStream(changes: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String, dir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // empty micro-batch (idle trigger tick) must not churn a new
        // identical version — ST2's no-op contract, applied to merges
        // (mergeScoped's empty-touched guard covers it, isEmpty avoids
        // even the manifest read)
        if (!batch.isEmpty)
          mergeScoped(batch.toDF(), keys, seqCol, opCol, dir)
        ()
      }
      .start()
}
