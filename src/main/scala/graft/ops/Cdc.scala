package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
  */
object Cdc {

  /** Latest change per key by `seqCol` (strictly monotone per key —
    * CDC logs carry an LSN/offset with exactly that property). */
  def latestWins(changes: DataFrame, keys: Seq[String],
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Apply `changes` (op column: "U" upsert, "D" delete; any other value
    * rejected loudly) to `target`. Payload = every change column that is
    * not a key, the sequence, or the op. Target must carry the same
    * payload columns; extra target columns are preserved for kept rows
    * and NULL for inserts (schema evolution stays explicit). */
  def applyCdc(target: DataFrame, changes: DataFrame, keys: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
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
        if (payload.contains(c)) coalesce(col("_chg_" + c), col(c)).as(c)
        else col(c)
      }.toSeq: _*)
  }

  // -------------------------------------------------------------------------
  // Streaming MERGE: continuously maintain a parquet snapshot from a change
  // stream — the foreachBatch lakehouse-upsert pattern. Snapshots are
  // VERSIONED directories (v0, v1, ...): each micro-batch reads the latest
  // version and writes the next, so readers never observe a half-written
  // snapshot and a crashed batch leaves the previous version intact
  // (overwrite-in-place would not). Old versions are the caller's retention
  // policy to prune.
  // -------------------------------------------------------------------------

  private def latestVersion(spark: SparkSession,
      dir: String): Option[(Int, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap(s => "^v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
        .map(m => (m.group(1).toInt, s.getPath.toString)))
      .sortBy(-_._1).headOption
  }

  /** Seed the versioned snapshot (v0). */
  def initSnapshot(target: DataFrame, dir: String): Unit =
    target.write.mode("overwrite").parquet(s"$dir/v0")

  /** The current snapshot (what a reader consumes between merges). */
  def latestSnapshot(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(latestVersion(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no snapshot under $dir — call initSnapshot first"))._2)

  /** Retention: delete all but the newest `keep` snapshot versions.
    * Never deletes the latest (keep is clamped to >= 1); returns the
    * pruned version numbers. Run it from the maintenance cadence that
    * also compacts (Layout.compact) — unbounded version history is the
    * versioned-snapshot pattern's storage cost. */
  def pruneSnapshots(spark: SparkSession, dir: String, keep: Int): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val versions = fs.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap(s => "^v(\\d+)$".r.findFirstMatchIn(s.getPath.getName)
          .map(m => (m.group(1).toInt, s.getPath)))
        .sortBy(-_._1)
      versions.drop(math.max(1, keep)).map { case (v, path) =>
        fs.delete(path, true); v
      }
    }
  }

  /** Apply a STREAM of change records to the snapshot, one [[applyCdc]]
    * merge per micro-batch. Cross-batch ordering is arrival order (a CDC
    * feed's contract); within a batch latest-wins by `seqCol` as in the
    * batch operator. State is the snapshot itself — no streaming state
    * store, so an arbitrarily long feed maintains an arbitrarily large
    * table with per-batch cost O(snapshot + batch). */
  def applyCdcStream(changes: DataFrame, keys: Seq[String], seqCol: String,
      opCol: String, dir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // empty micro-batch (idle trigger tick) must not churn a new
        // identical version — ST2's no-op contract, applied to merges
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val (v, path) = latestVersion(s, dir).getOrElse(
            throw new IllegalStateException(
              s"no snapshot under $dir — call initSnapshot first"))
          applyCdc(s.read.parquet(path), batch.toDF(), keys, seqCol, opCol)
            .write.mode("overwrite").parquet(s"$dir/v${v + 1}")
        }
        ()
      }
      .start()
}
