package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
