package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.schema.Transition

/** O-ST1 — job lifecycle state machine (reference main.py:293-353, codes in
  * README.md:4-10: 1000 new -> 1001 claimed -> 1100 processing -> 1200
  * downloaded -> 1300 imported; any failure -> 1900).
  *
  * The reference advances state via blocking, unacknowledged HTTP PUTs —
  * at-most-once, one job in flight. Re-expressed for Spark: transitions are
  * an append-only log `(job_id, action, ts)`; "current state" is a window
  * view over the log. Append-only logs parallelize trivially and make the
  * at-least-once duplicate problem explicit (dedup by (job_id, ts)).
  */
object StateMachine {

  /** Current state per job: the action of the latest transition, latest by
    * (ts, tieBreak) so the view is deterministic under ts collisions. */
  def currentState(log: DataFrame, tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col("job_id"))
      .orderBy(col("ts").desc, col(tieBreak).desc)
    log.withColumn("rn", row_number().over(w))
      .withColumn("n_transitions",
        count(lit(1)).over(Window.partitionBy(col("job_id"))))
      .filter(col("rn") === 1)
      .select(col("job_id"), col("action").as("current_action"),
        col("n_transitions"))
  }

  /** Flag transitions that are illegal per the reference's lifecycle
    * (e.g. 1300 -> anything). Uses lag() over the per-job ordered log. */
  def illegalTransitions(log: DataFrame, tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col("job_id"))
      .orderBy(col("ts"), col(tieBreak))
    val legal = Transition.legal.toSeq.flatMap { case (from, tos) =>
      tos.map(to => (from, to))
    }
    val legalDf = log.sparkSession.createDataFrame(legal)
      .toDF("from_action", "to_action")
    log.withColumn("prev_action", lag(col("action"), 1).over(w))
      .filter(col("prev_action").isNotNull)
      .join(broadcast(legalDf),
        col("prev_action") === col("from_action") &&
          col("action") === col("to_action"), "left_anti")
      .select(col("job_id"), col("prev_action"), col("action"), col("ts"))
  }
}
