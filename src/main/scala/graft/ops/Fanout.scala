package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Full-parallelism partitioning for a frame about to FAN OUT through a
  * self-join (wedge/pair enumeration's d² expansion) — the round-18 AQE
  * lesson, shared by [[Graph]] (wedges) and [[Basket]] (basket pairs).
  *
  * AQE sizes an exchange from the bytes flowing INTO it, so a few-MB
  * adjacency/basket frame gets coalesced to 1-2 partitions and the
  * million-fold expansion on the far side of the exchange runs nearly
  * serial (measured on x10_linkpred at sf0.1: the whole 60M-wedge stage
  * on 2 of 32 cores — 20 s of CPU in a 2-way stage WAS the 14.5 s lane
  * wall; ~3.7 s with this partitioning). A user repartition with an
  * EXPLICIT partition count is exempt from AQE coalescing, but keeping
  * it in the final plan takes care on two fronts:
  * PushDownLeftSemiAntiJoin re-orders adjacent semi-joins below it, and
  * EnsureRequirements elides it as redundant whenever the child already
  * carries a compatible (coalescible!) ENSURE_REQUIREMENTS
  * partitioning. Hence: checkpoint first — a scan with unknown
  * partitioning that nothing can push through or elide against — then
  * the numbered repartition directly on the scan. All self-join sides
  * derived from the result reuse the ONE non-coalescible exchange, so
  * no coalescible boundary exists below the expansion. The checkpoint
  * cost is one materialization of the (small, pre-expansion) frame.
  *
  * At cluster scale the same plan holds: the expansion stage inherits
  * the session's configured shuffle parallelism instead of whatever
  * AQE derived from the pre-expansion byte count. */
private[ops] object Fanout {

  /** [[byKey]] minus the checkpoint — for callers whose frame is
    * ALREADY a checkpoint/scan with unknown partitioning (adding a
    * second checkpoint would re-materialize for nothing). */
  def byKeyNoCheckpoint(df: DataFrame, key: String): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, col(key))

  def byKey(df: DataFrame, key: String): DataFrame =
    byKeyNoCheckpoint(df.localCheckpoint(eager = false), key)
}
