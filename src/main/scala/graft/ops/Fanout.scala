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
    * second checkpoint would re-materialize for nothing), or whose
    * child partitioning is known incompatible (nothing to elide
    * against). Multi-key for (s, v)-style composite join keys. */
  def byKeyNoCheckpoint(df: DataFrame, keys: String*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions,
      keys.map(col): _*)

  def byKey(df: DataFrame, keys: String*): DataFrame =
    byKeyNoCheckpoint(df.localCheckpoint(eager = false), keys: _*)

  /** STATIC-FRAME PINNING for iterative operators (round 18): the frame
    * an iteration joins every round (edge list, vote list), partitioned
    * on the round-join key and `persist()`ed.
    *
    * Why persist and not localCheckpoint: a checkpoint's LogicalRDD
    * reports UnknownPartitioning(0) under AQE — measured this round on
    * Spark 4.1 with BOTH eager settings — so the long-standing
    * "checkpoint captures HashPartitioning(src), rounds exchange only
    * the small frame" discipline never actually held in the plans: every
    * round's join re-exchanged the static frame (ENSURE_REQUIREMENTS,
    * and therefore also AQE-coalescible — the narrow+hot per-round
    * stages StageAudit flags). An InMemoryRelation, by contrast,
    * preserves its child plan's outputPartitioning, and the child here
    * ends in a REPARTITION_BY_NUM exchange AQE cannot coalesce: each
    * round's join reads the cache co-partitioned at full parallelism,
    * exchanging nothing but the small evolving frame.
    *
    * Storage: default MEMORY_AND_DISK — the frame spills rather than
    * evicts under pressure, and at cluster scale the cache is exactly
    * the working set an iterative graph op needs resident. The cache
    * lives for the session (callers' results reference it lazily;
    * unpersisting inside the operator would silently recompute the
    * lineage on the caller's first action). */
  def pinned(df: DataFrame, keys: String*): DataFrame =
    byKeyNoCheckpoint(df, keys: _*).persist()
}
