package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import graft.functions.BloomKeyFilter

/** X7 — runtime join pruning (semi-join reduction via Bloom filter).
  *
  * The scale problem: a selective dimension/build side should keep the
  * fact scan from shuffling rows that can never join — at 100 TB the
  * shuffle of doomed probe rows IS the job cost. The standard fix is a
  * Bloom filter of the build keys applied at the probe scan, which Spark
  * itself only injects under narrow conditions (shuffle-join + cost
  * heuristics). This operator makes the pattern explicit and composable:
  *
  *  1. [[keyBloom]] — one distributed pass over the build keys
  *     (`stat.bloomFilter` runs a treeAggregate; no row ever reaches the
  *     driver, only partial sketches get merged there — same shape as
  *     Spark's own runtime-filter subquery).
  *  2. [[pruneByBloom]] — a codegen'd membership probe
  *     (functions.BloomKeyFilter) directly on the fact scan, BEFORE the
  *     join shuffle. No false negatives, so correctness is untouched as
  *     long as the exact join still runs downstream; false positives
  *     (rate `fpp`) just ride along and are dropped by the join.
  *
  * The sketch size is bits-per-key ~ 1.44·log2(1/fpp): 1M keys at 3% fpp
  * is ~0.9 MB — broadcast-trivial next to shuffling a fact table. */
object RuntimeFilter {

  /** Build a serialized Bloom filter over `keyCol` (integral) of `keys`.
    * `expectedItems` sizes the bitset — overestimate freely (wasted bits
    * are cheap; an undersized filter degrades fpp, never correctness). */
  def keyBloom(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.03): Array[Byte] =
    BloomKeyFilter.serialize(keys.stat.bloomFilter(keyCol, expectedItems, fpp))

  /** Membership-probe Column over a serialized sketch. */
  def bloomContains(key: Column, bloomBytes: Array[Byte]): Column =
    GraftSqlShim.column(BloomKeyFilter(
      GraftSqlShim.expression(key),
      Literal.create(bloomBytes, BinaryType)))

  /** `facts` restricted to rows whose `factKey` might be in the sketch —
    * the pre-shuffle prune. Narrow, codegen'd, pushdown-adjacent (it sits
    * directly on the scan, so only surviving rows reach the join
    * exchange). */
  def pruneByBloom(facts: DataFrame, factKey: String,
      bloomBytes: Array[Byte]): DataFrame =
    facts.filter(bloomContains(col(factKey), bloomBytes))
}
