package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X12 — market-basket co-occurrence mining: frequent item pairs and
  * association rules (support / confidence / lift) over a basket table.
  *
  * The downloader's trade rows group naturally into baskets (an order's
  * line items); the corpus-curation analogue is co-occurrence of
  * entities/domains within a document. Either way the operator is the
  * same: which items appear together more often than chance?
  *
  * Scale shape — the same cap-before-materialize discipline as
  * [[Dedup]] and [[Graph.coSupplyEdges]]:
  *   1. per-basket DISTINCT items (one basket-keyed shuffle; multiple
  *      lines of the same item in one basket count once);
  *   2. baskets larger than `maxBasket` are dropped LOUDLY before the
  *      pair fan-out (a k-item basket emits k·(k−1)/2 pairs — the cap
  *      bounds the explosion, and a retail basket or document entity
  *      set has a natural contract size);
  *   3. the within-basket pair self-join is an EQUI-join on basket id
  *      (never corpus²), and the (a, b) pair aggregate is bounded by
  *      |items|², not by row count — map-side combined;
  *   4. item supports ride a broadcast back onto the pair frame.
  *
  * All metrics exact integers: support counts are BIGINTs; confidence
  * = n_ab·10^6 div n_a (ppm); lift = n_ab·N·10^6 div (n_a·n_b) (ppm,
  * >10^6 means positive association). Overflow headroom: n_ab·N·10^6
  * needs n_ab·N < 9.2·10^12 — at 10^6 baskets that allows n_ab up to
  * ~9·10^6, always true since n_ab ≤ N; at larger corpora lift drops
  * to a pinned floored double, which the scaladoc declares.
  */
object Basket {

  /** Per-basket distinct items, baskets capped at `maxBasket` items.
    *
    * The ONE exchange is a numbered (bk, item) repartition at the head
    * (round 19 reshape of the r18 bk-only form, r18 ADVICE): hashing on
    * the FULL distinct key spreads a hot basket's rows across the
    * cluster for the dedup, where the bk-only form concentrated every
    * row of a mega-basket in one task — and a basket far above
    * `maxBasket` flowed through that single-task distinct before the
    * cap dropped it. Downstream from the spread distinct, nothing ever
    * re-concentrates an over-cap basket:
    *   - basket sizes partial-aggregate map-side (hash(bk, item) does
    *     not satisfy groupBy(bk), so Spark inserts a partial count —
    *     the per-bk shuffle rows are one per (partition, bk), bounded);
    *   - the cap filter applies as a broadcast ANTI join against the
    *     OVER-cap basket list, which is broadcast-small by contract
    *     (the cap names pathological baskets; a corpus where most
    *     baskets exceed it is misconfigured input — the old ok-list
    *     semi join would ship a mega-basket's rows to one partition
    *     just to drop them there);
    *   - the pair fan-out's bk-keyed numbered repartition happens
    *     AFTER the cap (in pairsFromItems), over a frame whose
    *     per-basket row count is ≤ maxBasket by construction.
    * The numbered repartition is still AQE-coalesce-exempt, so the
    * distinct runs at full width (the round-18 StageAudit lesson); the
    * checkpoint caches at that width. */
  /** Ceiling on the over-cap basket list that rides the broadcast anti
    * join below: past this many over-cap baskets the input is
    * misconfigured (the cap names PATHOLOGICAL baskets), and the guard
    * raises a descriptive error instead of letting an unbounded
    * broadcast OOM the driver (round 20, r19 ADVICE). 2^22 bk keys ≈
    * 32 MB broadcast-side — comfortably broadcast-class, loudly not a
    * corpus-shaped list. */
  private val OverCapBroadcastCeiling: Long = 1L << 22

  private def basketItems(rows: DataFrame, basketCol: String,
      itemCol: String, maxBasket: Int): DataFrame = {
    val items = Fanout.byKeyNoCheckpoint(
        rows.select(col(basketCol).as("bk"), col(itemCol).as("item"))
          // NULL keys out FIRST (round 20, r19 ADVICE): the r19
          // semi→anti reshape would otherwise RETAIN null-bk rows (NULL
          // never matches an anti join, so the cap could never drop
          // them) while count_distinct(bk) excludes them from
          // n_baskets — inflating supports against a population that
          // doesn't contain them. A null basket id or null item is
          // membership noise, not a basket; both sides agree it's out.
          .filter(col(basketCol).isNotNull && col(itemCol).isNotNull),
        "bk", "item")
      .distinct()
    val bad = items.groupBy(col("bk"))
      .agg(count(lit(1)).as("sz"))
      .filter(col("sz") > maxBasket)
      // the broadcast-small-by-contract assumption, ENFORCED lazily
      // (no driver-side count() — the query constructor stays
      // action-free): a whole-frame window counts the over-cap list
      // and a FILTER (survives column pruning, unlike a projected
      // guard column) raises past the ceiling. The single-partition
      // window only ever sees over-cap baskets — tiny by contract,
      // and when the contract breaks it spills executor-side then
      // fails loudly, never OOMs the driver mid-broadcast.
      .withColumn("_n_overcap", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .filter(when(col("_n_overcap") <= lit(OverCapBroadcastCeiling),
          lit(true))
        .otherwise(raise_error(concat(
          lit("Basket: over-cap basket list has "), col("_n_overcap"),
          lit(s" entries (> ceiling $OverCapBroadcastCeiling with " +
            s"maxBasket=$maxBasket) — not broadcast-class; the input " +
            "is misconfigured for this cap"))).cast("boolean")))
      .select(col("bk"))
    items.join(broadcast(bad), Seq("bk"), "left_anti")
      .localCheckpoint(eager = false)
  }

  private def pairsFromItems(items: DataFrame,
      minSupport: Long): DataFrame = {
    // [[Fanout]] (round 18): the within-basket pair self-join is the
    // k²/2 expansion AQE's coalescer must not see through — the items
    // frame is a few MB, the pair fan-out is not. `items` arrives
    // already checkpointed from basketItems, so only the numbered
    // repartition is added.
    val fanned = Fanout.byKeyNoCheckpoint(items, "bk")
    fanned.as("x")
      .join(fanned.as("y"),
        col("x.bk") === col("y.bk") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("a"), col("y.item").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
  }

  /** Ordered item-pair co-occurrence counts (a < b lexically): one row
    * per pair with its basket count. */
  def pairCounts(rows: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 64, minSupport: Long = 1L): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    pairsFromItems(basketItems(rows, basketCol, itemCol, maxBasket),
      minSupport)
  }

  /** Association rules a → b (both directions of every surviving pair):
    * support counts, confidence ppm, lift ppm. `n_baskets` counts only
    * capped-in baskets, so every ratio is over the same population. */
  def rules(rows: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 64, minSupport: Long = 1L): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    // ONE capped item frame feeds the supports, the pairing and the
    // basket total — the checkpoint materializes once, never per branch
    val items = basketItems(rows, basketCol, itemCol, maxBasket)
    val supports = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    // checkpoint: `pairs` feeds BOTH rule directions below, and Catalyst
    // re-derives repeated subtrees — without it the whole pair fan-out
    // join executes twice (round 18, measured as two of the lane's three
    // hottest stages)
    val pairs = pairsFromItems(items, minSupport)
      .localCheckpoint(eager = false)
    // every pair in both rule directions: a→b and b→a
    val directed = pairs
      .select(col("a").as("lhs"), col("b").as("rhs"), col("n_ab"))
      .unionAll(pairs
        .select(col("b").as("lhs"), col("a").as("rhs"), col("n_ab")))
    // basket total as a 1-row broadcast, not a driver-side count():
    // constructing the query stays action-free (lazy end to end)
    val nb = items.agg(count_distinct(col("bk")).as("n_baskets"))
    directed
      .join(broadcast(supports.withColumnRenamed("item", "lhs")
        .withColumnRenamed("n_item", "n_lhs")), Seq("lhs"))
      .join(broadcast(supports.withColumnRenamed("item", "rhs")
        .withColumnRenamed("n_item", "n_rhs")), Seq("rhs"))
      .crossJoin(broadcast(nb))
      .select(col("lhs"), col("rhs"), col("n_ab"), col("n_lhs"),
        col("n_rhs"),
        expr("n_ab * 1000000L div n_lhs").as("confidence_ppm"),
        expr("n_ab * n_baskets * 1000000L div (n_lhs * n_rhs)")
          .as("lift_ppm"))
  }

  /** X12c — item-item cosine similarity over basket co-occurrence: the
    * classic item-based collaborative-filtering score ("customers who
    * bought i also bought j"), sim(i, j) = n_ij / √(n_i·n_j) over the
    * basket-membership vectors. Reported as the exact integer SQUARE in
    * ppm — sim²·10⁶ = ⌊n_ij²·10⁶ / (n_i·n_j)⌋ — so no square root
    * crosses the engine boundary (the realizedVolatility discipline:
    * publish the exact sufficient statistic, let the edge take the
    * root). Same capped pair machinery as [[pairCounts]]; supports ride
    * the same broadcast as [[rules]]. Overflow: n_ij²·10⁶ needs
    * n_ij < 3·10⁶ — beyond that, DECIMAL (declared, like lift's). */
  def itemCosine(rows: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 64, minSupport: Long = 1L): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val items = basketItems(rows, basketCol, itemCol, maxBasket)
    val supports = items.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
    pairsFromItems(items, minSupport)
      .join(broadcast(supports.withColumnRenamed("item", "a")
        .withColumnRenamed("n_item", "n_a")), Seq("a"))
      .join(broadcast(supports.withColumnRenamed("item", "b")
        .withColumnRenamed("n_item", "n_b")), Seq("b"))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * n_ab * 1000000L div (n_a * n_b)").as("sim2_ppm"))
  }
}
