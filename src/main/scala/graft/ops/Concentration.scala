package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X8s/X8t — concentration / inequality metrics over grouped integer
  * measures: the Gini coefficient (how unequally is spend distributed
  * across customers?) and the Herfindahl–Hirschman index (how
  * concentrated is a market among suppliers?). Standard
  * analytics-warehouse metrics (whale-detection, marketplace health,
  * antitrust screens) that are RATIONAL in the underlying integer sums,
  * so both reduce to exact BIGINT/DECIMAL arithmetic with one pinned
  * floor division at the ppm edge — no libm, oracle-replayable.
  *
  * Scale shapes:
  * - [[giniBy]] ranks members within each group (one group-window
  *   shuffle — the iqrOutliers window-cardinality regime: groups are
  *   priorities/segments/cohorts, members are customers; a group must
  *   fit a window partition, the declared contract) and collapses to
  *   one row per group.
  * - [[hhiBy]] is two partial-combining aggregates (member sums, then
  *   group moments) — no window, no join beyond what the caller feeds
  *   in; |groups| rows out.
  */
object Concentration {

  /** Per-group Gini coefficient of a non-negative integer measure.
    *
    * With group members sorted ascending (x, tie) and 1-based rank i:
    * G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) ∈ [0, 1−1/n]; 0 = perfectly
    * equal, →1 = one member holds everything. The rank-weighted sum
    * runs in DECIMAL(38,0) (HUGEINT oracle-side): Σ i·x_i reaches
    * n²·x̄ and the ppm scaling pushes past 2^63 at realistic group
    * sizes. Non-negative measures are the caller contract (Gini is
    * undefined below zero); an all-zero group reports null (0/0
    * honestly, not fabricated). Returns (group, n, sum_x,
    * gini_ppm). */
  def giniBy(df: DataFrame, groupCol: String, memberCol: String,
      measure: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("x"), col(memberCol))
    df.select(col(groupCol), col(memberCol), measure.as("x"))
      .withColumn("i", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sum_x"),
        sum(expr("CAST(i AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))"))
          .as("sr"))
      .select(col(groupCol), col("n"), col("sum_x"),
        when(col("sum_x") > 0, expr(
          "CAST((1000000 * (2 * sr - (CAST(n AS DECIMAL(38,0)) + 1) * " +
            "CAST(sum_x AS DECIMAL(38,0)))) div " +
            "(CAST(n AS DECIMAL(38,0)) * CAST(sum_x AS DECIMAL(38,0))) " +
            "AS BIGINT)")).as("gini_ppm"))
  }

  /** Per-group Herfindahl–Hirschman index of member shares, in ppm of
    * the [0, 1] scale: HHI = Σ (x_i/Σx)² = Σx_i² / (Σx)². 1/n for n
    * equal members, 1.0 for a monopoly; the antitrust convention's
    * 0–10,000 points = hhi_ppm / 100. Squares run in DECIMAL(38,0)
    * (member sums brush 2^31.5 where BIGINT squares overflow); one
    * member-keyed partial aggregate then one group aggregate. All-zero
    * groups report null. Returns (group, n_members, sum_x, hhi_ppm). */
  def hhiBy(df: DataFrame, groupCol: String, memberCol: String,
      measure: Column): DataFrame =
    df.select(col(groupCol), col(memberCol), measure.as("x"))
      .groupBy(col(groupCol), col(memberCol))
      .agg(sum(col("x")).as("mx"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_members"), sum(col("mx")).as("sum_x"),
        sum(expr("CAST(mx AS DECIMAL(38,0)) * CAST(mx AS DECIMAL(38,0))"))
          .as("sq"))
      .select(col(groupCol), col("n_members"), col("sum_x"),
        when(col("sum_x") > 0, expr(
          "CAST((1000000 * sq) div (CAST(sum_x AS DECIMAL(38,0)) * " +
            "CAST(sum_x AS DECIMAL(38,0))) AS BIGINT)")).as("hhi_ppm"))
}
