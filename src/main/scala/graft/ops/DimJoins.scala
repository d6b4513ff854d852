package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.CurrencyDim

/** J1/J2 — ISIN <-> currency-pair dimension lookups as broadcast hash joins.
  *
  * The reference holds the 84-row dim in-process and does dict lookups
  * (currency.py:93-99). Spark-first equivalent: `broadcast()` the dim so
  * every executor gets a copy and the join never shuffles the fact side —
  * the property that matters at 100 TB.
  *
  * Miss semantics are part of the contract (SURVEY.md §7.4):
  *  - forward (isin -> pair) raises KeyError in the reference
  *    (currency.py:93-94)  => inner join, miss rows DROP;
  *  - reverse (pair -> isin) returns None (currency.py:96-99)
  *    => left-outer join, miss rows keep NULL isin.
  */
object DimJoins {

  /** J1 — forward lookup: facts must carry an `isin` column. Inner join:
    * unknown ISINs are dropped (reference KeyError semantics). */
  def forward(spark: SparkSession)(facts: DataFrame): DataFrame =
    facts.join(broadcast(CurrencyDim.df(spark)), Seq("isin"), "inner")

  /** J2 — reverse lookup: facts must carry a `pair` column. Left-outer:
    * unknown pairs resolve to NULL isin (reference None semantics). */
  def reverse(spark: SparkSession)(facts: DataFrame): DataFrame =
    facts.join(
      broadcast(CurrencyDim.df(spark).select(
        col("pair"), col("isin").as("isin_resolved"))),
      Seq("pair"), "left")
}
