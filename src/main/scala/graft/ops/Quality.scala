package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X11 — declarative data-quality gates over arriving batches: the
  * expectations/constraint-check step every production ingest runs before
  * data is allowed into a training corpus (the reference enforces its own
  * ingest gates record-at-a-time: HTTP-status and eligibility checks in
  * /root/reference/downloader/main.py — this is the set-oriented,
  * full-corpus generalization).
  *
  * Design for 100 TB:
  * - `violationReport` folds ALL rules into ONE narrow aggregate pass —
  *   a single scan, map-side partial sums, a 1-row exchange — then
  *   unpivots driver-cheaply with `stack`. Adding a rule adds a column,
  *   not a pass.
  * - `flagViolations`/`quarantine` are pure narrow projections (no
  *   shuffle): each row gains the array of rule names it failed, and the
  *   clean/quarantined split is two filters over the same cached lineage.
  * - A NULL rule verdict counts as a FAILURE everywhere (coalesce(pass,
  *   false)) — a rule that cannot evaluate must not admit the row, and
  *   one convention keeps report counts and quarantine membership
  *   consistent.
  */
object Quality {

  /** One expectation: `pass` must evaluate TRUE for a row to be admitted.
    * `name` must be a plain identifier (letters/digits/underscore) — it is
    * spliced into `stack(...)` literals. */
  final case class Rule(name: String, pass: Column) {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"), s"bad rule name: $name")
  }

  private def failed(r: Rule): Column = not(coalesce(r.pass, lit(false)))

  /** Per-rule violation counts in one aggregate pass.
    * Output: (rule, n_rows, n_fail, fail_ppm) — ppm floored, integer. */
  def violationReport(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      sum(when(failed(r), 1L).otherwise(0L)).as(s"_f$i")
    } :+ count(lit(1)).as("_n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case (r, i) => s"'${r.name}', _f$i" }.mkString(", ")
    one.select(col("_n"),
        expr(s"stack(${rules.length}, $stackArgs) AS (rule, n_fail)"))
      .select(col("rule"), col("_n").as("n_rows"), col("n_fail"),
        floor(col("n_fail") * lit(1000000L) / col("_n")).cast("long")
          .as("fail_ppm"))
  }

  /** Adds `_failed`: the array of rule names this row violates, in rule
    * declaration order (empty array = clean row). Narrow, shuffle-free. */
  def flagViolations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val tags = rules.map(r => when(failed(r), lit(r.name)))
    df.withColumn("_failed",
      filter(array(tags: _*), x => x.isNotNull))
  }

  /** (clean, quarantined) split. Quarantined rows keep `_failed` so the
    * triage queue knows why; clean rows drop it. */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val flagged = flagViolations(df, rules)
    (flagged.filter(size(col("_failed")) === 0).drop("_failed"),
      flagged.filter(size(col("_failed")) > 0))
  }

  /** Per-column profile: non-null count, null count, distinct count, and
    * min/max rendered as strings. One aggregate pass over a narrow
    * projection of exactly `cols`.
    *
    * `exactDistinct = true` uses count_distinct — Spark plans the
    * multi-distinct aggregate with an Expand (input multiplied by
    * |cols|+1), acceptable to ~TB inputs and required for oracle
    * equality. At 100 TB set it false: approx_count_distinct is a
    * mergeable HLL partial — no Expand, one true pass.
    *
    * Min/max are computed in the column's native type and cast to string
    * AFTER aggregation, so ordering is numeric for numerics. Callers who
    * need oracle-stable strings should profile integer/string projections
    * (floats' string forms are engine-formatting-dependent). */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    cols.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"bad column name: $c"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__cnt"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exactDistinct) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__dist"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__cnt, ${c}__nulls, ${c}__dist, ${c}__min, ${c}__max")
      .mkString(", ")
    one.select(expr(s"stack(${cols.length}, $stackArgs) AS " +
      "(column_name, n_non_null, n_null, n_distinct, min_val, max_val)"))
  }
}
