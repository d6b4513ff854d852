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

  /** X11 — per-group IQR outlier screen (Tukey's fences): quartiles by an
    * EXPLICIT position rule — after an ascending (value, tie) sort,
    * q1 = the value at row (n+3) div 4, q3 = at (3n+1) div 4 — pinned in
    * plain window arithmetic on BOTH engines rather than delegated to a
    * quantile builtin (whose interpolation type differs across engines);
    * the 1.5·IQR fences are the exact integer cross-multiply
    * 2·x < 2·q1 − 3·iqr (no halves materialized).
    *
    * Scale shape: ONE group-window shuffle ranks the values, the
    * group-keyed aggregate reuses that partitioning (subset clustering),
    * and the |groups|-row fence frame BROADCASTS back onto the rows for
    * the flag counts — the fact volume is never shuffled a second time.
    * Output: (group, n, q1, q3, n_out_low, n_out_high). */
  def iqrOutliers(df: DataFrame, groupCol: String, tieCol: String,
      valueCents: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cents"), col(tieCol))
    val ranked = df
      .select(col(groupCol), col(tieCol), valueCents.as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col(groupCol))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
    val fences = ranked
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 3) div 4"), col("cents")))
          .as("q1"),
        max(when(col("rn") === expr("(3 * n + 1) div 4"), col("cents")))
          .as("q3"))
    ranked
      .select(col(groupCol), col("cents"))
      .join(broadcast(fences.withColumnRenamed(groupCol, "_g")),
        col(groupCol) === col("_g"))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), max(col("q1")).as("q1"),
        max(col("q3")).as("q3"),
        sum(when(expr("2 * cents < 2 * q1 - 3 * (q3 - q1)"), 1L)
          .otherwise(0L)).as("n_out_low"),
        sum(when(expr("2 * cents > 2 * q3 + 3 * (q3 - q1)"), 1L)
          .otherwise(0L)).as("n_out_high"))
  }

  /** X11 — Benford first-digit profile: the leading significant digit of
    * a naturally-spread positive measure should follow log10(1 + 1/d) —
    * fabricated or truncated columns don't, which makes the profile a
    * standard fraud/data-corruption screen. Observed share per digit in
    * exact integer ppm; the expected Benford ppm values are precomputed
    * ONCE driver-side and spliced as literals into BOTH the Spark plan
    * and the oracle (the nDCG-weights discipline — no cross-engine libm
    * logs). One digit-grouped map-side-combined shuffle to ≤ 9 rows. */
  val benfordPpm: Map[Int, Long] =
    // StrictMath.log10 (round-15 ADVICE fix): Math.log10 is allowed 1 ulp
    // of platform variance, which could shift a stored ppm literal by 1
    // across JVMs; StrictMath is bit-reproducible everywhere, so the
    // spliced literals are a true cross-platform constant
    (1 to 9).map(dd => dd -> math.floor(
      StrictMath.log10(1.0 + 1.0 / dd) * 1000000.0).toLong).toMap

  def benfordProfile(df: DataFrame, valueCents: Column): DataFrame = {
    val expCase = (1 to 9).map(dd => s"WHEN $dd THEN ${benfordPpm(dd)}L")
      .mkString("CASE digit ", " ", " END")
    df.select(valueCents.as("cents"))
      .filter(col("cents") >= 1)
      .withColumn("digit",
        expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .select(col("digit"), col("n"),
        expr("n * 1000000L div total").as("obs_ppm"),
        expr(expCase).as("exp_ppm"),
        (expr("n * 1000000L div total") - expr(expCase)).as("dev_ppm"))
  }

  /** One FK relation to audit: every non-null `child(fkCol)` should
    * appear in `parent(pkCol)`. */
  final case class FkRule(name: String, child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String)

  /** X11f — referential-integrity audit: per declared FK relation, how
    * many child rows point at a parent key that does not exist (plus
    * null-FK rows, reported separately — a null FK is "not yet linked",
    * not "dangling"). The cross-table sibling of [[violationReport]]'s
    * single-table rules: expectations gate VALUES, this gates LINKS —
    * the orphan scan every warehouse runs before joins silently drop
    * rows (an inner join on a dangling FK loses the child row with no
    * error anywhere).
    *
    * Scale shape per relation: the parent side collapses to DISTINCT
    * keys first (map-side combined), then ONE left join keyed on the FK
    * feeds a 1-row conditional aggregate — the child volume is scanned
    * and shuffled once; nothing is materialized per-orphan. Relations
    * are independent branches unioned driver-cheaply (|relations| rows
    * total). A dim-sized parent's distinct-key frame broadcasts under
    * AQE's threshold automatically; a fact-sized parent shuffles on the
    * key like any fact-fact join. */
  def referentialAudit(rules: Seq[FkRule]): DataFrame = {
    require(rules.nonEmpty, "need at least one FK rule")
    rules.map { r =>
      val parentKeys = r.parent.select(col(r.pkCol).as("_pk")).distinct()
      r.child.select(col(r.fkCol).as("_fk"))
        .join(parentKeys, col("_fk") === col("_pk"), "left")
        .agg(count(lit(1)).as("n_child"),
          sum(when(col("_fk").isNull, 1L).otherwise(0L)).as("n_null_fk"),
          sum(when(col("_fk").isNotNull && col("_pk").isNull, 1L)
            .otherwise(0L)).as("n_orphans"))
        .select(lit(r.name).as("relation"), col("n_child"),
          col("n_null_fk"), col("n_orphans"),
          expr("n_orphans * 1000000L div n_child").as("orphan_ppm"))
    }.reduce(_ unionAll _)
  }

  /** X11g — key-uniqueness audit: for each declared candidate key, how
    * many rows are EXTRA copies beyond the first per key value
    * (n_dup_rows = n_rows − n_keys). The is-my-primary-key-actually-
    * unique check that gates every snapshot merge and every join
    * cardinality assumption — a duplicated "unique" key silently fans
    * out downstream joins. One key-grouped partial-combining count per
    * relation, collapsed to a single row; relations union
    * driver-cheaply. */
  def uniquenessAudit(rules: Seq[(String, DataFrame, Seq[String])])
      : DataFrame = {
    require(rules.nonEmpty, "need at least one uniqueness rule")
    rules.map { case (name, df, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
        .agg(sum(col("_c")).as("n_rows"), count(lit(1)).as("n_keys"))
        .select(lit(name).as("relation"),
          col("n_rows").cast("long").as("n_rows"), col("n_keys"),
          (col("n_rows") - col("n_keys")).cast("long").as("n_dup_rows"),
          expr("(n_rows - n_keys) * 1000000L div n_rows").as("dup_ppm"))
    }.reduce(_ unionAll _)
  }

  /** X11h — functional-dependency audit: does lhs → rhs hold? For each
    * declared FD, count the lhs values bound to MORE than one distinct
    * rhs (a violation means the "attribute of" relationship the schema
    * implies is broken — a part with two suppliers-of-record, a user
    * with two countries). The Deequ-style consistency check between
    * plain uniqueness and full referential integrity. One
    * (lhs, rhs)-distinct partial aggregate, then a lhs-keyed count —
    * both map-side combined, nothing row-volume-sized past the first
    * shuffle. */
  def fdAudit(rules: Seq[(String, DataFrame, String, String)]): DataFrame = {
    require(rules.nonEmpty, "need at least one FD rule")
    rules.map { case (name, df, lhs, rhs) =>
      df.select(col(lhs).as("_l"), col(rhs).as("_r"))
        .filter(col("_l").isNotNull)
        .distinct()
        .groupBy(col("_l")).agg(count(lit(1)).as("_nd"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("_nd")).as("max_fanout"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          col("max_fanout"),
          expr("n_violating * 1000000L div n_lhs").as("viol_ppm"))
    }.reduce(_ unionAll _)
  }
}
