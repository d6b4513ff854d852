package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** X11 data-quality + X12 basket/CF family.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QQuality {

  /** X11a — per-rule violation report: ONE aggregate pass over the batch
    * (map-side partial sums, 1-row exchange) no matter how many rules;
    * the unpivot to report rows is driver-cheap `stack`. ppm is floored
    * integer math on both engines. */
  val x11Expectations = QuerySpec("x11_expectations",
    (s, d) => Quality.violationReport(Tables.events(s, d), eventRules)
      .orderBy(col("rule")),
    Some("""WITH agg AS (SELECT count(*) AS n_rows,
           |  sum(CASE WHEN NOT coalesce(value <= 400.0, false)
           |      THEN 1 ELSE 0 END) AS f0,
           |  sum(CASE WHEN NOT coalesce(user_id < 140, false)
           |      THEN 1 ELSE 0 END) AS f1,
           |  sum(CASE WHEN NOT coalesce(event_type <> 'error', false)
           |      THEN 1 ELSE 0 END) AS f2,
           |  sum(CASE WHEN NOT coalesce(
           |        CAST(json_extract_string(props, '$.k') AS BIGINT) <= 80,
           |        false) THEN 1 ELSE 0 END) AS f3
           |  FROM events)
           |SELECT rule, n_rows, CAST(n_fail AS BIGINT) AS n_fail,
           |  CAST(floor(n_fail * 1000000 / n_rows) AS BIGINT) AS fail_ppm
           |FROM (
           |  SELECT 'value_le_400' AS rule, n_rows, f0 AS n_fail FROM agg
           |  UNION ALL SELECT 'user_lt_140', n_rows, f1 FROM agg
           |  UNION ALL SELECT 'no_error_events', n_rows, f2 FROM agg
           |  UNION ALL SELECT 'props_k_le_80', n_rows, f3 FROM agg) t
           |ORDER BY rule""".stripMargin))


  /** X11b — the quarantine side: rows failing ANY rule, tagged with the
    * comma-joined list of failed rule names (rule declaration order —
    * both engines skip the non-failed NULL slots). Narrow projection +
    * filter; no shuffle before the output sort. */
  val x11Quarantine = QuerySpec("x11_quarantine",
    (s, d) => {
      val (_, bad) = Quality.quarantine(Tables.events(s, d), eventRules)
      bad.select(col("event_id"),
          array_join(col("_failed"), ",").as("failed"))
        .orderBy(col("event_id"))
    },
    Some("""WITH f AS (SELECT event_id,
           |  concat_ws(',',
           |    CASE WHEN NOT coalesce(value <= 400.0, false)
           |      THEN 'value_le_400' END,
           |    CASE WHEN NOT coalesce(user_id < 140, false)
           |      THEN 'user_lt_140' END,
           |    CASE WHEN NOT coalesce(event_type <> 'error', false)
           |      THEN 'no_error_events' END,
           |    CASE WHEN NOT coalesce(
           |        CAST(json_extract_string(props, '$.k') AS BIGINT) <= 80,
           |        false) THEN 'props_k_le_80' END) AS failed
           |  FROM events)
           |SELECT event_id, failed FROM f WHERE failed <> ''
           |ORDER BY event_id""".stripMargin))


  /** X11c — per-column profile (completeness / distinctness / bounds) in
    * one aggregate pass over a 5-column projection. The profiled columns
    * are integer/string-ized FIRST (cents, epoch-µs) so min/max string
    * forms are engine-independent; exact distinct for the oracle (the
    * 100 TB path flips `exactDistinct=false` → mergeable HLL partials,
    * no Expand). */
  val x11Profile = QuerySpec("x11_profile",
    (s, d) => {
      val proj = Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("event_type"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("value_cents"),
        expr("unix_micros(ts)").as("ts_us"))
      Quality.profile(proj,
          Seq("event_id", "user_id", "event_type", "value_cents", "ts_us"))
        .orderBy(col("column_name"))
    },
    Some("""WITH src AS (SELECT event_id, user_id, event_type,
           |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
           |    epoch_us(ts) AS ts_us FROM events),
           |p AS (
           |  SELECT 'event_id' AS column_name, count(event_id) AS n_non_null,
           |    sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS n_null,
           |    count(DISTINCT event_id) AS n_distinct,
           |    CAST(min(event_id) AS VARCHAR) AS min_val,
           |    CAST(max(event_id) AS VARCHAR) AS max_val FROM src
           |  UNION ALL
           |  SELECT 'user_id', count(user_id),
           |    sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END),
           |    count(DISTINCT user_id),
           |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
           |  FROM src
           |  UNION ALL
           |  SELECT 'event_type', count(event_type),
           |    sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END),
           |    count(DISTINCT event_type),
           |    CAST(min(event_type) AS VARCHAR), CAST(max(event_type) AS VARCHAR)
           |  FROM src
           |  UNION ALL
           |  SELECT 'value_cents', count(value_cents),
           |    sum(CASE WHEN value_cents IS NULL THEN 1 ELSE 0 END),
           |    count(DISTINCT value_cents),
           |    CAST(min(value_cents) AS VARCHAR), CAST(max(value_cents) AS VARCHAR)
           |  FROM src
           |  UNION ALL
           |  SELECT 'ts_us', count(ts_us),
           |    sum(CASE WHEN ts_us IS NULL THEN 1 ELSE 0 END),
           |    count(DISTINCT ts_us),
           |    CAST(min(ts_us) AS VARCHAR), CAST(max(ts_us) AS VARCHAR)
           |  FROM src)
           |SELECT column_name, n_non_null, CAST(n_null AS BIGINT) AS n_null,
           |  n_distinct, min_val, max_val
           |FROM p ORDER BY column_name""".stripMargin))


  /** X12a — frequent item pairs (ops/Basket.pairCounts): brand
    * co-occurrence within orders, baskets capped at 8 distinct brands
    * BEFORE the pair fan-out (the corpus max is 11 — the cap is
    * exercised, not decorative), support floor 50. */
  val x12BasketPairs = QuerySpec("x12_basket_pairs",
    (s, d) => Basket.pairCounts(
        T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand")),
        "l_orderkey", "p_brand", maxBasket = 8, minSupport = 50L)
      .orderBy(col("a"), col("b")),
    Some("""WITH it AS (
           |  SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS item
           |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
           |ok AS (SELECT bk FROM it GROUP BY bk HAVING count(*) <= 8),
           |itc AS (SELECT it.bk, it.item FROM it JOIN ok USING (bk)),
           |pr AS (SELECT x.item AS a, y.item AS b
           |  FROM itc x JOIN itc y ON x.bk = y.bk AND x.item < y.item)
           |SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
           |FROM pr GROUP BY a, b HAVING count(*) >= 50
           |ORDER BY a, b""".stripMargin),
    bench = true)


  /** X12b — association rules (ops/Basket.rules): both directions of
    * every surviving pair with exact integer support / confidence-ppm /
    * lift-ppm; lift > 10^6 marks positive association. The basket total
    * rides a 1-row broadcast (no driver-side count — the plan stays
    * lazy end to end). */
  val x12BasketRules = QuerySpec("x12_basket_rules",
    (s, d) => Basket.rules(
        T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand")),
        "l_orderkey", "p_brand", maxBasket = 8, minSupport = 100L)
      .orderBy(col("lhs"), col("rhs")),
    Some("""-- nonneg-div(2): counts/rank sums only
           |WITH it AS (
           |  SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS item
           |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
           |ok AS (SELECT bk FROM it GROUP BY bk HAVING count(*) <= 8),
           |itc AS (SELECT it.bk, it.item FROM it JOIN ok USING (bk)),
           |sup AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item
           |  FROM itc GROUP BY item),
           |nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n_baskets
           |  FROM itc),
           |pc AS (SELECT x.item AS a, y.item AS b,
           |    CAST(count(*) AS BIGINT) AS n_ab
           |  FROM itc x JOIN itc y ON x.bk = y.bk AND x.item < y.item
           |  GROUP BY 1, 2 HAVING count(*) >= 100),
           |dir AS (SELECT a AS lhs, b AS rhs, n_ab FROM pc
           |  UNION ALL SELECT b, a, n_ab FROM pc)
           |SELECT d.lhs, d.rhs, d.n_ab,
           |  sl.n_item AS n_lhs, sr.n_item AS n_rhs,
           |  d.n_ab * 1000000 // sl.n_item AS confidence_ppm,
           |  d.n_ab * nb.n_baskets * 1000000
           |    // (sl.n_item * sr.n_item) AS lift_ppm
           |FROM dir d JOIN sup sl ON d.lhs = sl.item
           |JOIN sup sr ON d.rhs = sr.item, nb
           |ORDER BY lhs, rhs""".stripMargin),
    bench = true)


  /** X11d — per-group IQR outlier screen (ops/Quality.iqrOutliers) over
    * a heavy-tailed measure (value⁵ spans ~5 decades, so Tukey's fences
    * actually fire — a uniform column never trips 1.5·IQR). Quartiles by
    * the pinned position rule, fences as integer cross-multiplies. */
  val x11IqrOutliers = QuerySpec("x11_iqr_outliers",
    (s, d) => Quality.iqrOutliers(Tables.events(s, d), "event_type",
        "event_id",
        expr("CAST(floor(value * value * value * value * value + 0.5) " +
          "AS BIGINT)"))
      .orderBy(col("event_type")),
    Some("""-- nonneg-div(2): rank positions
           |WITH e AS (SELECT event_type, event_id,
           |    CAST(floor(value * value * value * value * value + 0.5)
           |      AS BIGINT) AS cents
           |  FROM events),
           |r AS (SELECT event_type, cents,
           |    row_number() OVER (PARTITION BY event_type
           |      ORDER BY cents, event_id) AS rn,
           |    count(*) OVER (PARTITION BY event_type) AS n
           |  FROM e),
           |f AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
           |    max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
           |    max(CASE WHEN rn = (3 * n + 1) // 4 THEN cents END) AS q3
           |  FROM r GROUP BY event_type)
           |SELECT r.event_type, f.n, f.q1, f.q3,
           |  CAST(sum(CASE WHEN 2 * r.cents < 2 * f.q1 - 3 * (f.q3 - f.q1)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_out_low,
           |  CAST(sum(CASE WHEN 2 * r.cents > 2 * f.q3 + 3 * (f.q3 - f.q1)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_out_high
           |FROM r JOIN f USING (event_type)
           |GROUP BY r.event_type, f.n, f.q1, f.q3
           |ORDER BY event_type""".stripMargin))


  /** X11e — Benford first-digit profile (ops/Quality.benfordProfile):
    * value⁵ spans ~5 decades (≈ log-uniform), so its leading digits
    * should track log10(1 + 1/d); the expected ppm values are
    * driver-side literals spliced into BOTH plans (no cross-engine
    * libm). One ≤9-row digit aggregate. */
  val x11Benford = QuerySpec("x11_benford",
    (s, d) => Quality.benfordProfile(Tables.events(s, d),
        expr("CAST(floor(value * value * value * value * value + 0.5) " +
          "AS BIGINT)"))
      .orderBy(col("digit")),
    Some({
      val expCase = (1 to 9).map(dd =>
        s"WHEN $dd THEN ${Quality.benfordPpm(dd)}")
        .mkString("CASE digit ", " ", " END")
      s"""-- nonneg-div(2): counts/rank sums only
         |WITH e AS (SELECT
         |    CAST(floor(value * value * value * value * value + 0.5)
         |      AS BIGINT) AS cents
         |  FROM events),
         |g AS (SELECT
         |    CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM e WHERE cents >= 1 GROUP BY 1),
         |t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total
         |  FROM g)
         |SELECT digit, n, n * 1000000 // total AS obs_ppm,
         |  CAST($expCase AS BIGINT) AS exp_ppm,
         |  n * 1000000 // total - CAST($expCase AS BIGINT) AS dev_ppm
         |FROM t ORDER BY digit""".stripMargin
    }))


  /** X11f — referential-integrity audit (ops/Quality.referentialAudit):
    * orphan counts for every declared FK edge of the star schema plus
    * the documents→embeddings link (3 of 5 docs have no embedding yet —
    * genuine unlinked mass, not a synthetic plant). Each relation is one
    * distinct-parent left join + a 1-row aggregate. */
  val x11Refint = QuerySpec("x11_refint",
    (s, d) => Quality.referentialAudit(Seq(
        Quality.FkRule("documents_docid__embeddings",
          T(s, d, "documents"), "doc_id", T(s, d, "embeddings"), "vec_id"),
        Quality.FkRule("events_userid__customer",
          Tables.events(s, d), "user_id", T(s, d, "customer"), "c_custkey"),
        Quality.FkRule("lineitem_orderkey__orders",
          T(s, d, "lineitem"), "l_orderkey", T(s, d, "orders"), "o_orderkey"),
        Quality.FkRule("lineitem_partkey__part",
          T(s, d, "lineitem"), "l_partkey", T(s, d, "part"), "p_partkey"),
        Quality.FkRule("lineitem_suppkey__supplier",
          T(s, d, "lineitem"), "l_suppkey", T(s, d, "supplier"), "s_suppkey"),
        Quality.FkRule("orders_custkey__customer",
          T(s, d, "orders"), "o_custkey", T(s, d, "customer"), "c_custkey")))
      .orderBy(col("relation")),
    Some {
      def rel(name: String, child: String, fk: String, parent: String,
          pk: String) =
        s"""SELECT '$name' AS relation, n_child, n_null_fk, n_orphans,
           |  CAST(n_orphans * 1000000 // n_child AS BIGINT) AS orphan_ppm
           |FROM (SELECT CAST(count(*) AS BIGINT) AS n_child,
           |    CAST(sum(CASE WHEN c.$fk IS NULL THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_null_fk,
           |    CAST(sum(CASE WHEN c.$fk IS NOT NULL AND p._pk IS NULL
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
           |  FROM $child c LEFT JOIN
           |    (SELECT DISTINCT $pk AS _pk FROM $parent) p
           |    ON c.$fk = p._pk)""".stripMargin
      Seq(
        rel("documents_docid__embeddings", "documents", "doc_id",
          "embeddings", "vec_id"),
        rel("events_userid__customer", "events", "user_id",
          "customer", "c_custkey"),
        rel("lineitem_orderkey__orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        rel("lineitem_partkey__part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        rel("lineitem_suppkey__supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        rel("orders_custkey__customer", "orders", "o_custkey",
          "customer", "c_custkey"))
        .mkString("-- nonneg-div(6): counts/rank sums only\n",
          "\nUNION ALL\n", "\nORDER BY relation")
    })


  /** X11g — key-uniqueness audit (ops/Quality.uniquenessAudit): five
    * true candidate keys audited clean beside lineitem's l_orderkey
    * alone — a key that is genuinely NOT unique (multi-line orders), so
    * the dup counters carry real signal, not just zeros. */
  val x11Unique = QuerySpec("x11_unique",
    (s, d) => Quality.uniquenessAudit(Seq(
        ("documents_doc_id", T(s, d, "documents"), Seq("doc_id")),
        ("embeddings_vec_id", T(s, d, "embeddings"), Seq("vec_id")),
        ("events_event_id", Tables.events(s, d), Seq("event_id")),
        ("lineitem_orderkey", T(s, d, "lineitem"), Seq("l_orderkey")),
        ("lineitem_orderkey_linenumber", T(s, d, "lineitem"),
          Seq("l_orderkey", "l_linenumber")),
        ("orders_o_orderkey", T(s, d, "orders"), Seq("o_orderkey"))))
      .orderBy(col("relation")),
    Some {
      def rel(name: String, table: String, keys: String) =
        s"""SELECT '$name' AS relation, CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  CAST(sum(c) - count(*) AS BIGINT) AS n_dup_rows,
           |  CAST((sum(c) - count(*)) * 1000000 // sum(c) AS BIGINT)
           |    AS dup_ppm
           |FROM (SELECT count(*) AS c FROM $table GROUP BY $keys)""".stripMargin
      Seq(
        rel("documents_doc_id", "documents", "doc_id"),
        rel("embeddings_vec_id", "embeddings", "vec_id"),
        rel("events_event_id", "events", "event_id"),
        rel("lineitem_orderkey", "lineitem", "l_orderkey"),
        rel("lineitem_orderkey_linenumber", "lineitem",
          "l_orderkey, l_linenumber"),
        rel("orders_o_orderkey", "orders", "o_orderkey"))
        .mkString("-- nonneg-div(6): counts/rank sums only\n",
          "\nUNION ALL\n", "\nORDER BY relation")
    })


  /** X11h — functional-dependency audit (ops/Quality.fdAudit): two FDs
    * that HOLD (an order has one customer, a doc has one language)
    * beside two that are genuinely violated (a part ships from many
    * suppliers; a user emits many event types) — max_fanout quantifies
    * how broken. */
  val x11Fd = QuerySpec("x11_fd",
    (s, d) => Quality.fdAudit(Seq(
        ("documents_doc__lang", T(s, d, "documents"), "doc_id", "lang"),
        ("events_user__event_type", Tables.events(s, d),
          "user_id", "event_type"),
        ("lineitem_partkey__suppkey", T(s, d, "lineitem"),
          "l_partkey", "l_suppkey"),
        ("orders_orderkey__custkey", T(s, d, "orders"),
          "o_orderkey", "o_custkey")))
      .orderBy(col("fd")),
    Some {
      def rel(name: String, table: String, lhs: String, rhs: String) =
        s"""SELECT '$name' AS fd, CAST(count(*) AS BIGINT) AS n_lhs,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  CAST(max(nd) AS BIGINT) AS max_fanout,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1000000
           |    // count(*) AS BIGINT) AS viol_ppm
           |FROM (SELECT $lhs, CAST(count(*) AS BIGINT) AS nd
           |  FROM (SELECT DISTINCT $lhs, $rhs FROM $table
           |        WHERE $lhs IS NOT NULL)
           |  GROUP BY $lhs)""".stripMargin
      Seq(
        rel("documents_doc__lang", "documents", "doc_id", "lang"),
        rel("events_user__event_type", "events", "user_id", "event_type"),
        rel("lineitem_partkey__suppkey", "lineitem",
          "l_partkey", "l_suppkey"),
        rel("orders_orderkey__custkey", "orders",
          "o_orderkey", "o_custkey"))
        .mkString("-- nonneg-div(4): counts/rank sums only\n",
          "\nUNION ALL\n", "\nORDER BY fd")
    })


  /** X12c — item-item collaborative-filtering similarity
    * (ops/Basket.itemCosine): brand-brand cosine over order-basket
    * co-occurrence, published as the exact integer sim² in ppm (no
    * square root crosses the engine boundary). Same capped machinery
    * as x12_basket_pairs. */
  val x12ItemSim = QuerySpec("x12_item_sim",
    (s, d) => Basket.itemCosine(
        T(s, d, "lineitem")
          .join(broadcast(T(s, d, "part")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand")),
        "l_orderkey", "p_brand", maxBasket = 8, minSupport = 50L)
      .orderBy(col("a"), col("b")),
    Some("""-- nonneg-div(1): co-occurrence counts
           |WITH it AS (
           |  SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS item
           |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
           |ok AS (SELECT bk FROM it GROUP BY bk HAVING count(*) <= 8),
           |itc AS (SELECT it.bk, it.item FROM it JOIN ok USING (bk)),
           |sup AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item
           |  FROM itc GROUP BY item),
           |pr AS (SELECT x.item AS a, y.item AS b,
           |    CAST(count(*) AS BIGINT) AS n_ab
           |  FROM itc x JOIN itc y ON x.bk = y.bk AND x.item < y.item
           |  GROUP BY 1, 2 HAVING count(*) >= 50)
           |SELECT a, b, n_ab, sa.n_item AS n_a, sb.n_item AS n_b,
           |  CAST(n_ab * n_ab * 1000000 // (sa.n_item * sb.n_item)
           |    AS BIGINT) AS sim2_ppm
           |FROM pr JOIN sup sa ON sa.item = a JOIN sup sb ON sb.item = b
           |ORDER BY a, b""".stripMargin))
}
