package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ops._
import graft.schema.{CurrencyDim, Transition}
import Q._

/** The SQL front-end lanes: TPC-H 22/22 plus EXISTS decorrelation, lateral, recursive CTE, grouping sets.
  *
  * Round-17 split of the monolithic Queries.scala (r16 verdict item 8):
  * ZERO behavior change — every QuerySpec moved verbatim; shared
  * fixtures/oracle-text helpers live in [[Q]]; graft.Queries.all
  * re-exports the identical 292-name registry in the original order. */
object QSql {

  /** SQL1 — the SQL front-end over the same tables: temp views +
    * spark.sql, proving the engine's surface is reachable without the
    * DataFrame DSL (same Catalyst plan either way). Aggregates only
    * integral-valued doubles (l_quantity), so cross-partition summation
    * order cannot move the result. */
  val sql1TopNations = QuerySpec("sql1_supplier_nations",
    (s, d) => {
      T(s, d, "supplier").createOrReplaceTempView("supplier")
      T(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT s.s_nationkey,
              |  count(*) AS n_items,
              |  sum(l.l_quantity) AS total_qty
              |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
              |GROUP BY s.s_nationkey
              |ORDER BY s.s_nationkey""".stripMargin)
    },
    Some("""SELECT s.s_nationkey, count(*) AS n_items,
           |  sum(l.l_quantity) AS total_qty
           |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |GROUP BY s.s_nationkey
           |ORDER BY s.s_nationkey""".stripMargin))


  /** SQL2 — subquery surface of the SQL front-end: correlated EXISTS /
    * NOT EXISTS (Catalyst decorrelates to semi/anti joins) and an
    * uncorrelated scalar subquery (planned as a one-row subquery
    * broadcast). The oracle is the IDENTICAL ANSI text — both engines
    * run the same query, so this judges the front-end's subquery
    * semantics, not a translation. */
  val sql2Exists = QuerySpec("sql2_exists_subquery",
    (s, d) => {
      Seq("customer", "orders").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql2Text)
    },
    Some(sql2Text))


  /** SQL3 — explicit GROUPING SETS with grouping_id (cube/rollup's
    * general form; a3 covers the shorthands). INT cast on grouping_id:
    * Spark returns it as INT via this cast, DuckDB's GROUPING() is
    * BIGINT — one explicit cast each side (see COVERAGE round-2 notes).
    * Exact integer cents for the price mass. */
  val sql3GroupingSets = QuerySpec("sql3_grouping_sets",
    (s, d) => {
      T(s, d, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
              |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT)
              |    AS gid,
              |  count(*) AS n,
              |  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
              |  (o_orderstatus), ())
              |ORDER BY gid, o_orderstatus NULLS FIRST,
              |  o_orderpriority NULLS FIRST""".stripMargin)
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
           |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           |  count(*) AS n,
           |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |    AS BIGINT) AS cents
           |FROM orders
           |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
           |  (o_orderstatus), ())
           |ORDER BY gid, o_orderstatus NULLS FIRST,
           |  o_orderpriority NULLS FIRST""".stripMargin))


  /** SQL4 — LATERAL correlated subquery (round 8): top-2 customers by
    * account balance per nation. The lateral subquery re-executes per
    * outer row SEMANTICALLY; Catalyst decorrelates it into a ranked
    * window join, so the physical plan is one shuffle — not a per-row
    * loop. The oracle runs the identical comma-LATERAL text (both
    * dialects accept it); balances are exact parquet doubles compared,
    * never recomputed, so their ordering is portable. */
  val sql4Lateral = QuerySpec("sql4_lateral",
    (s, d) => {
      T(s, d, "nation").createOrReplaceTempView("nation")
      T(s, d, "customer").createOrReplaceTempView("customer")
      s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
              |FROM nation n, LATERAL (
              |  SELECT c_name, c_acctbal FROM customer c
              |  WHERE c.c_nationkey = n.n_nationkey
              |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
              |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin)
    },
    Some("""SELECT n.n_name, t.c_name, t.c_acctbal
           |FROM nation n, LATERAL (
           |  SELECT c_name, c_acctbal FROM customer c
           |  WHERE c.c_nationkey = n.n_nationkey
           |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
           |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin))


  val sql5Recursive = QuerySpec("sql5_recursive",
    (s, d) => {
      T(s, d, "customer").createOrReplaceTempView("customer")
      s.sql(sql5Text)
    },
    Some(sql5Text))


  val sql6Q3Shipping = QuerySpec("sql6_q3_shipping",
    (s, d) => {
      Seq("customer", "orders", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql6Text)
    },
    Some(sql6Text),
    bench = true)


  val sql7Q18BigOrders = QuerySpec("sql7_q18_big_orders",
    (s, d) => {
      Seq("customer", "orders", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql7Text)
    },
    Some(sql7Text),
    bench = true)


  val sql8Q10Returns = QuerySpec("sql8_q10_returns",
    (s, d) => {
      Seq("customer", "orders", "lineitem", "nation").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql8Text)
    },
    Some(sql8Text),
    bench = true)


  val sql9Q21Blocked = QuerySpec("sql9_q21_blocked",
    (s, d) => {
      Seq("supplier", "orders", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql9Text)
    },
    Some(sql9Text),
    bench = true)


  val sql10Q2MinCost = QuerySpec("sql10_q2_min_cost",
    (s, d) => {
      Seq("part", "supplier", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql10Text)
    },
    Some(sql10Text))


  val sql11Q17SmallQty = QuerySpec("sql11_q17_small_qty",
    (s, d) => {
      Seq("part", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql11Text)
    },
    Some(sql11Text),
    bench = true)


  val sql12Q22Dormant = QuerySpec("sql12_q22_dormant",
    (s, d) => {
      Seq("customer", "orders").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql12Text)
    },
    Some(sql12Text),
    bench = true)


  val sql13Q15TopSupplier = QuerySpec("sql13_q15_top_supplier",
    (s, d) => {
      Seq("supplier", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql13Text)
    },
    Some(sql13Text))


  val sql14Q4Priority = QuerySpec("sql14_q4_priority",
    (s, d) => {
      Seq("orders", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql14Text)
    },
    Some(sql14Text))


  val sql15Q12ShipClass = QuerySpec("sql15_q12_shipclass",
    (s, d) => {
      Seq("orders", "lineitem").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql15Text)
    },
    Some(sql15Text))


  val sql16Q16SupplierCnt = QuerySpec("sql16_q16_supplier_cnt",
    (s, d) => {
      Seq("lineitem", "part", "supplier").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql16Text)
    },
    Some(sql16Text))


  val sql17Q19Disjunct = QuerySpec("sql17_q19_disjunct",
    (s, d) => {
      Seq("lineitem", "part").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql17Text)
    },
    Some(sql17Text))


  val sql18Q20TopShippers = QuerySpec("sql18_q20_top_shippers",
    (s, d) => {
      Seq("supplier", "lineitem", "part").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql18Text)
    },
    Some(sql18Text))


  val sql19Q5LocalVolume = QuerySpec("sql19_q5_local_volume",
    (s, d) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation",
        "region").foreach(t => T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql19Text)
    },
    Some(sql19Text))


  val sql20Q7TradeVolume = QuerySpec("sql20_q7_trade_volume",
    (s, d) => {
      Seq("supplier", "lineitem", "orders", "customer", "nation")
        .foreach(t => T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql20Text)
    },
    Some(sql20Text))


  val sql21Q13CustDist = QuerySpec("sql21_q13_custdist",
    (s, d) => {
      Seq("customer", "orders").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql21Text)
    },
    Some(sql21Text))


  val sql22Q14PromoShare = QuerySpec("sql22_q14_promo_share",
    (s, d) => {
      Seq("lineitem", "part").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql22Text)
    },
    Some(sql22Text))


  val sql23Q6Forecast = QuerySpec("sql23_q6_forecast",
    (s, d) => {
      T(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(sql23Text)
    },
    Some(sql23Text))


  val sql24Q8MarketShare = QuerySpec("sql24_q8_market_share",
    (s, d) => {
      Seq("lineitem", "orders", "customer", "nation", "region", "supplier",
        "part").foreach(t => T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql24Text)
    },
    Some(sql24Text))


  val sql25Q9ProductProfit = QuerySpec("sql25_q9_product_profit",
    (s, d) => {
      Seq("lineitem", "part", "supplier", "nation", "orders").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql25Text)
    },
    Some(sql25Text))


  val sql26Q11ImportantStock = QuerySpec("sql26_q11_important_stock",
    (s, d) => {
      Seq("lineitem", "supplier", "nation").foreach(t =>
        T(s, d, t).createOrReplaceTempView(t))
      s.sql(sql26Text)
    },
    Some(sql26Text))
}
