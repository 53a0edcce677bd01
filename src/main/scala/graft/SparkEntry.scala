package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{LastJoin, WindowOps}

/** Driver contract — one `queries` entry (+ DuckDB `oracleSql`) per
  * implemented operator from SURVEY.md §2. Column names/types are
  * aligned between the Spark result and the oracle SQL (the driver
  * sorts columns by name and hash-compares values).
  *
  * Double-valued aggregates are `round(...)`ed identically on both
  * sides so summation-order fp noise can't flip the hash.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => f(GraftSession.tune(s), d)

  /** Flagship query (SURVEY §7.3 minimum slice): per-event running
    * sum/count over `ROWS_RANGE 10m PRECEDING` on the events table. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_window_rows_range")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Operator queries (SURVEY §2 inventory)
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TableProvider + GroupAggregation (TPC-H Q1 shape)
    "q1_agg" -> q { (s, d) =>
      T(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
    },

    // SimpleProject / RowProject: select + scalar expressions
    "q_project" -> q { (s, d) =>
      T(s, d, "orders").select(
        col("o_orderkey"),
        upper(col("o_orderstatus")).as("status_u"),
        (col("o_totalprice") * 2).as("dbl_price"),
        year(col("o_orderdate")).cast("int").as("o_year"))
    },

    // ConstProject: SELECT without FROM (dql/NO_TABLE_SELECT_CLAUSE.md)
    "q_const" -> q { (s, _) =>
      s.range(1).select(
        (lit(1) + lit(2)).cast("long").as("i_sum"),
        concat(lit("a"), lit("b")).as("s_cat"),
        round(lit(3.0) / lit(2.0), 3).as("f_div"))
    },

    // Filter
    "q_filter" -> q { (s, d) =>
      T(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") >= 30
          && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
    },

    // GroupBy + HAVING
    "q_groupby_having" -> q { (s, d) =>
      T(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .filter(col("n_orders") >= 5)
    },

    // LEFT JOIN chain (small dims → auto-broadcast)
    "q_join_left" -> q { (s, d) =>
      val c = T(s, d, "customer"); val n = T(s, d, "nation"); val r = T(s, d, "region")
      c.join(n, c("c_nationkey") === n("n_nationkey"), "left")
        .join(r, n("n_regionkey") === r("r_regionkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
    },

    // LAST JOIN (ordered, equi-key) — graft.operators.LastJoin
    "q_last_join" -> q { (s, d) =>
      val o = T(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val li = T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
      // l_linenumber is non-unique in the synthetic data → deterministic
      // composite tie-break so the oracle can reproduce the same pick.
      LastJoin(o, li, Seq("o_orderkey"), Seq("l_orderkey"),
          Some(struct(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("l_linenumber").as("last_line"), col("l_quantity").as("last_qty"))
    },

    // SetOperation: UNION DISTINCT
    "q_union" -> q { (s, d) =>
      T(s, d, "customer").select(col("c_custkey").as("key"))
        .union(T(s, d, "orders").select(col("o_custkey")))
        .distinct()
    },

    // Distinct
    "q_distinct" -> q { (s, d) =>
      T(s, d, "orders").select(col("o_orderstatus"), col("o_orderpriority")).distinct()
    },

    // SortBy + Limit (top-n; Spark TakeOrderedAndProject — no full sort)
    "q_sort_limit" -> q { (s, d) =>
      T(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    },

    // WindowAggregation: ROWS frame
    "q_window_rows" -> q { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id")).rowsBetween(-3, 0)
      T(s, d, "events").select(
        col("event_id"),
        round(sum(col("value")).over(w), 3).as("w_sum"),
        count(col("value")).over(w).as("w_cnt"))
    },

    // WindowAggregation: ROWS_RANGE frame (10 min) over ms order key
    "q_window_rows_range" -> q { (s, d) =>
      val w = WindowOps.rowsRange(Seq(col("user_id")), col("ts_ms"), 600000L)
      T(s, d, "events").select(
        col("event_id"),
        round(sum(col("value")).over(w), 3).as("r_sum"),
        count(col("value")).over(w).as("r_cnt"))
    },

    // Window navigation: lag / first_value / last_value
    "q_window_nav" -> q { (s, d) =>
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, 0)
      T(s, d, "events").select(
        col("event_id"),
        lag(col("value"), 1).over(wo).as("prev_v"),
        first(col("value")).over(wf).as("first_v"),
        last(col("value")).over(wf).as("last_v"))
    },

    // Conditional UDAFs: sum_where / count_where / avg_where / min/max_where
    // (pure expression rewrite — SURVEY §2.3)
    "q_agg_where" -> q { (s, d) =>
      val cond = col("l_quantity") > 25
      T(s, d, "lineitem").groupBy(col("l_returnflag")).agg(
        round(sum(when(cond, col("l_extendedprice"))), 2).as("sum_where"),
        count(when(cond, lit(1))).as("count_where"),
        round(avg(when(cond, col("l_extendedprice"))), 4).as("avg_where"),
        min(when(cond, col("l_extendedprice"))).as("min_where"),
        max(when(cond, col("l_extendedprice"))).as("max_where"))
    },

    // distinct_count (exact, like the reference's std::unordered_set impl)
    "q_distinct_count" -> q { (s, d) =>
      T(s, d, "orders").groupBy(col("o_orderstatus")).agg(
        countDistinct(col("o_custkey")).as("dc_cust"),
        count(lit(1)).as("cnt"))
    }
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles (column names/types aligned with the Spark results)
  // ---------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(avg(l_discount), 6) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_project" ->
      """SELECT o_orderkey, upper(o_orderstatus) AS status_u,
        | o_totalprice * 2 AS dbl_price,
        | CAST(year(o_orderdate) AS INTEGER) AS o_year
        |FROM orders""".stripMargin,

    "q_const" ->
      "SELECT CAST(1+2 AS BIGINT) AS i_sum, 'a' || 'b' AS s_cat, round(CAST(3.0 AS DOUBLE)/2.0, 3) AS f_div",

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity >= 30 AND l_discount > 0.05""".stripMargin,

    "q_groupby_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 5""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, c_name, n_name, r_name
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "q_last_join" ->
      """SELECT o_orderkey, o_totalprice, r.last_line, r.last_qty
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey, l_linenumber AS last_line, l_quantity AS last_qty
        |  FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |          ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) AS rn
        |        FROM lineitem) WHERE rn = 1
        |) r ON o_orderkey = r.l_orderkey""".stripMargin,

    "q_union" ->
      "SELECT c_custkey AS key FROM customer UNION SELECT o_custkey FROM orders",

    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_sort_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",

    "q_window_rows" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS w_sum,
        | count(value) OVER w AS w_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_window_rows_range" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS r_sum,
        | count(value) OVER w AS r_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_window_nav" ->
      """SELECT event_id,
        | lag(value, 1) OVER w AS prev_v,
        | first_value(value) OVER w AS first_v,
        | last_value(value) OVER w AS last_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_agg_where" ->
      """SELECT l_returnflag,
        | round(sum(CASE WHEN l_quantity > 25 THEN l_extendedprice END), 2) AS sum_where,
        | count(CASE WHEN l_quantity > 25 THEN 1 END) AS count_where,
        | round(avg(CASE WHEN l_quantity > 25 THEN l_extendedprice END), 4) AS avg_where,
        | min(CASE WHEN l_quantity > 25 THEN l_extendedprice END) AS min_where,
        | max(CASE WHEN l_quantity > 25 THEN l_extendedprice END) AS max_where
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_distinct_count" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS dc_cust, count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus""".stripMargin
  )

  /** Headline subset run by graft.Bench at sf0.1. */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q_window_rows_range", "q_window_rows", "q_last_join",
    "q_groupby_having", "q_distinct_count")
}
