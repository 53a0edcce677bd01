package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LastJoin, Multimodal, Packing, RequestMode, Sampling, Similarity, TextOps, WindowOps}
import graft.functions.{FeatureSignature => FS, GraftAggregates => A, GraftScalars => F}
import graft.sql.GraftSql

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

    // LAST JOIN with a general (equi + residual) condition — the
    // row_number strategy (JOIN_CLAUSE.md general condition;
    // LastJoin.general). Ordering pins only the OUTPUT columns
    // (l_extendedprice, l_suppkey): deeper ties yield identical rows,
    // so the gate is data-independent.
    "q_last_join_general" -> q { (s, d) =>
      val o = T(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val li = T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_suppkey"))
      LastJoin.general(o, li,
          o("o_orderkey") === li("l_orderkey") && li("l_quantity") > 25,
          struct(li("l_extendedprice"), li("l_suppkey")))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("l_extendedprice").as("lj_price"),
          col("l_suppkey").as("lj_supp"))
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
    },

    // ---- window extensions (WINDOW_CLAUSE.md attributes) ----

    // MAXSIZE: ROWS_RANGE 10min capped to the 5 newest rows.
    // strictRowOrder = reference at-or-before ties (and the bounded
    // ROWS-frame fast path); identical to ANSI peers on this data.
    "q_window_maxsize" -> q { (s, d) =>
      val arr = WindowOps.frameArray(col("value"), col("ts_ms"), col("event_id"),
        Seq(col("user_id")), 600000L, maxSize = 5, strictRowOrder = true,
        narrowEntry = true)
      // materialize the frame array once in its own projection: the six
      // consumers then reference an attribute (CollapseProject keeps the
      // split because the producer expression is non-cheap and
      // multiply-referenced) instead of re-deriving the array 6x;
      // scoring is the one-pass imperative FrameAggExpr per aggregate
      // (zero interpreted per-element lambdas, zero array copies —
      // min/max skip nulls, distinct counts null, sum/cnt/avg the
      // non-null ones: the agg* helper semantics)
      val fagg = graft.functions.FrameAgg.agg(col("__arr"), _: String, None)
      T(s, d, "events").withColumn("__arr", arr)
        .select(
          col("event_id"),
          round(fagg("sum_double"), 3).as("m_sum"),
          fagg("count").as("m_cnt"),
          fagg("min").as("m_min"),
          fagg("max").as("m_max"),
          round(fagg("avg"), 4).as("m_avg"),
          fagg("dcount_null").as("m_dc"))
    },

    // EXCLUDE CURRENT_TIME over a minute-granular order key (forces
    // same-ts peers so the attribute actually bites)
    "q_window_exclude_ct" -> q { (s, d) =>
      val tsu = floor(col("ts_ms") / 60000L).cast("long")
      val arr = WindowOps.frameArray(col("value"), tsu, col("event_id"),
        Seq(col("user_id")), 10L, excludeCurrentTime = true)
      T(s, d, "events").select(
        col("event_id"),
        round(WindowOps.aggSum(arr), 3).as("x_sum"),
        WindowOps.aggCount(arr).as("x_cnt"))
    },

    // EXCLUDE CURRENT_ROW (same-ts peers stay, unlike range-to(-1))
    "q_window_exclude_cr" -> q { (s, d) =>
      val tsu = floor(col("ts_ms") / 60000L).cast("long")
      val arr = WindowOps.frameArray(col("value"), tsu, col("event_id"),
        Seq(col("user_id")), 10L, excludeCurrentRow = true)
      T(s, d, "events").select(
        col("event_id"),
        round(WindowOps.aggSum(arr), 3).as("c_sum"),
        WindowOps.aggCount(arr).as("c_cnt"))
    },

    // WINDOW ... UNION: frame drawn from primary ∪ side table, output
    // rows only for primary rows
    "q_window_union" -> q { (s, d) =>
      val ev = T(s, d, "events")
      val primary = ev.filter(col("event_type") === "purchase")
      val side = ev.filter(col("event_type") =!= "purchase")
      val flag = "__graft_primary"
      val u = WindowOps.windowUnion(primary, Seq(side), flag)
      val w = WindowOps.rowsRange(Seq(col("user_id")), col("ts_ms"), 600000L)
      u.select(col("event_id"), round(sum(col("value")).over(w), 3).as("u_sum"),
          col(flag))
        .filter(col(flag)).drop(flag)
    },

    // WINDOW ... UNION ... INSTANCE_NOT_IN_WINDOW: only union-side rows
    // (plus the current row) populate the frame
    "q_window_inw" -> q { (s, d) =>
      val ev = T(s, d, "events")
      val primary = ev.filter(col("event_type") === "purchase")
      val side = ev.filter(col("event_type") =!= "purchase")
      val flag = "__graft_primary"
      val u = WindowOps.windowUnion(primary, Seq(side), flag)
      val arr = WindowOps.frameArray(col("value"), col("ts_ms"), col("event_id"),
        Seq(col("user_id")), 600000L,
        isPrimary = col(flag), instanceNotInWindow = true)
      u.select(col("event_id"), round(WindowOps.aggSum(arr), 3).as("i_sum"),
          col(flag))
        .filter(col(flag)).drop(flag)
    },

    // OPEN PRECEDING: exclusive lower bound = (lo, cur] on the ms key
    "q_window_open" -> q { (s, d) =>
      val w = WindowOps.rowsRange(Seq(col("user_id")), col("ts_ms"), 599999L)
      T(s, d, "events").select(
        col("event_id"),
        round(sum(col("value")).over(w), 3).as("o_sum"),
        count(col("value")).over(w).as("o_cnt"))
    },

    // ---- UDAF long tail (SURVEY §2.3) ----

    // median (exact; interpolated middle like the reference's two-heap)
    "q_median" -> q { (s, d) =>
      T(s, d, "orders").groupBy(col("o_orderstatus"))
        .agg(round(median(col("o_totalprice")), 4).as("med_price"))
    },

    // top(value, k): k largest values desc, comma-joined string
    "q_top_k" -> q { (s, d) =>
      T(s, d, "events").groupBy(col("user_id"))
        .agg(A.topStr(col("value"), 3).as("top3"))
    },

    // entropy (Shannon, log2)
    "q_entropy" -> q { (s, d) =>
      T(s, d, "events").groupBy(col("user_id"))
        .agg(round(A.entropy(col("event_type")), 6).as("ent"))
    },

    // top1_ratio
    "q_top1_ratio" -> q { (s, d) =>
      T(s, d, "events").groupBy(col("user_id"))
        .agg(round(A.top1_ratio(col("event_type")), 6).as("t1r"))
    },

    // topn_frequency(x, 3)
    "q_topn_freq" -> q { (s, d) =>
      T(s, d, "events").groupBy(col("user_id"))
        .agg(A.topn_frequency(col("event_type"), 3).as("topn"))
    },

    // ew_avg(value, 0.5) — newest-first exponential weights
    "q_ew_avg" -> q { (s, d) =>
      T(s, d, "events").groupBy(col("user_id"))
        .agg(round(A.ew_avg(col("ts_ns"), col("value"), 0.5), 6).as("ew"))
    },

    // drawdown — max peak-to-(newer)-trough ratio
    "q_drawdown" -> q { (s, d) =>
      T(s, d, "events").groupBy(col("user_id"))
        .agg(round(A.drawdown(col("ts_ns"), col("value")), 6).as("dd"))
    },

    // *_cate family: "k1:v1,k2:v2" strings sorted by key
    "q_cate" -> q { (s, d) =>
      val ev = T(s, d, "events")
      ev.groupBy(col("user_id")).agg(
        A.cate("sum", col("value"), col("event_type")).as("sum_cate"),
        A.cate("count", col("value"), col("event_type")).as("count_cate"),
        A.cate("avg", col("value"), col("event_type")).as("avg_cate"),
        A.cate("min", col("value"), col("event_type")).as("min_cate"),
        A.cate("max", col("value"), col("event_type")).as("max_cate"))
    },

    // sum_cate_where: condition masks the category key to null (skipped)
    "q_cate_where" -> q { (s, d) =>
      T(s, d, "events").groupBy(col("user_id")).agg(
        A.cate("sum", col("value"),
          when(col("value") > 100, col("event_type"))).as("sum_cate_w"))
    },

    // ---- scalar function surface (SURVEY §2.3) ----

    // string functions
    "q_scalar_str" -> q { (s, d) =>
      T(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_type")).as("t_up"),
        lower(col("p_brand")).as("b_lo"),
        substring(col("p_name"), 3, 5).as("n_sub"),
        length(col("p_name")).as("n_len"),
        expr("replace(p_type, ' ', '_')").as("t_repl"),
        reverse(col("p_brand")).as("b_rev"),
        locate("a", col("p_name")).as("n_loc"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        F.strcmp(col("p_brand"), col("p_type")).as("cmp"),
        F.like_match(col("p_name"), "%green%").as("has_green"),
        F.ilike_match(col("p_name"), "%GREEN%").as("has_green_i"))
    },

    // math functions (libm-backed ones rounded on both sides)
    "q_scalar_math" -> q { (s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("m_abs"),
        ceil(col("l_quantity") / 7).cast("long").as("m_ceil"),
        floor(col("l_extendedprice") / 1000).cast("long").as("m_floor"),
        round(sqrt(col("l_quantity")), 6).as("m_sqrt"),
        round(exp(col("l_discount")), 6).as("m_exp"),
        round(log(col("l_quantity")), 6).as("m_ln"),
        round(log(10.0, col("l_extendedprice")), 6).as("m_log10"),
        round(log2(col("l_quantity")), 6).as("m_log2"),
        round(pow(col("l_quantity"), 2), 6).as("m_pow"),
        pmod(col("l_orderkey"), lit(7)).as("m_mod"),
        // cast to long: oracle's CAST(trunc(..) AS BIGINT) is int64 and the
        // driver's hash is dtype-sensitive (44473.0 hashes != 44473)
        F.truncate(col("l_extendedprice")).cast("long").as("m_trunc"),
        round(sin(col("l_discount")), 6).as("m_sin"),
        round(cos(col("l_tax")), 6).as("m_cos"),
        round(atan(col("l_discount")), 6).as("m_atan"),
        round(degrees(col("l_discount")), 6).as("m_deg"),
        round(radians(col("l_quantity")), 6).as("m_rad"))
    },

    // date/time functions (ms-epoch model, UTC session)
    "q_scalar_dt" -> q { (s, d) =>
      T(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("dt_y"),
        month(col("o_orderdate")).as("dt_m"),
        dayofmonth(col("o_orderdate")).as("dt_d"),
        dayofweek(col("o_orderdate")).as("dt_dow"),
        dayofyear(col("o_orderdate")).as("dt_doy"),
        weekofyear(col("o_orderdate")).as("dt_woy"),
        hour(col("o_orderdate")).as("dt_h"),
        last_day(col("o_orderdate")).as("dt_eom"),
        add_months(col("o_orderdate"), 2).as("dt_addm"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate")).as("dt_diff"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("dt_fmt"),
        unix_timestamp(col("o_orderdate")).as("dt_unix"))
    },

    // conditional expressions: CASE/BETWEEN/IN/COALESCE/NULLIF
    "q_scalar_cond" -> q { (s, d) =>
      T(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "big")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("small").as("bucket"),
        col("o_totalprice").between(50000, 150000).as("in_band"),
        col("o_orderstatus").isin("O", "F").as("is_of"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"),
        (col("o_orderkey") % 2 === 0).as("is_even"))
    },

    // JSON: get_json_object over the events.props column
    "q_json" -> q { (s, d) =>
      T(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("long").as("k_num"))
    },

    // ARRAY type + functions
    "q_array" -> q { (s, d) =>
      val arr = array(col("l_quantity"), col("l_discount"), col("l_tax"))
      T(s, d, "lineitem").filter(col("l_orderkey") < 100).select(
        col("l_orderkey"), col("l_linenumber"),
        size(arr).as("a_size"),
        array_contains(arr, 0.04).as("a_has"),
        element_at(arr, 2).as("a_second"),
        array_max(arr).as("a_max"),
        array_min(arr).as("a_min"),
        // array-typed outputs are serialized to strings: the driver's
        // pandas-side canonicalizer cannot sort/hash ndarray cells
        array_join(transform(sort_array(arr),
          x => format_string("%.2f", x)), ",").as("a_sorted"),
        array_join(transform(arr, x => format_string("%.2f", x)), ",").as("a_join"))
    },

    // MAP type + element access
    "q_map" -> q { (s, d) =>
      val m = map(lit("sz"), col("p_size").cast("long"),
        lit("dbl"), (col("p_size") * 2).cast("long"))
      T(s, d, "part").select(
        col("p_partkey"),
        element_at(m, "sz").as("m_sz"),
        element_at(m, "dbl").as("m_dbl"),
        size(m).as("m_size"))
    },

    // earth_distance (haversine, R=6372.8 km)
    "q_earth" -> q { (s, d) =>
      T(s, d, "supplier").select(
        col("s_suppkey"),
        round(F.earth_distance(
          col("s_acctbal") % 90, (col("s_acctbal") * 2) % 180,
          lit(39.9), lit(116.4)), 6).as("dist"))
    },

    // feature-zero split family
    "q_split" -> q { (s, d) =>
      val kv = concat(col("p_brand"), lit(":1,"), col("p_type"), lit(":2"))
      T(s, d, "part").select(
        col("p_partkey"),
        F.fz_join(F.fz_split(kv, ","), "|").as("sp"),
        F.fz_join(F.fz_split_by_key(kv, ",", ":"), "|").as("spk"),
        F.fz_join(F.fz_split_by_value(kv, ",", ":"), "|").as("spv"))
    },

    // ---- training-data pipeline operators ----

    // exact deduplication (hash-groupBy)
    "q_dedup_exact" -> q { (s, d) =>
      Dedup.exact(T(s, d, "documents"), "doc_id", "text")
    },

    // C4-style span-level dedup: 16-token spans duplicated anywhere in
    // the corpus are removed, keeping the globally-first occurrence
    "q_dedup_span" -> q { (s, d) =>
      Dedup.spanDedup(T(s, d, "documents"), "doc_id", "text", 16)
    },

    // incremental (first-seen) LSH near-dup verdicts over a PORTABLE
    // md5-derived MinHash — exact oracle, unlike the quality-gated
    // xxhash64 pair enumeration of q_dedup_minhash
    "q_dedup_lshseen" -> q { (s, d) =>
      Dedup.lshFirstSeen(T(s, d, "documents"), "doc_id", "text")
    },

    // word-level Jaccard near-dup pairs (inverted-index join)
    "q_dedup_jaccard" -> q { (s, d) =>
      Dedup.jaccardPairs(T(s, d, "documents"), "doc_id", "text", 0.6)
        .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
    },

    // near-dup clusters: the pairwise Jaccard output composed into
    // per-document component assignments (alternating star contraction;
    // representative = smallest doc_id reachable). Singleton docs keep
    // their own id.
    "q_dedup_components" -> q { (s, d) =>
      // set-graph CC (Dedup.jaccardComponents): identical-text cliques
      // contribute membership, not edges — the doc-pair formulation's
      // 71M edges at the 10× fixture OOM'd an 8 GiB JVM; this one
      // covers every doc directly (singletons label themselves)
      Dedup.jaccardComponents(T(s, d, "documents"), "doc_id", "text", 0.6)
        .select(col("doc_id"), col("component"))
    },

    // retention step after clustering: keep ONE canonical doc per
    // near-dup component — highest quality score, lowest id on ties
    // (the training-pipeline "dedup keep-best" policy)
    "q_dedup_keep" -> q { (s, d) =>
      val docs = T(s, d, "documents")
      // set-graph CC — see q_dedup_components for the scale rationale
      val comps = Dedup.jaccardComponents(docs, "doc_id", "text", 0.6)
      val scores = docs.select(col("doc_id"),
        floor(TextOps.qualityScore(col("text")) * 1e6).cast("long").as("score"))
      Dedup.keepBest(comps, scores)
    },

    // MinHash+LSH measured against the exact Jaccard twin (the hash
    // family is not SQL-portable, so the GATED quantity is quality:
    // recall of true J>=0.6 pairs and MAE of the minhash estimate —
    // thresholded flags the oracle can assert; raw pairs are covered by
    // DedupSimilaritySpec). Reference analog: multi-mode consistency
    // checks, hybridse/src/testing/engine_test_base.h:75-100.
    // floors set from measurement (tools/QualityProbe at sf0.01):
    // bands=8 rows=3 → recall 0.945, MAE 0.079. The exact-Jaccard truth
    // side runs on a deterministic 1/5 document subset (doc_id % 5 = 0):
    // recall measured on the subset is the same statistic, and the
    // O(pairs) exact join would otherwise dominate the timed full-corpus
    // MinHash work at bench SF (127 s of 141 s at sf0.1).
    "q_dedup_minhash" -> q { (s, d) =>
      val docs = T(s, d, "documents")
      val truth = Dedup.jaccardPairs(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text", 0.6)
      val cand = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 1, bands = 8, rowsPerBand = 3, threshold = 0.25)
      truth.join(cand, Seq("id1", "id2"), "left").agg(
        count(lit(1)).as("n_true"),
        when(avg(when(col("est_jaccard").isNotNull, 1.0).otherwise(0.0))
          >= 0.90, 1).otherwise(0).as("recall_ok"),
        when(avg(when(col("est_jaccard").isNotNull,
            abs(col("est_jaccard") - col("jaccard"))))
          <= 0.10, 1).otherwise(0).as("mae_ok"))
    },

    // SimHash quality: hamming similarity of the 64-bit fingerprints
    // must CORRELATE with true word-set Jaccard over a deterministic
    // sample of all pair kinds (every 97th (id1,id2) pair — J spans
    // 0.1..1.0 on this corpus). Measured corr 0.53 at sf0.01
    // (tools/QualityProbe; bucket means rise monotonically 0.57→0.75);
    // floor 0.40. Fingerprint rows themselves are spec-covered.
    "q_dedup_simhash" -> q { (s, d) =>
      val docs = T(s, d, "documents")
      val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      val toks = docs.select(col("doc_id"),
        array_sort(Dedup.tokens(col("text"))).as("t"))
      val pairSample = toks.as("a").join(toks.as("b"),
          col("a.doc_id") < col("b.doc_id") &&
          pmod(col("a.doc_id") * 1000 + col("b.doc_id"), lit(97)) === 0)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          (size(array_intersect(col("a.t"), col("b.t"))).cast("double") /
           size(array_union(col("a.t"), col("b.t")))).as("j"))
      pairSample
        .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
        .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
        .select(col("j"), ((lit(64) - bit_count(col("sh1").bitwiseXOR(col("sh2"))))
          .cast("double") / 64.0).as("hs"))
        .agg(count(lit(1)).as("n_pairs"),
          when(corr(col("hs"), col("j")) >= 0.40, 1).otherwise(0).as("corr_ok"))
    },

    // embedding near-dup via banded sign-LSH, gated on measured recall
    // vs the exact all-pairs cosine truth at the same threshold
    // (precision is 1.0 by construction — every emitted pair carries its
    // exact cosine). threshold 0.3 ≈ the synthetic corpus's near-dup
    // band; 8 tables × 2 planes → ~0.97 expected recall
    "q_dedup_embed" -> q { (s, d) =>
      val e = T(s, d, "embeddings")
      val found = Dedup.embeddingNearDup(e, "vec_id", "embedding",
        threshold = 0.3, planes = 2, tables = 8).select("id1", "id2")
      val vecs = e.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
      val truth = vecs.as("a")
        .join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
        .filter(col("cos") >= 0.3)
      truth.join(found, Seq("id1", "id2"), "left_semi")
        .agg(count(lit(1)).as("n_found"))
        .crossJoin(truth.agg(count(lit(1)).as("n_true")))
        .select(col("n_true"),
          when(col("n_found").cast("double") / col("n_true") >= 0.95, 1)
            .otherwise(0).as("recall_ok"))
    },

    // SemDeDup semantic dedup (k-means clusters → within-cluster
    // cosine pairs → keep ONE per dup group, farthest from centroid).
    // Gate: dup coverage — fraction of TRUE near-dup pairs (exact
    // all-pairs cosine, quadratic by design, bounded to this sf0.01
    // gate) where at least one side was removed. Measured sf0.01
    // coverage: single-probe 0.889 at nlist=8 (0.983 nlist=4, 0.775
    // nlist=16 — finer clusters split more true pairs); multi-probe
    // pair enumeration recovers the boundary splits — nprobe=2 0.998,
    // nprobe=3 1.000 at nlist=8; 0.994 at nlist=16/nprobe=2. The gate
    // runs the production configuration (nlist=8, nprobe=2) with the
    // floor at 0.95.
    "q_dedup_semantic" -> q { (s, d) =>
      val e = T(s, d, "embeddings")
      val res = Dedup.semanticDedup(e, "vec_id", "embedding",
        threshold = 0.3, nlist = 8, iters = 5, nprobe = 2)
      val kept = res.filter(col("keep")).select(col("doc_id"))
      val vecs = e.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
      val truth = vecs.as("a")
        .join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
        .filter(col("cos") >= 0.3)
      // ONE pass over the (deliberately quadratic, sf0.01-only) truth
      // join computes both counts: left-join keep indicators per side,
      // conditional count — the O(n²) subtree runs once, not twice
      val k1 = kept.select(col("doc_id").as("id1"), lit(1).as("__k1"))
      val k2 = kept.select(col("doc_id").as("id2"), lit(1).as("__k2"))
      truth.join(k1, Seq("id1"), "left").join(k2, Seq("id2"), "left")
        .agg(count(lit(1)).as("n_true"),
          count(when(col("__k1").isNotNull && col("__k2").isNotNull, 1))
            .as("__n_uncov"))
        .select(col("n_true"),
          when(col("n_true") === 0 ||
            (col("n_true") - col("__n_uncov")).cast("double") /
              col("n_true") >= 0.95, 1).otherwise(0).as("coverage_ok"))
    },

    // brute-force cosine top-k (exact ANN baseline)
    "q_ann_topk" -> q { (s, d) =>
      val e = T(s, d, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 10), e,
          "vec_id", "embedding", 5)
        .select(col("qid"), col("vec_id"), round(col("cos"), 6).as("cos"),
          col("rnk"))
    },

    // LSH-bucketed approximate top-k, gated on per-query recall@k vs
    // the exact brute-force twin (scale path; raw top-k rows are
    // spec-covered in DedupSimilaritySpec)
    "q_ann_lsh" -> q { (s, d) =>
      val e = T(s, d, "embeddings")
      val qs = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 3)
        .select(col("qid"), col("vec_id"))
      val approx = Similarity.lshTopK(qs, e, "vec_id", "embedding",
        k = 3, planes = 3, tables = 12).select(col("qid"), col("vec_id"))
      val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
      // floor from measurement: planes=3 tables=12 → min per-query hits
      // 2 of 3, aggregate recall 0.967 (tools/QualityProbe at sf0.01)
      qs.select(col("vec_id").as("qid")).join(hits, Seq("qid"), "left")
        .select(col("qid"),
          when(coalesce(col("n_hit"), lit(0L)) >= 2, 1).otherwise(0)
            .as("recall_ok"))
    },

    // int8-quantized brute force (faiss-style SQ8: 4× smaller corpus
    // scans), gated on per-query recall@3 vs the full-precision twin —
    // measured min 2/3, mean 2.96/3 at sf0.01 (tools/QualityProbe)
    "q_ann_quant" -> q { (s, d) =>
      val e = T(s, d, "embeddings")
      val qs = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 3)
        .select(col("qid"), col("vec_id"))
      val approx = Similarity.quantTopK(qs, e, "vec_id", "embedding", 3)
        .select(col("qid"), col("vec_id"))
      val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
      qs.select(col("vec_id").as("qid")).join(hits, Seq("qid"), "left")
        .select(col("qid"),
          when(coalesce(col("n_hit"), lit(0L)) >= 2, 1).otherwise(0)
            .as("recall_ok"))
    },

    // IVF approximate top-k (k-means centroid lists, nprobe probing),
    // gated on AGGREGATE recall@3 over 50 queries vs the exact twin —
    // per-query recall on uniform synthetic embeddings is high-variance
    // (true neighbors scatter across lists), so the stable measured
    // quantity is the mean: nlist=8 nprobe=4 iters=5 → 0.78 at sf0.01
    // scanning ~half the corpus (tools/QualityProbe); floor 0.70
    "q_ann_ivf" -> q { (s, d) =>
      val e = T(s, d, "embeddings")
      val qs = e.filter(col("vec_id") < 50)
      val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 3)
        .select(col("qid"), col("vec_id"))
      val approx = Similarity.ivfTopK(qs, e, "vec_id", "embedding",
        k = 3, nlist = 8, nprobe = 4, iters = 5).select(col("qid"), col("vec_id"))
      exact.join(approx, Seq("qid", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select(col("n_exact"),
          when(col("n_hit").cast("double") / col("n_exact") >= 0.70, 1)
            .otherwise(0).as("recall_ok"))
    },

    // token/char counts, stopword ratio, quality score
    "q_text_stats" -> q { (s, d) =>
      // words/char-count materialize ONCE and every metric shares the
      // attributes (the TextOps *Of forms) — composing the text-typed
      // forms re-evaluates the split/regex per reference
      val ws = col("__ws"); val nc = col("__nc")
      T(s, d, "documents")
        .withColumn("__ws", TextOps.words(col("text")))
        .withColumn("__nc", TextOps.charCount(col("text")))
        .select(
          col("doc_id"),
          size(ws).as("n_tokens"),
          nc.as("n_chars_x"),
          round(nc.cast("double") / size(ws), 6).as("avg_wlen"),
          round(TextOps.stopwordRatioOf(ws), 6).as("stop_ratio"),
          // floor(x*1e6), not round(x,6): Spark HALF_UP and DuckDB's
          // multiply-then-std::round disagree 1 ulp on .5-boundary doubles
          floor(TextOps.qualityScoreOf(ws, nc) * 1e6).cast("long")
            .as("q_score"))
    },

    // repetition metrics (Gopher/C4 duplicate-text quality filters):
    // duplicate-word and duplicate-3-gram fractions, floor(x*1e6) to
    // sidestep decimal-boundary rounding in the hash compare
    "q_text_repetition" -> q { (s, d) =>
      // materialize the split ONCE (CollapseProject keeps a non-cheap
      // multiply-referenced producer): the three metrics then share
      // the attribute instead of re-splitting per reference
      val ws = col("__ws")
      T(s, d, "documents")
        .withColumn("__ws", TextOps.words(col("text")))
        .select(
          col("doc_id"),
          size(ws).as("n_words"),
          floor(TextOps.dupWordFractionOf(ws) * 1e6).cast("long")
            .as("dup_word_f6"),
          floor(TextOps.dupNgramFractionOf(ws, 3) * 1e6).cast("long")
            .as("dup_3gram_f6"))
    },

    // benchmark decontamination: training docs sharing any word
    // 3-gram with the probe set (doc_id % 50 = 0 plays the benchmark)
    // are flagged — 257 of 490 on this near-dup-dense corpus at sf0.01
    "q_decontaminate" -> q { (s, d) =>
      val docs = T(s, d, "documents")
      Dedup.decontaminate(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", n = 3)
        .select(col("doc_id"), col("contaminated"))
    },

    // Bloom-prefiltered decontamination at the 13-gram overlap rule
    // (the GPT-3-report convention; 3-grams over-flag 98% of this
    // template-heavy corpus, 13-grams flag the true contamination —
    // the regime the prefilter exists for). Verdicts are bit-identical
    // to the exact path: false positives die in the exact verify; the
    // win is that clean documents (virtually all of a 100 TB corpus)
    // are dismissed inside the scan without exploding their grams
    "q_decontaminate_bloom" -> q { (s, d) =>
      val docs = T(s, d, "documents")
      Dedup.decontaminateBloom(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", n = 13)
        .select(col("doc_id"), col("contaminated"))
    },

    // BPE-ish token counting (letter/digit/punct runs)
    "q_token_bpe" -> q { (s, d) =>
      T(s, d, "documents").select(
        col("doc_id"),
        TextOps.tokenCountBpe(col("text")).as("n_bpe"),
        TextOps.tokenCount(col("text")).as("n_ws"))
    },

    // n-gram-heuristic language ID
    "q_lang_id" -> q { (s, d) =>
      T(s, d, "documents")
        .withColumn("__ws", TextOps.words(col("text")))
        .select(col("doc_id"),
          TextOps.langIdOf(col("__ws")).as("lang_pred"))
    },

    // document fingerprinting (normalized md5)
    "q_fingerprint" -> q { (s, d) =>
      T(s, d, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
    },

    // overlapping token-window chunking (context-window prep): one row
    // per chunk, md5 of the chunk text keeps the gate output narrow
    "q_text_chunks" -> q { (s, d) =>
      T(s, d, "documents")
        .select(col("doc_id"),
          explode(TextOps.chunks(col("text"), 64, 48)).as("c"))
        .select(col("doc_id"), col("c")("chunk_idx").as("chunk_idx"),
          col("c")("n_tokens").as("n_tokens"),
          md5(col("c")("chunk")).as("chunk_md5"))
    },

    // PII redaction over synthesized identifiers (the corpus itself is
    // clean words, so both sides append a deterministic email + ipv4
    // per row and the redaction must normalize them away)
    "q_text_redact" -> q { (s, d) =>
      val withPii = concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com from 10.0.0."),
        pmod(col("doc_id"), lit(256)))
      T(s, d, "documents").select(col("doc_id"),
        md5(TextOps.redact(withPii)).as("red_md5"),
        (length(withPii) - length(TextOps.redact(withPii))).as("delta"))
    },

    // multimodal binary columns with REAL image decode: synthesize a
    // genuine PNG per document (ImageIO encode in-executor), decode it
    // back with javax.imageio, emit exact integer pixel stats — the
    // pixel formula is closed-form so DuckDB recomputes the expected
    // statistics from doc_id alone (full oracle, not rows-only)
    "q_multimodal" -> q { (s, d) =>
      val media = Multimodal.withPngPayload(T(s, d, "documents"), "doc_id")(s)
      Multimodal.extractFeatures(media, new Multimodal.ImageDecoder)(s)
        .toDF()
        .select(col("id").as("doc_id"),
          element_at(col("features"), 1).cast("int").as("img_w"),
          element_at(col("features"), 2).cast("int").as("img_h"),
          element_at(col("features"), 3).cast("long").as("sum_r"),
          element_at(col("features"), 4).cast("long").as("sum_g"),
          element_at(col("features"), 5).cast("long").as("sum_b"),
          element_at(col("features"), 6).cast("int").as("min_c"),
          element_at(col("features"), 7).cast("int").as("max_c"),
          element_at(col("features"), 8).cast("long").as("n_px"))
    },

    // real WAV decode through javax.sound.sampled over in-executor
    // synthesized RIFF/PCM16 payloads; closed-form sample formula
    // (Multimodal.wavSample) lets DuckDB recompute every statistic
    // from doc_id alone
    "q_multimodal_audio" -> q { (s, d) =>
      val media = Multimodal.withWavPayload(T(s, d, "documents"), "doc_id")(s)
      Multimodal.extractFeatures(media, new Multimodal.AudioDecoder)(s)
        .toDF()
        .select(col("id").as("doc_id"),
          element_at(col("features"), 1).cast("int").as("n_chan"),
          element_at(col("features"), 2).cast("int").as("rate_hz"),
          element_at(col("features"), 3).cast("long").as("n_frames"),
          element_at(col("features"), 4).cast("long").as("s_min"),
          element_at(col("features"), 5).cast("long").as("s_max"),
          element_at(col("features"), 6).cast("long").as("s_sum"),
          element_at(col("features"), 7).cast("long").as("s_sum_abs"),
          element_at(col("features"), 8).cast("long").as("n_loud"))
    },

    // REAL multi-frame video decode (animated GIF, the one container
    // with a JDK codec): genuine GIFs synthesized in-executor, decoded
    // frame-by-frame with ImageIO; the closed-form luma formula lets
    // DuckDB recompute every statistic from doc_id alone
    "q_multimodal_video" -> q { (s, d) =>
      val media = Multimodal.withGifPayload(T(s, d, "documents"), "doc_id")(s)
      Multimodal.extractFeatures(media, new Multimodal.VideoDecoder)(s)
        .toDF()
        .select(col("id").as("doc_id"),
          element_at(col("features"), 1).cast("int").as("n_frames"),
          element_at(col("features"), 2).cast("int").as("width"),
          element_at(col("features"), 3).cast("int").as("height"),
          element_at(col("features"), 4).cast("long").as("l_sum"),
          element_at(col("features"), 5).cast("int").as("l_min"),
          element_at(col("features"), 6).cast("int").as("l_max"),
          element_at(col("features"), 7).cast("long").as("l_sum_f0"),
          element_at(col("features"), 8).cast("long").as("n_px"))
    },

    // REAL nearest-neighbor resize: PNG decode → integer-floor pixel
    // sampling → lossless PNG re-encode → decode stats; the sampling
    // rule is closed-form so DuckDB replays it from doc_id alone
    "q_img_resize" -> q { (s, d) =>
      val media = Multimodal.withPngPayload(T(s, d, "documents"), "doc_id")(s)
      val resized = Multimodal.resizeImages(media, 3, 2)(s)
      Multimodal.extractFeatures(resized, new Multimodal.ImageDecoder)(s)
        .toDF()
        .select(col("id").as("doc_id"),
          element_at(col("features"), 1).cast("int").as("width"),
          element_at(col("features"), 2).cast("int").as("height"),
          element_at(col("features"), 3).cast("long").as("sum_r"),
          element_at(col("features"), 4).cast("long").as("sum_g"),
          element_at(col("features"), 5).cast("long").as("sum_b"),
          element_at(col("features"), 6).cast("int").as("c_min"),
          element_at(col("features"), 7).cast("int").as("c_max"))
    },

    // REAL temporal frame sampling: animated-GIF decode → keep every
    // 2nd frame → re-encode → multi-frame decode stats
    "q_vid_sample" -> q { (s, d) =>
      val media = Multimodal.withGifPayload(T(s, d, "documents"), "doc_id")(s)
      val sampled = Multimodal.sampleFrames(media, 2)(s)
      Multimodal.extractFeatures(sampled, new Multimodal.VideoDecoder)(s)
        .toDF()
        .select(col("id").as("doc_id"),
          element_at(col("features"), 1).cast("int").as("n_frames"),
          element_at(col("features"), 2).cast("int").as("width"),
          element_at(col("features"), 3).cast("int").as("height"),
          element_at(col("features"), 4).cast("long").as("l_sum"),
          element_at(col("features"), 5).cast("int").as("l_min"),
          element_at(col("features"), 6).cast("int").as("l_max"),
          element_at(col("features"), 7).cast("long").as("l_sum_f0"))
    },

    // ---- round 2: wider SURVEY §2 coverage ----

    // statistical UDAFs (aggregate_def.cc:294-445)
    "q_stddev" -> q { (s, d) =>
      T(s, d, "orders").groupBy(col("o_orderstatus")).agg(
        round(stddev_samp(col("o_totalprice")), 4).as("sd_samp"),
        round(stddev_pop(col("o_totalprice")), 4).as("sd_pop"),
        round(var_samp(col("o_totalprice")), 2).as("v_samp"),
        round(var_pop(col("o_totalprice")), 2).as("v_pop"))
    },

    // WITH clause / subquery-in-FROM (transform.cc:181-185, kQuerySub)
    "q_with" -> q { (s, d) =>
      val big = T(s, d, "orders").filter(col("o_totalprice") > 150000)
        .select(col("o_custkey"), col("o_totalprice"))
      val cnt = big.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      val sum = big.groupBy(col("o_custkey"))
        .agg(round(org.apache.spark.sql.functions.sum(col("o_totalprice")), 2).as("s_big"))
      cnt.join(sum, "o_custkey")
    },

    // SetOperation: UNION ALL / INTERSECT / EXCEPT
    "q_union_all" -> q { (s, d) =>
      T(s, d, "customer").select(col("c_nationkey").as("nk"))
        .unionAll(T(s, d, "supplier").select(col("s_nationkey")))
        .groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
    },
    "q_intersect" -> q { (s, d) =>
      T(s, d, "customer").select(col("c_custkey").as("key"))
        .intersect(T(s, d, "orders").select(col("o_custkey")))
    },
    "q_except" -> q { (s, d) =>
      T(s, d, "customer").select(col("c_custkey").as("key"))
        .except(T(s, d, "orders").select(col("o_custkey")))
    },

    // failable casts return NULL (OpenMLDB cast semantics → try_cast)
    "q_cast" -> q { (s, d) =>
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_cast(cast(l_orderkey AS string) AS int)").as("c_ok"),
        expr("try_cast(concat('x', l_orderkey) AS int)").as("c_bad"),
        expr("try_cast(l_orderkey AS smallint)").as("c_narrow"),
        col("l_quantity").cast("string").as("c_str"),
        expr("try_cast('1994-02-15' AS date)").as("c_date"),
        expr("try_cast('not a date' AS date)").as("c_nodate"))
    },

    // nth_value_where(value, n, cond) (window_functions_def.cc:342)
    "q_nth_value_where" -> q { (s, d) =>
      val cond = col("event_type") === "click"
      val v = struct(col("value").as("value"), cond.as("cond"))
      val arr = WindowOps.frameArray(v, col("ts_ms"), col("event_id"),
        Seq(col("user_id")), 3600000L)
      T(s, d, "events").select(
        col("event_id"),
        round(WindowOps.aggNthValueWhere(arr, 2), 3).as("nth2"),
        round(WindowOps.aggNthValueWhere(arr, -1), 3).as("nth_last"))
    },

    // window_split family (feature_zero_def.cc window_split*)
    "q_window_split" -> q { (s, d) =>
      val kv = concat(col("event_type"), lit(":"),
        format_string("%.3f", col("value")))
      val arr = WindowOps.frameArray(kv, col("ts_ms"), col("event_id"),
        Seq(col("user_id")), 600000L)
      T(s, d, "events").select(
        col("event_id"),
        F.fz_join(WindowOps.aggWindowSplitByKey(arr, ",", ":"), "|").as("wsk"),
        F.fz_join(WindowOps.aggWindowSplitByValue(arr, ",", ":"), "|").as("wsv"))
    },

    // top_n_{key,value}_sum_cate_where (sum_by_category_def.cc:275-339)
    "q_topn_cate" -> q { (s, d) =>
      val cond = col("value") > 50
      T(s, d, "events").groupBy(col("user_id")).agg(
        A.top_n_key_cate("sum", col("value"),
          when(cond, col("event_type")), 2).as("tnk"),
        A.top_n_value_cate("sum", col("value"),
          when(cond, col("event_type")), 2).as("tnv"))
    },

    // list_except_by_key / list_except_by_value (feature_zero_def.cc:768-800)
    "q_list_except" -> q { (s, d) =>
      val kv = concat(col("p_brand"), lit(":1,"), col("p_type"), lit(":2"))
      val list = F.fz_split(kv, ",")
      T(s, d, "part").select(
        col("p_partkey"),
        F.fz_join(F.fz_list_except_by_key(list, col("p_brand")), "|").as("lek"),
        F.fz_join(F.fz_list_except_by_value(list, lit("2")), "|").as("lev"))
    },

    // feature-signature export formats (feature_signature_def.cc)
    "q_feature_sig" -> q { (s, d) =>
      val price = col("o_totalprice")
      val label = (col("o_orderstatus") === "F").cast("boolean")
      T(s, d, "orders").select(
        col("o_orderkey"),
        FS.csvFormat(FS.continuous(price), FS.binary_label(label),
          FS.continuous(col("o_custkey"))).as("f_csv"),
        FS.libsvmFormat(FS.continuous(price), FS.binary_label(label),
          FS.continuous(col("o_custkey"))).as("f_libsvm"),
        FS.gcformat(FS.continuous(price), FS.binary_label(label),
          FS.gcformat_index(col("o_orderkey"))).as("f_gc"))
    },

    // LAST JOIN feeding window features (window_joins_, the reference's
    // benchmark query shape — Util.java:71-110)
    "q_join_window" -> q { (s, d) =>
      val o = T(s, d, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"))
      val li = T(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
      val lj = LastJoin(o, li, Seq("o_orderkey"), Seq("l_orderkey"),
        Some(struct(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-3, 0)
      lj.select(col("o_orderkey"),
        round(sum(col("l_quantity")).over(w), 3).as("w_qty"),
        count(col("l_quantity")).over(w).as("w_cnt"))
    },

    // batch request mode: point-in-time features for request rows
    // (BuildBatchRequestModePhysicalPlan, RequestUnionRunner)
    "q_request_mode" -> q { (s, d) =>
      val ev = T(s, d, "events")
      // one scan: filter+unionWithHistory would read events twice
      val u = RequestMode.tagRequests(ev, col("event_id") % 97 === 0)
      val arr = RequestMode.pointInTimeFrame(u, col("value"), col("ts_ms"),
        col("event_id"), Seq(col("user_id")), 600000L)
      u.select(col("event_id"),
          round(WindowOps.aggSum(arr), 3).as("pit_sum"),
          WindowOps.aggCount(arr).as("pit_cnt"),
          col(RequestMode.FlagCol))
        .filter(col(RequestMode.FlagCol)).drop(RequestMode.FlagCol)
    },

    // full-table Aggregate (physical_op.h:814 — one output row, no keys)
    "q_agg_full" -> q { (s, d) =>
      T(s, d, "lineitem").agg(
        round(sum(col("l_extendedprice")), 2).as("s_price"),
        count(lit(1)).as("cnt"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
    },

    // multiple windows in one SELECT — the reference stitches parallel
    // window ops with ConcatJoin (transform.cc:393-465); Spark plans
    // them as chained Window operators in one pass, no stitch join
    "q_multi_window" -> q { (s, d) =>
      val w1 = WindowOps.rowsRange(Seq(col("user_id")), col("ts_ms"), 600000L)
      val w2 = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_ms"), col("event_id")).rowsBetween(-2, 0)
      T(s, d, "events").select(
        col("event_id"),
        round(sum(col("value")).over(w1), 3).as("w1_sum"),
        round(sum(col("value")).over(w2), 3).as("w2_sum"),
        count(col("value")).over(w1).as("w1_cnt"))
    },

    // string long tail: hex/unhex/char/char_length (InitStringUdf)
    "q_scalar_str2" -> q { (s, d) =>
      T(s, d, "part").select(
        col("p_partkey"),
        hex(encode(col("p_brand"), "UTF-8")).as("hx"),
        decode(unhex(hex(encode(col("p_brand"), "UTF-8"))), "UTF-8").as("unhx"),
        char_length(col("p_name")).as("clen"),
        expr("char(65 + CAST(p_partkey % 26 AS INT))").as("chr"),
        substring_index(col("p_type"), " ", 1).as("first_word"),
        lpad(col("p_brand"), 12, "*").as("pad"),
        rtrim(ltrim(concat(lit("  "), col("p_brand"), lit("  ")))).as("trimmed"))
    },

    // json_array_length (json_defs.cc:109-133) + nested get_json_object
    "q_json2" -> q { (s, d) =>
      val arr = concat(lit("[1,2,"), col("event_id") % 10, lit("]"))
      T(s, d, "events").select(
        col("event_id"),
        json_array_length(arr).as("jlen"),
        get_json_object(concat(lit("{\"a\":{\"b\":"), col("user_id"),
          lit("}}")), "$.a.b").cast("long").as("nested"))
    },

    // array long tail: array_combine-style zip, array_position, slice
    "q_array2" -> q { (s, d) =>
      val a = array(col("l_quantity"), col("l_discount"), col("l_tax"))
      T(s, d, "lineitem").filter(col("l_orderkey") < 100).select(
        col("l_orderkey"), col("l_linenumber"),
        array_position(a, col("l_discount")).as("pos"),
        array_join(transform(slice(a, 1, 2),
          x => format_string("%.2f", x)), ",").as("sl"),
        array_join(transform(zip_with(a, a, (x, y) => x + y), v =>
          format_string("%.2f", v)), ",").as("zipped"),
        size(array_distinct(a)).as("ndist"))
    },

    // CREATE TABLE + INSERT + DELETE + SELECT (GraftCatalog)
    // the full statement lifecycle driven through SQL TEXT (the user's
    // first contact surface): CREATE TABLE / INSERT VALUES / DELETE,
    // then a dialect SELECT over the result. Fixed name + replace =
    // idempotent; the view must outlive this call because the returned
    // plan evaluates lazily.
    "q_ddl_dml" -> q { (s, d) =>
      val name = "t_graft_ddl_demo"
      GraftSql.statement(s,
        s"CREATE TABLE $name (id bigint, grp string, v double)")
      GraftSql.statement(s,
        s"""INSERT INTO $name VALUES
           |(1, 'a', 10.0), (2, 'a', 20.0), (3, 'b', 30.0), (4, 'b', 40.0)""".stripMargin)
      GraftSql.statement(s, s"DELETE FROM $name WHERE id = 2")
      GraftSql.sql(s,
        s"""SELECT grp, round(sum(v), 2) AS s, count(*) AS c
           |FROM $name GROUP BY grp""".stripMargin)
    },

    // long-window pre-agg MV (LongWindowOptimized): 30-minute frame
    // answered from 5-minute bucket partials + raw edges; oracle is the
    // DIRECT window formulation — proving the rewrite is lossless
    "q_long_window" -> q { (s, d) =>
      val ev = T(s, d, "events")
      val pre = graft.operators.LongWindow.buildPreAgg(
        ev, col("user_id"), col("ts_ms"), col("value"), 300000L)
      graft.operators.LongWindow.sumCountOverLongWindow(ev, pre,
          col("user_id"), col("ts_ms"), col("value"), col("event_id"),
          precedingMs = 1800000L, bucketMs = 300000L)
        .select(col("event_id"), round(col("lw_sum"), 3).as("lw_sum"),
          col("lw_cnt"))
    },

    // incremental MV maintenance (the reference's ingest-time
    // aggregator, src/storage/aggregator.cc): history MV + appended
    // tail slice merged via LongWindow.updatePreAgg — only the slice is
    // re-aggregated, the raw history is never re-read — then the SAME
    // serving arithmetic as q_long_window. Oracle is the direct full
    // window: proving append-then-query is lossless end-to-end.
    "q_long_window_inc" -> q { (s, d) =>
      val ev = T(s, d, "events")
      val mm = ev.agg(min(col("ts_ms")), max(col("ts_ms"))).head
      val split = (mm.getLong(0) + mm.getLong(1)) / 2
      val hist = ev.filter(col("ts_ms") < split)
      val appended = ev.filter(col("ts_ms") >= split)
      val mv0 = graft.operators.LongWindow.buildPreAgg(
        hist, col("user_id"), col("ts_ms"), col("value"), 300000L)
      val mv = graft.operators.LongWindow.updatePreAgg(
        mv0, appended, col("user_id"), col("ts_ms"), col("value"), 300000L)
      graft.operators.LongWindow.sumCountOverLongWindow(ev, mv,
          col("user_id"), col("ts_ms"), col("value"), col("event_id"),
          precedingMs = 1800000L, bucketMs = 300000L)
        .select(col("event_id"), round(col("lw_sum"), 3).as("lw_sum"),
          col("lw_cnt"))
    },

    // the same MV arithmetic END-TO-END through the SQL front-end:
    // DEPLOY ... OPTIONS(long_windows='w:5m') then serve the corpus
    // through the deployment — the pre-agg partials (not the raw
    // frame) answer the sum/count (DEPLOY_STATEMENT.md:108-143,
    // long_window_optimized.h:29-50). Same-ms ties deduped on both
    // sides (see q_stream_deploy).
    "q_sql_long_window" -> q { (s, d) =>
      val tieW = Window.partitionBy(col("user_id"), col("ts_ms"))
        .orderBy(col("event_id"))
      val ev = T(s, d, "events")
        .withColumn("__rn", row_number().over(tieW))
        .filter(col("__rn") === 1).drop("__rn")
      ev.createOrReplaceTempView("lw_sql_events")
      GraftSql.statement(s,
        """DEPLOY q_sql_lw_dep OPTIONS (long_windows='w:5m', overwrite=true)
          |SELECT event_id, round(sum(value) OVER w, 3) AS lw_sum,
          |  count(value) OVER w AS lw_cnt
          |FROM lw_sql_events WINDOW w AS (PARTITION BY user_id
          |  ORDER BY ts_ms
          |  ROWS_RANGE BETWEEN 30m PRECEDING AND CURRENT ROW)""".stripMargin)
      graft.sql.StreamDeploy.serveDeployment(s, "q_sql_lw_dep", ev)
        .select(col("event_id"), col("lw_sum"), col("lw_cnt"))
    },

    // the reference's benchmark query shape (benchmark/.../Util.java:71-110,
    // BASELINE.md): scalar exprs + one window × {distinct_count, sum,
    // count, avg, 2× case-when-count} over ROWS_RANGE MAXSIZE, plus a
    // LAST JOIN to a dimension table
    "q_bench_shape" -> q { (s, d) =>
      val ev = T(s, d, "events")
      val cust = T(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val joined = LastJoin(ev, cust, Seq("user_id"), Seq("c_custkey"),
        Some(col("c_custkey")))
      // ONE collect per row serves all five window outputs. The
      // conditional memberships (click-count, big-count) are
      // precomputed PER ROW before the collect — codegen'd once per
      // input row — so frame scoring is a FrameAggExpr one-pass loop
      // per aggregate with zero per-element Catalyst interpretation
      // (this query is the reference's own benchmark shape and the
      // serving path's hot code; the interpreted-lambda formulation
      // was the engine's one measured scale-killer eval class).
      val fa = WindowOps.frameArray(
        struct(col("value").as("v"),
          when(col("event_type") === "click", col("value")).as("cv"),
          when(col("value") > 100, col("value")).as("bv")),
        col("ts_ms"), col("event_id"), Seq(col("user_id")),
        2592000000L, maxSize = 100, strictRowOrder = true,
        narrowEntry = true)
      val a = col("__arr")
      val fagg = graft.functions.FrameAgg.agg(a, _: String, _: Option[String])
      joined.withColumn("__arr", fa).select(
        col("event_id"),
        upper(col("event_type")).as("et_up"),
        (col("value") * 2).as("v2"),
        col("c_nationkey"),
        round(col("c_acctbal") / 100, 4).as("bal_h"),
        fagg("dcount", Some("v")).as("w_dc"),
        round(fagg("sum_double", Some("v")), 3).as("w_sum"),
        fagg("count", Some("v")).as("w_cnt"),
        // avg is (w_sum, w_cnt)-determined; its decimal representation
        // lands exactly on rounding boundaries (2-decimal inputs / small
        // counts), so it is not hash-compared separately
        fagg("count", Some("cv")).as("w_clicks"),
        fagg("count", Some("bv")).as("w_big"))
    },

    // skew-parallelized window (openmldb.window.skew.opt analog):
    // oracle is the DIRECT window — the rewrite must be lossless
    "q_skew_window" -> q { (s, d) =>
      // bucketMs = 4× the frame span: tail-only replication then
      // duplicates only 1/4 of rows (SkewWindow scaladoc) while a hot
      // key still cuts into span/bucketMs ≈ 1080 tasks on this corpus
      graft.operators.SkewWindow.rangeSumCount(T(s, d, "events"),
          col("user_id"), col("ts_ms"), col("value"),
          precedingMs = 600000L, bucketMs = 2400000L)
        .select(col("event_id"), round(col("sw_sum"), 3).as("sw_sum"),
          col("sw_cnt"))
    },

    // the skew rewrite on ACTUALLY HOT keys — user_id % 4 gives 4 keys
    // of ~25k rows each, so the plain window serializes each key in
    // one task (4 of 32 cores busy) while the bucketed plan spreads
    // them: the configuration the operator exists for (its twin on
    // uniform keys, q_skew_window, measures the overhead bound instead)
    "q_skew_window_hot" -> q { (s, d) =>
      graft.operators.SkewWindow.rangeSumCount(
          T(s, d, "events").withColumn("hk", col("user_id") % 4),
          col("hk"), col("ts_ms"), col("value"),
          precedingMs = 600000L, bucketMs = 2400000L)
        .select(col("event_id"), round(col("sw_sum"), 3).as("sw_sum"),
          col("sw_cnt"))
    },

    // skew salting composed with the frame-array SLOW path (EXCLUDE
    // CURRENT_TIME forces the collect-then-filter pipeline): user_id%10
    // makes 10 hot keys, each cut into time buckets so no task buffers a
    // key's whole span. Oracle is the direct per-row frame — the salted
    // rewrite must be lossless.
    "q_skew_window_arr" -> q { (s, d) =>
      val base = T(s, d, "events").withColumn("hk", col("user_id") % 10)
      val out = graft.operators.SkewWindow.withFrameArray(base, "__arr",
        col("value"), col("ts_ms"), col("event_id"), Seq(col("hk")),
        precedingMs = 600000L, bucketMs = 2400000L,
        maxSize = 5, excludeCurrentTime = true)
      val a = col("__arr")
      out.select(col("event_id"),
        round(WindowOps.aggSum(a), 3).as("k_sum"),
        WindowOps.aggCount(a).as("k_cnt"),
        WindowOps.aggMax(a).as("k_max"))
    },

    // ---- SQL dialect front-end (graft.sql.GraftSql) ----
    // The same semantics as the DataFrame-level queries, but entering
    // through the OpenMLDB SQL dialect text — parser + planner under
    // the same DuckDB correctness gate.

    "q_sql_agg" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT o_orderstatus, round(sum(o_totalprice), 2) AS s_price,
          |  count(*) AS cnt
          |FROM orders GROUP BY o_orderstatus HAVING count(*) > 10""".stripMargin,
        Map("orders" -> T(s, d, "orders")))
    },

    // parameterized query: `?` placeholders bound in order, typed by
    // the runtime value (cases/query/parameterized_query.yaml;
    // hybridse/include/node/sql_node.h ParameterExpr)
    "q_sql_param" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT o_orderkey, o_totalprice FROM orders
          |WHERE o_totalprice > ? AND o_orderstatus = ?""".stripMargin,
        Map("orders" -> T(s, d, "orders")),
        params = Seq(150000.0, "F"))
    },

    "q_sql_window" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT event_id, round(sum(value) OVER w, 3) AS r_sum,
          |  count(value) OVER w AS r_cnt
          |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
          |  ROWS_RANGE BETWEEN 10m PRECEDING AND CURRENT ROW)""".stripMargin,
        Map("events" -> T(s, d, "events")))
    },

    "q_sql_maxsize" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT event_id, count(value) OVER w AS m_cnt
          |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
          |  ROWS_RANGE BETWEEN 10m PRECEDING AND CURRENT ROW MAXSIZE 5)""".stripMargin,
        Map("events" -> T(s, d, "events")))
    },

    // the same window computed under the planner's skew optimization
    // (SET @@window_skew_opt: time-bucket replication, SkewWindowSqlSpec;
    // reference openmldb-batch spark.openmldb.window.skew.opt) — the
    // bucketed plan must stay hash-identical to the unsalted oracle
    "q_sql_skew_window" -> q { (s, d) =>
      graft.sql.GraftSql.statement(s, "SET @@window_skew_opt = 'true'")
      try graft.sql.GraftSql.sql(s,
        """SELECT event_id, round(sum(value) OVER w, 3) AS k_sum,
          |  count(value) OVER w AS k_cnt
          |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
          |  ROWS_RANGE BETWEEN 10m PRECEDING AND CURRENT ROW)""".stripMargin,
        Map("events" -> T(s, d, "events")))
      finally graft.sql.GraftSql.statement(s, "SET @@window_skew_opt = 'false'")
    },

    // window-then-aggregate composition: GROUP BY over a windowed
    // subquery (the reference composes via subqueries and REJECTS
    // window+GROUP BY in one SELECT — function/v040/test_groupby.yaml
    // id 23 expects failure; transform.cc:393-465). Integer sums keep
    // the oracle hash exact.
    "q_window_then_agg" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT et, sum(w_cnt) AS s, count(*) AS c FROM (
          |  SELECT event_type AS et, count(value) OVER w AS w_cnt
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
          |    ROWS_RANGE BETWEEN 10m PRECEDING AND CURRENT ROW)
          |) GROUP BY et""".stripMargin,
        Map("events" -> T(s, d, "events")))
    },

    // aggregate-then-window composition: a window over GROUP BY output
    "q_agg_then_window" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT user_id, cnt, sum(cnt) OVER w AS run_cnt FROM (
          |  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
          |) WINDOW w AS (PARTITION BY user_id % 100 ORDER BY user_id
          |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
        Map("events" -> T(s, d, "events")))
    },

    "q_sql_last_join" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT o.o_orderkey AS o_orderkey, o.o_totalprice AS o_totalprice,
          |  li.l_linenumber AS last_line, li.l_quantity AS last_qty
          |FROM orders o LAST JOIN lineitem li
          |  ORDER BY struct(li.l_linenumber, li.l_quantity, li.l_extendedprice)
          |  ON o.o_orderkey = li.l_orderkey""".stripMargin,
        Map("orders" -> T(s, d, "orders"), "lineitem" -> T(s, d, "lineitem")))
    },

    // SELECT DISTINCT through the SQL front-end (distinct_query corpus)
    "q_sql_distinct" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
        Map("orders" -> T(s, d, "orders")))
    },

    // column AND table aliases through the dialect front end (the
    // Rename operator — previously corpus/spec-verified only)
    "q_sql_alias" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT o.o_orderkey AS id, o.o_totalprice AS price,
          |  o.o_orderstatus AS st
          |FROM orders AS o WHERE o.o_orderkey < 1000""".stripMargin,
        Map("orders" -> T(s, d, "orders")))
    },

    // LAST JOIN with an interval-literal range condition — the as-of
    // range-join shape (cases/plan/join_query.yaml ids 7-1/7-2):
    // each event joins its latest strictly-earlier same-user event
    // within one day
    "q_sql_interval_join" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT e.event_id AS event_id, r.event_id AS prev_event
          |FROM events e LAST JOIN events r
          |  ORDER BY struct(r.ts, r.event_id)
          |  ON e.user_id = r.user_id
          |    AND r.ts BETWEEN e.ts - 1d AND e.ts - 1s""".stripMargin,
        Map("events" -> T(s, d, "events")))
    },

    "q_sql_window_union" -> q { (s, d) =>
      val ev = T(s, d, "events")
      graft.sql.GraftSql.sql(s,
        """SELECT event_id, round(sum(value) OVER w, 3) AS u_sum
          |FROM ev_primary WINDOW w AS (UNION ev_side
          |  PARTITION BY user_id ORDER BY ts_ms
          |  ROWS_RANGE BETWEEN 10m PRECEDING AND CURRENT ROW)""".stripMargin,
        Map("ev_primary" -> ev.filter(col("event_type") === "purchase"),
          "ev_side" -> ev.filter(col("event_type") =!= "purchase")))
    },

    // SQL-driven request mode (DEPLOY semantics): same split and frame
    // as q_request_mode, entering through dialect SQL text
    "q_sql_request" -> q { (s, d) =>
      val ev = T(s, d, "events")
      graft.sql.GraftSql.requestMode(s,
        """SELECT event_id, round(sum(value) OVER w, 3) AS pit_sum,
          |  count(value) OVER w AS pit_cnt
          |FROM hist WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
          |  ROWS_RANGE BETWEEN 10m PRECEDING AND CURRENT ROW)""".stripMargin,
        requests = ev.filter(col("event_id") % 97 === 0),
        tables = Map("hist" -> ev.filter(col("event_id") % 97 =!= 0)))
    },

    // Generic streaming DEPLOY, run in batch mode: every event is an
    // insert + request, answered from per-key TTL state — the same
    // compiled pipeline a readStream feed would run (StreamDeploy;
    // reference runner.cc:1984-2123). Nav fn + range aggs in one deploy.
    // reproducible content-addressed Bernoulli sample (md5 order —
    // stable under retries/repartitioning, portable to the oracle)
    "q_sample_hash" -> q { (s, d) =>
      Sampling.hashSample(T(s, d, "documents"), col("doc_id"), 0.2, "s9")
        .select(col("doc_id"), col("lang"), col("n_chars"))
    },

    // stratified fixed-quota sample: 30 docs per language, chosen by
    // the same deterministic coordinate
    "q_sample_stratified" -> q { (s, d) =>
      Sampling.stratified(T(s, d, "documents"), col("lang"),
        col("doc_id"), quota = 30, salt = "s9")
        .select(col("lang"), col("doc_id"))
    },

    // mixture rebalancing: downsample languages to a 50/25/25 target
    // mix (largest achievable under downsampling-only; unlisted
    // languages drop) — deterministic via the content-addressed
    // coordinate
    "q_rebalance" -> q { (s, d) =>
      Sampling.rebalance(T(s, d, "documents"), col("lang"),
          col("doc_id"),
          Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), salt = "r14")
        .select(col("doc_id"), col("lang"))
    },

    // temperature-flattened mixing (T5/multilingual rule): shares
    // p_s ∝ n_s^(1/T), downsample-only; rates quantized to 1e-6 so
    // DuckDB's pow replays the identical keep set
    "q_temperature_mix" -> q { (s, d) =>
      Sampling.temperatureMix(T(s, d, "documents"), col("lang"),
          col("doc_id"), temperature = 2.0, salt = "t15")
        .select(col("doc_id"), col("lang"))
    },

    // weighted (importance) sampling: keep-probability proportional
    // to document length, content-addressed so any engine/retry
    // selects the identical subset
    "q_sample_weighted" -> q { (s, d) =>
      val docs = T(s, d, "documents")
      Sampling.weightedSample(docs, col("doc_id"),
          TextOps.tokenCount(col("text")).cast("double") / 150.0,
          salt = "w9")
        .select(col("doc_id"), col("lang"))
    },

    // --- pipeline operators through the SQL FRONT-END (r17: the
    // engine's thesis is SQL-defined pipelines; these rows prove the
    // dialect calls the same operators the Scala API exposes) ---

    // hash_sample / hash_sample_fraction as WHERE-clause functions
    // (content-addressed TABLESAMPLE): the dialect rewrite emits the
    // same md5 arithmetic as Sampling.hashSample/sampleFraction, so
    // the oracle replays it bit-for-bit — including the weighted form
    // (fraction < per-row weight).
    "q_sql_hash_sample" -> q { (s, d) =>
      graft.sql.GraftSql.sql(s,
        """SELECT doc_id, lang, n_chars,
          |  hash_sample_fraction(doc_id, 'w9') AS frac
          |FROM documents WHERE hash_sample(doc_id, 0.25, 's9')""".stripMargin,
        Map("documents" -> T(s, d, "documents")))
    },

    // heavy_hitters(x, k) as a SQL GROUPED AGGREGATE: the Misra–Gries
    // sketch through the dialect, gated exactly like q_heavy_hitters
    // (containment + undercount bound vs exact counts; DuckDB
    // recomputes n_hot per group)
    "q_sql_heavy_hitters" -> q { (s, d) =>
      val cap = 16
      val toks = T(s, d, "documents")
        .select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      val est = graft.sql.GraftSql.sql(s,
        s"SELECT lang, heavy_hitters(tok, $cap) AS m FROM toks GROUP BY lang",
        Map("toks" -> toks))
        .select(col("lang"), explode(col("m")))
        .toDF("lang", "term", "est")
      val exact = toks.groupBy(col("lang"), col("tok").as("term"))
        .agg(count(lit(1)).as("cnt"))
      val n = toks.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      exact.join(n, "lang")
        .withColumn("thresh", col("n").cast("double") / (cap + 1))
        .join(est, Seq("lang", "term"), "left")
        .groupBy(col("lang"))
        .agg(
          sum(when(col("cnt") > col("thresh"), 1L).otherwise(0L))
            .as("n_hot"),
          max(when(col("cnt") > col("thresh") && col("est").isNull, 1)
            .otherwise(0)).as("__miss"),
          max(when(col("est").isNotNull && (col("est") > col("cnt") ||
            (col("cnt") - col("est")).cast("double") > col("thresh")), 1)
            .otherwise(0)).as("__oob"))
        .select(col("lang"), col("n_hot"),
          when(col("__miss") === 0, 1).otherwise(0).as("contained_ok"),
          when(col("__oob") === 0, 1).otherwise(0).as("bounds_ok"))
    },

    // DEDUP TABLE statement (exact dedup as a statement): keep-first
    // by doc_id per identical text, result registered as a view the
    // dialect can keep querying
    "q_sql_dedup_exact" -> q { (s, d) =>
      T(s, d, "documents").createOrReplaceTempView("dd_docs_src")
      graft.sql.GraftSql.statement(s,
        "DEDUP TABLE dd_docs_src BY text KEEP FIRST ORDER BY doc_id " +
          "INTO dd_docs_out")
      graft.sql.GraftSql.sql(s,
        "SELECT doc_id, lang, n_chars FROM dd_docs_out")
    },

    // SQL face of the MinHash-LSH near-dup dedup (`DEDUP TABLE ... BY
    // MINHASH(text) ... INTO`): the statement keeps one representative
    // per LSH-pair-graph component. Gate mirrors q_dedup_minhash's
    // recall floor: among TRUE J>=0.6 pairs (exact, bounded to the
    // doc_id%5 sample), at most 10% may survive with BOTH sides kept
    // (an uncovered pair = the LSH recall miss class).
    "q_sql_dedup_minhash" -> q { (s, d) =>
      T(s, d, "documents").createOrReplaceTempView("mh_src")
      graft.sql.GraftSql.statement(s,
        "DEDUP TABLE mh_src BY MINHASH(text) OPTIONS(id=doc_id, " +
          "shingle=1, bands=8, rows=3, threshold=0.25) INTO mh_out")
      val kept = graft.sql.GraftSql.sql(s, "SELECT doc_id FROM mh_out")
      val docs = T(s, d, "documents")
      val truth = Dedup.jaccardPairs(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text", 0.6)
      val k1 = kept.select(col("doc_id").as("id1"), lit(1).as("__k1"))
      val k2 = kept.select(col("doc_id").as("id2"), lit(1).as("__k2"))
      truth.join(k1, Seq("id1"), "left").join(k2, Seq("id2"), "left")
        .agg(count(lit(1)).as("n_true"),
          count(when(col("__k1").isNotNull && col("__k2").isNotNull, 1))
            .as("__n_uncov"))
        .select(col("n_true"),
          when(col("n_true") === 0 ||
            col("__n_uncov").cast("double") / col("n_true") <= 0.10, 1)
            .otherwise(0).as("coverage_ok"))
    },

    // SQL face of the SemDeDup semantic dedup (`DEDUP TABLE ... BY
    // SEMANTIC(embedding) ... INTO`), same coverage gate as
    // q_dedup_semantic (floor 0.95 over the exact cosine truth).
    "q_sql_dedup_semantic" -> q { (s, d) =>
      T(s, d, "embeddings").createOrReplaceTempView("sem_src")
      graft.sql.GraftSql.statement(s,
        "DEDUP TABLE sem_src BY SEMANTIC(embedding) OPTIONS(id=vec_id, " +
          "threshold=0.3, nlist=8, iters=5, nprobe=2) INTO sem_out")
      val kept = graft.sql.GraftSql.sql(s, "SELECT vec_id FROM sem_out")
      val e = T(s, d, "embeddings")
      val vecs = e.select(col("vec_id"),
        Similarity.toDoubleVec(col("embedding")).as("v"))
      val truth = vecs.as("a")
        .join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
        .filter(col("cos") >= 0.3)
      val k1 = kept.select(col("vec_id").as("id1"), lit(1).as("__k1"))
      val k2 = kept.select(col("vec_id").as("id2"), lit(1).as("__k2"))
      truth.join(k1, Seq("id1"), "left").join(k2, Seq("id2"), "left")
        .agg(count(lit(1)).as("n_true"),
          count(when(col("__k1").isNotNull && col("__k2").isNotNull, 1))
            .as("__n_uncov"))
        .select(col("n_true"),
          when(col("n_true") === 0 ||
            lit(1.0) - col("__n_uncov").cast("double") / col("n_true")
              >= 0.95, 1)
            .otherwise(0).as("coverage_ok"))
    },

    // corpus vocabulary: tf/df per token, top-k by tf (term
    // tie-break) — one shuffle, expression-side per-doc counting
    "q_vocab" -> q { (s, d) =>
      TextOps.vocab(T(s, d, "documents"), col("text"), 50)
    },

    // bigram-LM perplexity scoring (the CCNet/KenLM-style quality
    // filter): add-one-smoothed model trained on the corpus itself,
    // per-doc average log-likelihood folded in document order so the
    // score is bit-deterministic. vocabSize 20 < the corpus's 31
    // distinct tokens, so the OOV → <unk> path is exercised.
    "q_perplexity" -> q { (s, d) =>
      graft.operators.LangModel.perplexity(T(s, d, "documents"),
        col("doc_id"), col("text"), 20)
    },

    // per-doc top-3 salient terms by tf-idf (broadcast df table, one
    // corpus shuffle for the per-doc top-k window)
    "q_tfidf" -> q { (s, d) =>
      TextOps.tfidfTopTerms(T(s, d, "documents"), col("doc_id"),
        col("text"), 3)
    },

    // sharded-release round-trip: write 16 content-addressed parquet
    // shards, read them BACK, and manifest them — counts + an
    // order-independent fingerprint the oracle re-derives from the
    // source corpus, so a row lost or duplicated by the writer flips
    // the hash
    "q_shard_manifest" -> q { (s, d) =>
      val out = s"/tmp/graft_io/shards_${new java.io.File(d).getName}"
      val docs = T(s, d, "documents").select(col("doc_id"), col("text"),
        TextOps.tokenCount(col("text")).as("toks"))
      Packing.writeShards(docs, col("doc_id"), shards = 16,
        salt = "rel14", outDir = out)
      Packing.shardManifest(s.read.parquet(out), col("shard"),
        col("doc_id"), col("text"), col("toks"))
    },

    // per-language corpus datasheet: volumes, exact length quantiles,
    // duplicate rate, short/quality-pass counts — one partial-agg
    // groupBy over one scan
    "q_profile" -> q { (s, d) =>
      TextOps.corpusProfile(T(s, d, "documents"), col("text"), col("lang"))
    },

    // BM25 lexical top-5 retrieval: every 100th document's first 8
    // tokens query the rest of the corpus — the sparse complement to
    // the embedding ANN family (contamination triage, hard-negative
    // mining, RAG lookup). Scores fold in sorted-term order so the
    // fp sum is bit-deterministic and DuckDB replays it exactly.
    "q_bm25" -> q { (s, d) =>
      val docs = T(s, d, "documents")
      val corpus = docs.filter(pmod(col("doc_id"), lit(100)) =!= 0)
      val queries = docs.filter(pmod(col("doc_id"), lit(100)) === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(TextOps.words(col("text")), 1, 8), " ")
            .as("qtext"))
      TextOps.bm25TopK(corpus, col("doc_id"), col("text"),
        queries, col("qid"), col("qtext"), k = 5)
    },

    // sequence packing (concat-and-chunk into fixed-budget context
    // windows over content-addressed shards): one span row per
    // (document, pack) — documents split across adjacent packs, packs
    // never span shards
    "q_pack_sequences" -> q { (s, d) =>
      Packing.packSequences(
        T(s, d, "documents").select(col("doc_id"), col("text")),
        col("doc_id"), TextOps.tokenCount(col("text")),
        budget = 256L, shards = 8, salt = "p14")
    },

    // shuffled packing: content-addressed pseudorandom in-shard order
    // (shuffle-before-pack), layout still a pure function of the corpus
    "q_pack_shuffled" -> q { (s, d) =>
      Packing.packSequences(
        T(s, d, "documents").select(col("doc_id"), col("text")),
        col("doc_id"), TextOps.tokenCount(col("text")),
        budget = 256L, shards = 8, salt = "p14", shuffled = true)
    },

    // streaming pack assembly (per-shard offset state): a single
    // sorted partition pins arrival order to doc_id order, so the
    // layout equals the batch packer's and the batch oracle applies
    "q_stream_pack" -> q { (s, d) =>
      import s.implicits._
      val docs = T(s, d, "documents")
        .select(col("doc_id"),
          Packing.shardOf(col("doc_id"), 8, "p14").as("shard"),
          TextOps.tokenCount(col("text")).cast("long").as("tk"))
        .as[graft.streaming.StreamingPacking.Doc]
        .coalesce(1).sortWithinPartitions("doc_id")
      graft.streaming.StreamingPacking.packStream(docs, 256L).toDF()
    },

    // materialized packs: the actual training rows — concatenated
    // token text per (shard, pack), every pack exactly `budget` tokens
    // except shard tails
    "q_pack_texts" -> q { (s, d) =>
      Packing.packTexts(T(s, d, "documents"), col("doc_id"), col("text"),
        budget = 256L, shards = 8, salt = "p14")
    },

    // streaming exact dedup (first-seen-wins flatMapGroupsWithState):
    // a single sorted partition pins arrival order to doc_id order, so
    // "first seen" == the batch groupBy's min(doc_id) and the decision
    // is oracle-checkable
    "q_stream_dedup" -> q { (s, d) =>
      import s.implicits._
      val docs = T(s, d, "documents").select(col("doc_id"), col("text"))
        .as[graft.streaming.StreamingDedup.Doc]
        .coalesce(1).sortWithinPartitions("doc_id")
      graft.streaming.StreamingDedup.firstSeen(docs).toDF()
    },

    "q_stream_deploy" -> q { (s, d) =>
      // dedupe per (user, ms) on BOTH sides: graft orders same-ms ties
      // by ingestion uid while the DuckDB oracle's ANSI RANGE frame is
      // peer-inclusive and its lag has no tie-break, so the gate would
      // be data-dependent if the generator ever emitted a per-user ms
      // collision (none exist today — this keeps it that way)
      val tieW = Window.partitionBy(col("user_id"), col("ts_ms"))
        .orderBy(col("event_id"))
      val ev = T(s, d, "events")
        .withColumn("__rn", row_number().over(tieW))
        .filter(col("__rn") === 1).drop("__rn")
      graft.sql.StreamDeploy.serve(s,
        """SELECT event_id, round(sum(value) OVER w, 3) AS sd_sum,
          |  count(value) OVER w AS sd_cnt, lag(value, 1) OVER w AS sd_prev,
          |  round(first_value(value) OVER w, 3) AS sd_first
          |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
          |  ROWS_RANGE BETWEEN 10m PRECEDING AND CURRENT ROW)""".stripMargin,
        ev)
        .select(col("event_id"), col("sd_sum"), col("sd_cnt"),
          col("sd_prev"), col("sd_first"))
    },

    // SELECT INTO OUTFILE csv → LOAD DATA INFILE round-trip
    // (LoadDataPlan.scala:40-135, SelectIntoPlan.scala)
    // the IO round-trip driven through SQL TEXT: SELECT INTO OUTFILE,
    // CREATE TABLE (declares the load schema), LOAD DATA INFILE, query
    "q_out_in" -> q { (s, d) =>
      val out = s"/tmp/graft_io/out_in_${new java.io.File(d).getName}"
      // SELECT INTO requires the output FOLDER to exist, like the
      // reference (test_out_in.yaml id 21) — create it as a user would
      new java.io.File(out).getParentFile.mkdirs()
      Tables.registerAll(s, d)
      GraftSql.statement(s,
        s"""SELECT r_regionkey, r_name FROM region INTO OUTFILE '$out'
           |OPTIONS (format='csv', mode='overwrite', delimiter=';',
           |  header=true, null_value='NULL')""".stripMargin)
      GraftSql.statement(s, "DROP TABLE IF EXISTS t_graft_loaded")
      GraftSql.statement(s,
        "CREATE TABLE t_graft_loaded (r_regionkey bigint, r_name string)")
      GraftSql.statement(s,
        s"""LOAD DATA INFILE '$out' INTO TABLE t_graft_loaded
           |OPTIONS (format='csv', delimiter=';', header=true,
           |  null_value='NULL', mode='append')""".stripMargin)
      GraftSql.sql(s,
        """SELECT r_name, max(r_regionkey) AS max_key
          |FROM t_graft_loaded GROUP BY r_name""".stripMargin)
    },

    // Misra–Gries heavy-hitters sketch (capacity 16 < the corpus's 31
    // distinct tokens, so the sketch genuinely decrements/truncates).
    // Gates recompute the exact counts IN SPARK and assert the MG
    // guarantee: (a) every token with true count > N/(k+1) is in the
    // sketch, (b) true − N/(k+1) ≤ est ≤ true for every sketch entry.
    // DuckDB recomputes n_hot exactly and expects both gates green.
    "q_heavy_hitters" -> q { (s, d) =>
      val cap = 16
      val toks = T(s, d, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      val est = toks.agg(A.heavy_hitters(col("tok"), cap).as("m"))
        .select(explode(col("m")))
        .toDF("term", "est")
      val exact = toks.groupBy(col("tok").as("term"))
        .agg(count(lit(1)).as("cnt"))
      val n = toks.agg(count(lit(1)).as("n"))
      exact.crossJoin(broadcast(n))
        .withColumn("thresh", col("n").cast("double") / (cap + 1))
        .join(est, Seq("term"), "left")
        .agg(
          sum(when(col("cnt") > col("thresh"), 1L).otherwise(0L))
            .as("n_hot"),
          max(when(col("cnt") > col("thresh") && col("est").isNull, 1)
            .otherwise(0)).as("__miss"),
          max(when(col("est").isNotNull && (col("est") > col("cnt") ||
            (col("cnt") - col("est")).cast("double") > col("thresh")), 1)
            .otherwise(0)).as("__oob"))
        .select(col("n_hot"),
          when(col("__miss") === 0, 1).otherwise(0).as("contained_ok"),
          when(col("__oob") === 0, 1).otherwise(0).as("bounds_ok"))
    },

    // Z-order (Morton) multi-dimensional layout: the z-value is pure
    // closed-form bit arithmetic, so the oracle replays it bit-exactly
    // in SQL — a FULL hash compare over every lineitem row. The layout
    // op itself (range exchange + within-partition sort on this value)
    // is locality-spec'd in LayoutSpec.
    "q_zorder" -> q { (s, d) =>
      import graft.operators.Layout
      T(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"),
        Layout.zorderValue(
          Seq(col("l_partkey"), col("l_suppkey"))).as("zval"))
    },

    // DataSource V2 connector (`format("graft")`) — the reference's
    // openmldb-spark-connector surface (OpenmldbSource.java): write a
    // DataFrame into an engine table in append mode, read it back with
    // column pruning + filter pushdown, aggregate. The oracle computes
    // the same aggregate straight over the parquet, so the row-hash
    // proves the connector round-trip is lossless.
    "q_dsv2" -> q { (s, d) =>
      GraftSql.statement(s, "DROP TABLE IF EXISTS t_dsv2")
      GraftSql.statement(s,
        "CREATE TABLE t_dsv2 (c_custkey bigint, c_nationkey bigint, " +
          "c_acctbal double)")
      T(s, d, "customer")
        .select(col("c_custkey").cast("long"),
          col("c_nationkey").cast("long"), col("c_acctbal").cast("double"))
        .write.format("graft")
        .option("db", "default").option("table", "t_dsv2")
        .mode("append").save()
      s.read.format("graft")
        .option("db", "default").option("table", "t_dsv2").load()
        .filter(col("c_acctbal") > 0)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"))
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

    "q_last_join_general" ->
      """WITH j AS (
        |  SELECT o.o_orderkey, o.o_totalprice,
        |    l.l_extendedprice AS lj_price, l.l_suppkey AS lj_supp,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY l.l_extendedprice DESC, l.l_suppkey DESC) AS rn
        |  FROM orders o LEFT JOIN lineitem l
        |    ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 25)
        |SELECT o_orderkey, o_totalprice, lj_price, lj_supp
        |FROM j WHERE rn = 1""".stripMargin,

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
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_window_maxsize" ->
      """SELECT e.event_id, round(t.s, 3) AS m_sum, t.c AS m_cnt, t.mn AS m_min,
        |  t.mx AS m_max, round(t.s / t.c, 4) AS m_avg, t.dc AS m_dc
        |FROM events e, LATERAL (
        |  SELECT sum(v) AS s, count(v) AS c, min(v) AS mn, max(v) AS mx,
        |         count(DISTINCT v) AS dc
        |  FROM (SELECT b.value AS v FROM events b
        |        WHERE b.user_id = e.user_id
        |          AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)
        |        ORDER BY epoch_ms(b.ts) DESC, b.event_id DESC LIMIT 5)
        |) t""".stripMargin,

    "q_window_exclude_ct" ->
      """SELECT e.event_id,
        | (SELECT round(sum(b.value), 3) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) // 60000
        |        BETWEEN epoch_ms(e.ts) // 60000 - 10 AND epoch_ms(e.ts) // 60000
        |    AND (epoch_ms(b.ts) // 60000 <> epoch_ms(e.ts) // 60000
        |         OR b.event_id = e.event_id)) AS x_sum,
        | (SELECT count(b.value) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) // 60000
        |        BETWEEN epoch_ms(e.ts) // 60000 - 10 AND epoch_ms(e.ts) // 60000
        |    AND (epoch_ms(b.ts) // 60000 <> epoch_ms(e.ts) // 60000
        |         OR b.event_id = e.event_id)) AS x_cnt
        |FROM events e""".stripMargin,

    "q_window_exclude_cr" ->
      """SELECT e.event_id,
        | (SELECT round(sum(b.value), 3) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) // 60000
        |        BETWEEN epoch_ms(e.ts) // 60000 - 10 AND epoch_ms(e.ts) // 60000
        |    AND b.event_id <> e.event_id) AS c_sum,
        | (SELECT count(b.value) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) // 60000
        |        BETWEEN epoch_ms(e.ts) // 60000 - 10 AND epoch_ms(e.ts) // 60000
        |    AND b.event_id <> e.event_id) AS c_cnt
        |FROM events e""".stripMargin,

    "q_window_union" ->
      """SELECT e.event_id,
        | (SELECT round(sum(b.value), 3) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)) AS u_sum
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin,

    "q_window_inw" ->
      """SELECT e.event_id,
        | (SELECT round(sum(b.value), 3) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)
        |    AND (b.event_type <> 'purchase' OR b.event_id = e.event_id)) AS i_sum
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin,

    "q_window_open" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS o_sum,
        | count(value) OVER w AS o_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 599999 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_median" ->
      """SELECT o_orderstatus, round(median(o_totalprice), 4) AS med_price
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_top_k" ->
      """SELECT user_id, string_agg(printf('%.6f', v), ',' ORDER BY v DESC) AS top3
        |FROM (SELECT user_id, value AS v,
        |        row_number() OVER (PARTITION BY user_id ORDER BY value DESC) AS rn
        |      FROM events)
        |WHERE rn <= 3 GROUP BY user_id""".stripMargin,

    "q_entropy" ->
      """SELECT user_id, round(-sum(p * log2(p)), 6) AS ent
        |FROM (SELECT user_id,
        |        CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY user_id) AS p
        |      FROM events GROUP BY user_id, event_type)
        |GROUP BY user_id""".stripMargin,

    "q_top1_ratio" ->
      """SELECT user_id, round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS t1r
        |FROM (SELECT user_id, event_type, count(*) AS c
        |      FROM events GROUP BY user_id, event_type)
        |GROUP BY user_id""".stripMargin,

    "q_topn_freq" ->
      """WITH counts AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY user_id, event_type),
        |ranked AS (
        |  SELECT user_id, event_type, c,
        |    row_number() OVER (PARTITION BY user_id ORDER BY c DESC, event_type) AS rn
        |  FROM counts)
        |SELECT user_id,
        |  string_agg(event_type, ',' ORDER BY rn)
        |    || repeat(',NULL', GREATEST(3 - CAST(count(*) AS INTEGER), 0)) AS topn
        |FROM ranked WHERE rn <= 3 GROUP BY user_id""".stripMargin,

    "q_ew_avg" ->
      """SELECT user_id, round(sum(value * w) / sum(w), 6) AS ew
        |FROM (SELECT user_id, value,
        |        pow(0.5, CAST(row_number() OVER
        |          (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS DOUBLE) - 1) AS w
        |      FROM events)
        |GROUP BY user_id""".stripMargin,

    "q_drawdown" ->
      """SELECT user_id,
        | round(max(CASE WHEN mn < v AND v <> 0 THEN (v - mn) / v ELSE 0 END), 6) AS dd
        |FROM (SELECT user_id, value AS v,
        |        min(value) OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
        |      FROM events)
        |GROUP BY user_id""".stripMargin,

    "q_cate" ->
      """WITH g AS (SELECT user_id, event_type AS k, count(*) AS c, sum(value) AS s,
        |             min(value) AS mn, max(value) AS mx
        |           FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        | string_agg(k || ':' || printf('%.6f', s), ',' ORDER BY k) AS sum_cate,
        | string_agg(k || ':' || c, ',' ORDER BY k) AS count_cate,
        | string_agg(k || ':' || printf('%.6f', s / c), ',' ORDER BY k) AS avg_cate,
        | string_agg(k || ':' || printf('%.6f', mn), ',' ORDER BY k) AS min_cate,
        | string_agg(k || ':' || printf('%.6f', mx), ',' ORDER BY k) AS max_cate
        |FROM g GROUP BY user_id""".stripMargin,

    "q_cate_where" ->
      """WITH g AS (SELECT user_id, event_type AS k, sum(value) AS s
        |           FROM events WHERE value > 100 GROUP BY user_id, event_type),
        |agg AS (SELECT user_id,
        |          string_agg(k || ':' || printf('%.6f', s), ',' ORDER BY k) AS sum_cate_w
        |        FROM g GROUP BY user_id)
        |SELECT u.user_id, coalesce(a.sum_cate_w, '') AS sum_cate_w
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN agg a USING (user_id)""".stripMargin,

    "q_scalar_str" ->
      """SELECT p_partkey,
        | upper(p_type) AS t_up, lower(p_brand) AS b_lo,
        | substring(p_name, 3, 5) AS n_sub,
        | CAST(length(p_name) AS INTEGER) AS n_len,
        | replace(p_type, ' ', '_') AS t_repl,
        | reverse(p_brand) AS b_rev,
        | CAST(strpos(p_name, 'a') AS INTEGER) AS n_loc,
        | p_brand || '-' || p_type AS bt,
        | CASE WHEN p_brand < p_type THEN -1 WHEN p_brand = p_type THEN 0 ELSE 1 END AS cmp,
        | p_name LIKE '%green%' AS has_green,
        | p_name ILIKE '%GREEN%' AS has_green_i
        |FROM part""".stripMargin,

    "q_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        | abs(l_discount - 0.05) AS m_abs,
        | CAST(ceil(l_quantity / 7) AS BIGINT) AS m_ceil,
        | CAST(floor(l_extendedprice / 1000) AS BIGINT) AS m_floor,
        | round(sqrt(l_quantity), 6) AS m_sqrt,
        | round(exp(l_discount), 6) AS m_exp,
        | round(ln(l_quantity), 6) AS m_ln,
        | round(log10(l_extendedprice), 6) AS m_log10,
        | round(log2(l_quantity), 6) AS m_log2,
        | round(pow(l_quantity, 2), 6) AS m_pow,
        | CAST(l_orderkey % 7 AS BIGINT) AS m_mod,
        | CAST(trunc(l_extendedprice) AS BIGINT) AS m_trunc,
        | round(sin(l_discount), 6) AS m_sin,
        | round(cos(l_tax), 6) AS m_cos,
        | round(atan(l_discount), 6) AS m_atan,
        | round(degrees(l_discount), 6) AS m_deg,
        | round(radians(l_quantity), 6) AS m_rad
        |FROM lineitem""".stripMargin,

    "q_scalar_dt" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS dt_y,
        | CAST(month(o_orderdate) AS INTEGER) AS dt_m,
        | CAST(day(o_orderdate) AS INTEGER) AS dt_d,
        | CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dt_dow,
        | CAST(dayofyear(o_orderdate) AS INTEGER) AS dt_doy,
        | CAST(weekofyear(o_orderdate) AS INTEGER) AS dt_woy,
        | CAST(hour(o_orderdate) AS INTEGER) AS dt_h,
        | last_day(CAST(o_orderdate AS DATE)) AS dt_eom,
        | CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS dt_addm,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS INTEGER) AS dt_diff,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS dt_fmt,
        | CAST(epoch(o_orderdate) AS BIGINT) AS dt_unix
        |FROM orders""".stripMargin,

    "q_scalar_cond" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 200000 THEN 'big'
        |      WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
        | o_totalprice BETWEEN 50000 AND 150000 AS in_band,
        | o_orderstatus IN ('O', 'F') AS is_of,
        | coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
        | o_orderkey % 2 = 0 AS is_even
        |FROM orders""".stripMargin,

    "q_json" ->
      """SELECT event_id,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events""".stripMargin,

    "q_array" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(len([l_quantity, l_discount, l_tax]) AS INTEGER) AS a_size,
        | list_contains([l_quantity, l_discount, l_tax], 0.04) AS a_has,
        | [l_quantity, l_discount, l_tax][2] AS a_second,
        | list_max([l_quantity, l_discount, l_tax]) AS a_max,
        | list_min([l_quantity, l_discount, l_tax]) AS a_min,
        | array_to_string(list_transform(list_sort([l_quantity, l_discount, l_tax]),
        |   x -> printf('%.2f', x)), ',') AS a_sorted,
        | array_to_string(list_transform([l_quantity, l_discount, l_tax],
        |   x -> printf('%.2f', x)), ',') AS a_join
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,

    "q_map" ->
      """SELECT p_partkey,
        | CAST(p_size AS BIGINT) AS m_sz,
        | CAST(p_size * 2 AS BIGINT) AS m_dbl,
        | 2 AS m_size
        |FROM part""".stripMargin,

    "q_earth" ->
      """SELECT s_suppkey,
        | round(2 * 6372.8 * asin(sqrt(
        |   pow(sin((radians(39.9) - radians(s_acctbal % 90)) / 2), 2)
        |   + cos(radians(s_acctbal % 90)) * cos(radians(39.9))
        |     * pow(sin((radians(116.4) - radians(s_acctbal * 2 % 180)) / 2), 2)
        | )), 6) AS dist
        |FROM supplier""".stripMargin,

    "q_split" ->
      """SELECT p_partkey,
        | array_to_string(string_split(p_brand || ':1,' || p_type || ':2', ','), '|') AS sp,
        | p_brand || '|' || p_type AS spk,
        | '1|2' AS spv
        |FROM part""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "q_dedup_span" ->
      """WITH t AS (SELECT doc_id,
        |             regexp_split_to_array(trim(text), '\s+') AS ws,
        |             trim(text) AS tt
        |           FROM documents),
        |s AS (SELECT doc_id, st // 16 AS span_idx,
        |        array_to_string(ws[st + 1 : st + 16], ' ') AS span,
        |        doc_id * 1000000 + st // 16 AS ord
        |      FROM (SELECT doc_id, ws, len(ws) AS n,
        |              unnest(generate_series(0, len(ws) - 1, 16)) AS st
        |            FROM t WHERE length(tt) > 0)
        |      WHERE st < n),
        |w AS (SELECT md5(span) AS h, min(ord) AS keep_ord,
        |        count(*) AS occ
        |      FROM s GROUP BY md5(span)),
        |kept AS (SELECT s.* FROM s JOIN w ON md5(s.span) = w.h
        |         WHERE occ = 1 OR ord = keep_ord),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(span, ' ' ORDER BY span_idx) AS text_dedup
        |        FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
        |        FROM s GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(tot.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(agg.text_dedup, '') AS text_dedup
        |FROM documents d
        |LEFT JOIN tot ON d.doc_id = tot.doc_id
        |LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,

    "q_dedup_lshseen" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(
        |    regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS ws
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) = 0 THEN []
        |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |         ELSE (SELECT list(array_to_string(ws[p.p : p.p + 2], ' '))
        |               FROM (SELECT unnest(generate_series(1, len(ws) - 2))
        |                     AS p) p)
        |    END AS grams
        |  FROM tk),
        |nz AS (SELECT doc_id,
        |         list_filter(grams, g -> g <> '') AS t
        |       FROM sh WHERE len(grams) > 0),
        |hv AS (SELECT doc_id,
        |         CAST(concat('0x', substr(md5(u.w), 1, 8)) AS BIGINT) AS h0,
        |         CAST(concat('0x', substr(md5(u.w), 9, 8)) AS BIGINT) AS h1
        |       FROM (SELECT * FROM nz WHERE len(t) > 0) nz2,
        |         unnest(t) AS u(w)),
        |ph AS (SELECT doc_id, i.i,
        |         min((h0 + i.i * h1) % 4294967291) AS s
        |       FROM hv, (SELECT unnest(generate_series(0, 11)) AS i) i
        |       GROUP BY doc_id, i.i),
        |sg AS (SELECT doc_id, list(s ORDER BY i) AS sig FROM ph
        |       GROUP BY doc_id),
        |b AS (
        |  SELECT doc_id, bi.b AS band,
        |    md5(array_to_string(list_transform(
        |      sig[bi.b * 3 + 1 : bi.b * 3 + 3],
        |      x -> CAST(x AS VARCHAR)), ',')) AS bh
        |  FROM sg, (SELECT unnest(generate_series(0, 3)) AS b) bi),
        |f AS (SELECT band, bh, min(doc_id) AS first_id FROM b GROUP BY 1, 2),
        |m AS (SELECT b.doc_id, min(first_id) AS matched_id
        |      FROM b JOIN f USING (band, bh)
        |      WHERE first_id < b.doc_id GROUP BY b.doc_id)
        |SELECT d.doc_id, m.matched_id IS NOT NULL AS is_dup, m.matched_id
        |FROM documents d LEFT JOIN m USING (doc_id)""".stripMargin,

    "q_dedup_jaccard" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS w
        |  FROM documents),
        |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id1, id2,
        |  round(CAST(i AS DOUBLE) / (s1.sz + s2.sz - i), 6) AS jaccard
        |FROM inter
        |JOIN sz s1 ON id1 = s1.doc_id
        |JOIN sz s2 ON id2 = s2.doc_id
        |WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.6""".stripMargin,

    // quality oracles for the approximate operators: the exact-twin
    // count is recomputed in SQL; the quality flags assert the measured
    // floor held (the Spark side computes recall/MAE/separation against
    // its own exact twin in-query)
    "q_dedup_minhash" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS w
        |  FROM documents WHERE doc_id % 5 = 0),
        |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, 1 AS recall_ok, 1 AS mae_ok
        |FROM inter
        |JOIN sz s1 ON id1 = s1.doc_id
        |JOIN sz s2 ON id2 = s2.doc_id
        |WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.6""".stripMargin,

    "q_dedup_simhash" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_pairs, 1 AS corr_ok
        |FROM documents a JOIN documents b
        |  ON a.doc_id < b.doc_id
        | AND (a.doc_id * 1000 + b.doc_id) % 97 = 0""".stripMargin,

    "q_dedup_embed" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |        list_dot_product(a.v, b.v)
        |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, 1 AS recall_ok
        |FROM p WHERE cos >= 0.3""".stripMargin,

    "q_dedup_semantic" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |        list_dot_product(a.v, b.v)
        |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, 1 AS coverage_ok
        |FROM p WHERE cos >= 0.3""".stripMargin,

    "q_ann_lsh" ->
      """SELECT vec_id AS qid, 1 AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q_ann_quant" ->
      """SELECT vec_id AS qid, 1 AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q_ann_ivf" ->
      """SELECT CAST(3 * count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
        |FROM embeddings WHERE vec_id < 50""".stripMargin,

    "q_dedup_components" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS w
        |  FROM documents),
        |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id1, id2 FROM inter
        |  JOIN sz s1 ON id1 = s1.doc_id
        |  JOIN sz s2 ON id2 = s2.doc_id
        |  WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.6),
        |edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION SELECT id2, id1 FROM pairs),
        |walk(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, walk.lbl FROM edges e
        |  JOIN walk ON walk.id = e.b WHERE walk.lbl < e.a)
        |SELECT id AS doc_id, min(lbl) AS component
        |FROM walk GROUP BY id""".stripMargin,

    "q_dedup_keep" ->
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS w
        |  FROM documents),
        |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |pairs AS (
        |  SELECT id1, id2 FROM inter
        |  JOIN sz s1 ON id1 = s1.doc_id
        |  JOIN sz s2 ON id2 = s2.doc_id
        |  WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.6),
        |edges AS (
        |  SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION SELECT id2, id1 FROM pairs),
        |walk(id, lbl) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.a, walk.lbl FROM edges e
        |  JOIN walk ON walk.id = e.b WHERE walk.lbl < e.a),
        |comp AS (SELECT id AS doc_id, min(lbl) AS component
        |         FROM walk GROUP BY id),
        |t AS (SELECT doc_id,
        |        regexp_split_to_array(trim(text), '\s+') AS ws,
        |        length(regexp_replace(text, '\s+', '', 'g')) AS nc
        |      FROM documents),
        |s0 AS (SELECT doc_id, ws, nc,
        |        len(list_filter(ws, x -> lower(x) IN
        |          ('the','a','and','of','to','in','is'))) AS nstop
        |      FROM t),
        |sc AS (SELECT doc_id,
        |  CAST(floor((CAST(0.5 AS DOUBLE) * least(CAST(len(ws) AS DOUBLE) / 100, 1.0)
        |    + CAST(0.3 AS DOUBLE) * (1 - CAST(nstop AS DOUBLE) / len(ws))
        |    + CAST(0.2 AS DOUBLE) * least((CAST(nc AS DOUBLE) / len(ws)) / 8, 1.0)) * 1000000)
        |    AS BIGINT) AS score
        |  FROM s0)
        |SELECT c.component,
        |  arg_max(c.doc_id, s.score * 4294967296 - c.doc_id) AS keep_id,
        |  count(*) AS n_docs
        |FROM comp c JOIN sc s USING (doc_id)
        |GROUP BY c.component""".stripMargin,

    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |      FROM embeddings),
        |s AS (SELECT qid, vec_id,
        |        list_dot_product(q.e, c.e)
        |          / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos
        |      FROM q, c WHERE c.vec_id <> q.qid),
        |r AS (SELECT qid, vec_id, cos,
        |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
        |      FROM s)
        |SELECT qid, vec_id, round(cos, 6) AS cos, CAST(rnk AS INTEGER) AS rnk
        |FROM r WHERE rnk <= 5""".stripMargin,

    "q_text_stats" ->
      """WITH t AS (SELECT doc_id,
        |             regexp_split_to_array(trim(text), '\s+') AS ws,
        |             length(regexp_replace(text, '\s+', '', 'g')) AS nc
        |           FROM documents),
        |s AS (SELECT doc_id, ws, nc,
        |        len(list_filter(ws, w -> lower(w) IN
        |          ('the','a','and','of','to','in','is'))) AS nstop
        |      FROM t)
        |SELECT doc_id,
        | CAST(len(ws) AS INTEGER) AS n_tokens,
        | CAST(nc AS INTEGER) AS n_chars_x,
        | round(CAST(nc AS DOUBLE) / len(ws), 6) AS avg_wlen,
        | round(CAST(nstop AS DOUBLE) / len(ws), 6) AS stop_ratio,
        | CAST(floor((CAST(0.5 AS DOUBLE) * least(CAST(len(ws) AS DOUBLE) / 100, 1.0)
        |   + CAST(0.3 AS DOUBLE) * (1 - CAST(nstop AS DOUBLE) / len(ws))
        |   + CAST(0.2 AS DOUBLE) * least((CAST(nc AS DOUBLE) / len(ws)) / 8, 1.0)) * 1000000)
        |   AS BIGINT) AS q_score
        |FROM s""".stripMargin,

    "q_token_bpe" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS INTEGER) AS n_bpe,
        | CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_ws
        |FROM documents""".stripMargin,

    "q_text_repetition" ->
      """WITH w AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)
        |SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
        | CAST(floor((1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
        |   * 1e6) AS BIGINT) AS dup_word_f6,
        | CAST(floor((CASE WHEN len(ws) < 3 THEN 0.0
        |   ELSE 1.0 - CAST(len(list_distinct(list_transform(
        |     generate_series(1, len(ws) - 2),
        |     i -> array_to_string(ws[i:i+2], ' ')))) AS DOUBLE)
        |     / (len(ws) - 2) END) * 1e6) AS BIGINT) AS dup_3gram_f6
        |FROM w""".stripMargin,

    "q_decontaminate" ->
      """WITH w AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws) - 2),
        |    i -> array_to_string(ws[i:i+2], ' '))) END AS gs FROM w),
        |probe AS (SELECT DISTINCT unnest(gs) AS gr FROM g
        |  WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT t.doc_id FROM
        |  (SELECT doc_id, unnest(gs) AS gr FROM g WHERE doc_id % 50 <> 0) t
        |  JOIN probe p ON t.gr = p.gr)
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 50 <> 0""".stripMargin,

    // the Bloom path is output-identical to an exact 13-gram overlap
    // check by construction — the oracle recomputes it exactly
    "q_decontaminate_bloom" ->
      """WITH w AS (SELECT doc_id,
        |  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(ws) < 13 THEN [array_to_string(ws, ' ')]
        |  ELSE list_distinct(list_transform(generate_series(1, len(ws) - 12),
        |    i -> array_to_string(ws[i:i+12], ' '))) END AS gs FROM w),
        |probe AS (SELECT DISTINCT unnest(gs) AS gr FROM g
        |  WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT t.doc_id FROM
        |  (SELECT doc_id, unnest(gs) AS gr FROM g WHERE doc_id % 50 <> 0) t
        |  JOIN probe p ON t.gr = p.gr)
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 50 <> 0""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (SELECT doc_id,
        |             list_transform(regexp_split_to_array(trim(text), '\s+'),
        |               w -> lower(w)) AS ws
        |           FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(ws, w -> w IN ('the','a','and','of','to','in','is'))) AS en,
        |  len(list_filter(ws, w -> w IN ('el','la','de','y','que','los'))) AS es,
        |  len(list_filter(ws, w -> w IN ('der','die','das','und','ist','ein'))) AS de,
        |  len(list_filter(ws, w -> w IN ('le','la','et','les','un','une'))) AS fr
        |FROM t)
        |SELECT doc_id,
        |  CASE WHEN en >= es AND en >= de AND en >= fr THEN 'en'
        |       WHEN es >= de AND es >= fr THEN 'es'
        |       WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred
        |FROM s""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        | md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "q_text_chunks" ->
      """WITH t AS (SELECT doc_id,
        |             regexp_split_to_array(trim(text), '\s+') AS ws,
        |             trim(text) AS tt
        |           FROM documents),
        |s AS (SELECT doc_id, ws, len(ws) AS n,
        |        unnest(generate_series(0, len(ws) - 1, 48)) AS st
        |      FROM t WHERE length(tt) > 0)
        |SELECT doc_id,
        |  CAST(st // 48 AS INTEGER) AS chunk_idx,
        |  CAST(least(n - st, 64) AS INTEGER) AS n_tokens,
        |  md5(array_to_string(ws[st + 1 : st + 64], ' ')) AS chunk_md5
        |FROM s WHERE st < n""".stripMargin,

    "q_text_redact" ->
      """WITH w AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com from 10.0.0.'
        |      || (doc_id % 256) AS p
        |  FROM documents),
        |r AS (SELECT doc_id, p,
        |    regexp_replace(
        |      regexp_replace(p, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS red
        |  FROM w)
        |SELECT doc_id, md5(red) AS red_md5,
        |  CAST(length(p) - length(red) AS INTEGER) AS delta
        |FROM r""".stripMargin,

    // closed-form twin of the ImageIO decode: recompute the per-pixel
    // channel formula on a generate_series grid (Multimodal.pngChannel)
    "q_multimodal" ->
      """WITH g AS (
        |  SELECT d.doc_id, 4 + d.doc_id % 5 AS w, 4 + d.doc_id % 3 AS h,
        |         gx.x AS x, gy.y AS y
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS x) gx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS y) gy
        |  WHERE gx.x < 4 + d.doc_id % 5 AND gy.y < 4 + d.doc_id % 3),
        |px AS (
        |  SELECT doc_id, w, h,
        |    (doc_id*31 + x*7 + y*13) % 256 AS r,
        |    (doc_id*17 + x*3 + y*5) % 256 AS g,
        |    (doc_id*7 + x*11 + y*3) % 256 AS b
        |  FROM g)
        |SELECT doc_id,
        |  CAST(max(w) AS INTEGER) AS img_w, CAST(max(h) AS INTEGER) AS img_h,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(least(r, g, b)) AS INTEGER) AS min_c,
        |  CAST(max(greatest(r, g, b)) AS INTEGER) AS max_c,
        |  CAST(max(w) * max(h) AS BIGINT) AS n_px
        |FROM px GROUP BY doc_id""".stripMargin,

    "q_multimodal_audio" ->
      """WITH g AS (
        |  SELECT d.doc_id, 40 + d.doc_id % 17 AS n, gi.i AS i
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 56)) AS i) gi
        |  WHERE gi.i < 40 + d.doc_id % 17),
        |sm AS (
        |  SELECT doc_id, n,
        |    ((doc_id*131 + i*17) % 65536) - 32768 AS s
        |  FROM g)
        |SELECT doc_id,
        |  CAST(1 AS INTEGER) AS n_chan, CAST(8000 AS INTEGER) AS rate_hz,
        |  CAST(max(n) AS BIGINT) AS n_frames,
        |  CAST(min(s) AS BIGINT) AS s_min, CAST(max(s) AS BIGINT) AS s_max,
        |  CAST(sum(s) AS BIGINT) AS s_sum,
        |  CAST(sum(abs(s)) AS BIGINT) AS s_sum_abs,
        |  CAST(sum(CASE WHEN abs(s) > 30000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_loud
        |FROM sm GROUP BY doc_id""".stripMargin,

    "q_multimodal_video" ->
      """WITH dims AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nf, 4 + doc_id % 4 AS w,
        |         3 + doc_id % 3 AS h
        |  FROM documents),
        |g AS (
        |  SELECT d.doc_id, d.nf, d.w, d.h, gf.f, gx.x, gy.y,
        |    (d.doc_id*31 + gf.f*97 + gx.x*7 + gy.y*13) % 256 AS luma
        |  FROM dims d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) gf
        |  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x) gx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS y) gy
        |  WHERE gf.f < d.nf AND gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id,
        |  CAST(max(nf) AS INTEGER) AS n_frames,
        |  CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
        |  CAST(sum(luma) AS BIGINT) AS l_sum,
        |  CAST(min(luma) AS INTEGER) AS l_min,
        |  CAST(max(luma) AS INTEGER) AS l_max,
        |  CAST(sum(CASE WHEN f = 0 THEN luma ELSE 0 END) AS BIGINT)
        |    AS l_sum_f0,
        |  CAST(max(nf) * max(w) * max(h) AS BIGINT) AS n_px
        |FROM g GROUP BY doc_id""".stripMargin,

    "q_img_resize" ->
      """WITH g AS (
        |  SELECT d.doc_id,
        |    (gx.x * (4 + d.doc_id % 5)) // 3 AS sx,
        |    (gy.y * (4 + d.doc_id % 3)) // 2 AS sy
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS x) gx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS y) gy),
        |px AS (
        |  SELECT doc_id,
        |    (doc_id*31 + sx*7 + sy*13) % 256 AS r,
        |    (doc_id*17 + sx*3 + sy*5) % 256 AS gg,
        |    (doc_id*7 + sx*11 + sy*3) % 256 AS b
        |  FROM g)
        |SELECT doc_id,
        |  CAST(3 AS INTEGER) AS width, CAST(2 AS INTEGER) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(gg) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(min(least(r, gg, b)) AS INTEGER) AS c_min,
        |  CAST(max(greatest(r, gg, b)) AS INTEGER) AS c_max
        |FROM px GROUP BY doc_id""".stripMargin,

    "q_vid_sample" ->
      """WITH dims AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS nf, 4 + doc_id % 4 AS w,
        |         3 + doc_id % 3 AS h
        |  FROM documents),
        |g AS (
        |  SELECT d.doc_id, d.nf, d.w, d.h, gf.f, gx.x, gy.y,
        |    (d.doc_id*31 + gf.f*97 + gx.x*7 + gy.y*13) % 256 AS luma
        |  FROM dims d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS f) gf
        |  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS x) gx
        |  CROSS JOIN (SELECT unnest(generate_series(0, 4)) AS y) gy
        |  WHERE gf.f < d.nf AND gf.f % 2 = 0
        |    AND gx.x < d.w AND gy.y < d.h)
        |SELECT doc_id,
        |  CAST((max(nf) + 1) // 2 AS INTEGER) AS n_frames,
        |  CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
        |  CAST(sum(luma) AS BIGINT) AS l_sum,
        |  CAST(min(luma) AS INTEGER) AS l_min,
        |  CAST(max(luma) AS INTEGER) AS l_max,
        |  CAST(sum(CASE WHEN f = 0 THEN luma ELSE 0 END) AS BIGINT)
        |    AS l_sum_f0
        |FROM g GROUP BY doc_id""".stripMargin,

    "q_stddev" ->
      """SELECT o_orderstatus,
        | round(stddev_samp(o_totalprice), 4) AS sd_samp,
        | round(stddev_pop(o_totalprice), 4) AS sd_pop,
        | round(var_samp(o_totalprice), 2) AS v_samp,
        | round(var_pop(o_totalprice), 2) AS v_pop
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_with" ->
      """WITH big AS (
        |  SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000)
        |SELECT c.o_custkey, c.n_big, s.s_big
        |FROM (SELECT o_custkey, count(*) AS n_big FROM big GROUP BY o_custkey) c
        |JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS s_big
        |      FROM big GROUP BY o_custkey) s USING (o_custkey)""".stripMargin,

    "q_union_all" ->
      """SELECT nk, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier)
        |GROUP BY nk""".stripMargin,

    "q_intersect" ->
      "SELECT c_custkey AS key FROM customer INTERSECT SELECT o_custkey FROM orders",

    "q_except" ->
      "SELECT c_custkey AS key FROM customer EXCEPT SELECT o_custkey FROM orders",

    "q_cast" ->
      """SELECT l_orderkey, l_linenumber,
        | TRY_CAST(CAST(l_orderkey AS VARCHAR) AS INTEGER) AS c_ok,
        | TRY_CAST('x' || l_orderkey AS INTEGER) AS c_bad,
        | TRY_CAST(l_orderkey AS SMALLINT) AS c_narrow,
        | CAST(l_quantity AS VARCHAR) AS c_str,
        | TRY_CAST('1994-02-15' AS DATE) AS c_date,
        | TRY_CAST('not a date' AS DATE) AS c_nodate
        |FROM lineitem""".stripMargin,

    "q_nth_value_where" ->
      """SELECT e.event_id,
        | (SELECT round(b.value, 3) FROM events b
        |  WHERE b.user_id = e.user_id AND b.event_type = 'click'
        |    AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 3600000 AND epoch_ms(e.ts)
        |  ORDER BY epoch_ms(b.ts), b.event_id OFFSET 1 LIMIT 1) AS nth2,
        | (SELECT round(b.value, 3) FROM events b
        |  WHERE b.user_id = e.user_id AND b.event_type = 'click'
        |    AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 3600000 AND epoch_ms(e.ts)
        |  ORDER BY epoch_ms(b.ts) DESC, b.event_id DESC LIMIT 1) AS nth_last
        |FROM events e""".stripMargin,

    "q_window_split" ->
      """SELECT e.event_id,
        | (SELECT string_agg(b.event_type, '|'
        |    ORDER BY epoch_ms(b.ts) DESC, b.event_id DESC) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)) AS wsk,
        | (SELECT string_agg(printf('%.3f', b.value), '|'
        |    ORDER BY epoch_ms(b.ts) DESC, b.event_id DESC) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)) AS wsv
        |FROM events e""".stripMargin,

    "q_topn_cate" ->
      """WITH g AS (SELECT user_id, event_type AS k, sum(value) AS s
        |           FROM events WHERE value > 50 GROUP BY user_id, event_type),
        |rk AS (SELECT user_id, k, s,
        |         row_number() OVER (PARTITION BY user_id ORDER BY k DESC) AS rn FROM g),
        |rv AS (SELECT user_id, k, s,
        |         row_number() OVER (PARTITION BY user_id ORDER BY s DESC, k DESC) AS rn FROM g),
        |a AS (SELECT user_id, string_agg(k || ':' || printf('%.6f', s), ','
        |        ORDER BY k DESC) AS tnk FROM rk WHERE rn <= 2 GROUP BY user_id),
        |b AS (SELECT user_id, string_agg(k || ':' || printf('%.6f', s), ','
        |        ORDER BY rn) AS tnv FROM rv WHERE rn <= 2 GROUP BY user_id)
        |SELECT u.user_id, coalesce(a.tnk, '') AS tnk, coalesce(b.tnv, '') AS tnv
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN a USING (user_id) LEFT JOIN b USING (user_id)""".stripMargin,

    "q_list_except" ->
      """SELECT p_partkey,
        | p_type || ':2' AS lek,
        | p_brand || ':1' AS lev
        |FROM part""".stripMargin,

    "q_feature_sig" -> {
      val h1 = graft.functions.FeatureSignature.hashLongConst(1L)
      s"""SELECT o_orderkey,
         | printf('%.6f', o_totalprice) || ',' ||
         |   CAST(CAST(o_orderstatus = 'F' AS INTEGER) AS VARCHAR) || ',' ||
         |   printf('%.6f', CAST(o_custkey AS DOUBLE)) AS f_csv,
         | CAST(CAST(o_orderstatus = 'F' AS INTEGER) AS VARCHAR) || ' 1:' ||
         |   printf('%.6f', o_totalprice) || ' 2:' ||
         |   printf('%.6f', CAST(o_custkey AS DOUBLE)) AS f_libsvm,
         | CAST(CAST(o_orderstatus = 'F' AS INTEGER) AS VARCHAR) || ' ' ||
         |   CAST(o_orderkey AS VARCHAR) || '| 1:' || '$h1' || ':' ||
         |   printf('%.6f', o_totalprice) AS f_gc
         |FROM orders""".stripMargin
    },

    "q_join_window" ->
      """WITH lj AS (
        |  SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, r.last_qty
        |  FROM orders o LEFT JOIN (
        |    SELECT l_orderkey, l_quantity AS last_qty,
        |      row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) AS rn
        |    FROM lineitem) r ON o.o_orderkey = r.l_orderkey AND r.rn = 1)
        |SELECT o_orderkey, round(sum(last_qty) OVER w, 3) AS w_qty,
        |  count(last_qty) OVER w AS w_cnt
        |FROM lj
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_request_mode" ->
      """SELECT e.event_id,
        | round(coalesce((SELECT sum(b.value) FROM events b
        |   WHERE b.user_id = e.user_id AND b.event_id % 97 <> 0
        |     AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)), 0)
        |   + e.value, 3) AS pit_sum,
        | (SELECT count(b.value) FROM events b
        |   WHERE b.user_id = e.user_id AND b.event_id % 97 <> 0
        |     AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)) + 1 AS pit_cnt
        |FROM events e WHERE e.event_id % 97 = 0""".stripMargin,

    "q_out_in" ->
      """SELECT r_name, CAST(max(r_regionkey) AS BIGINT) AS max_key
        |FROM region GROUP BY r_name""".stripMargin,

    "q_heavy_hitters" ->
      """WITH t AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |           FROM documents),
        |tt AS (SELECT tok FROM t WHERE length(tok) > 0),
        |c AS (SELECT tok, count(*) AS cnt FROM tt GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM tt)
        |SELECT CAST(count(*) FILTER (WHERE cnt > CAST(n AS DOUBLE) / 17) AS BIGINT) AS n_hot,
        |  1 AS contained_ok, 1 AS bounds_ok
        |FROM c, n""".stripMargin,

    "q_zorder" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(l_partkey AS BIGINT) & 65535 AS x,
        |  CAST(l_suppkey AS BIGINT) & 65535 AS y FROM lineitem),
        |s1 AS (SELECT *, (x | (x << 8)) & 16711935 AS xa,
        |               (y | (y << 8)) & 16711935 AS ya FROM t),
        |s2 AS (SELECT *, (xa | (xa << 4)) & 252645135 AS xb,
        |               (ya | (ya << 4)) & 252645135 AS yb FROM s1),
        |s3 AS (SELECT *, (xb | (xb << 2)) & 858993459 AS xc,
        |               (yb | (yb << 2)) & 858993459 AS yc FROM s2),
        |s4 AS (SELECT *, (xc | (xc << 1)) & 1431655765 AS xd,
        |               (yc | (yc << 1)) & 1431655765 AS yd FROM s3)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  xd | (yd << 1) AS zval FROM s4""".stripMargin,

    "q_dsv2" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        | count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer WHERE c_acctbal > 0
        |GROUP BY c_nationkey""".stripMargin,

    "q_sql_agg" ->
      """SELECT o_orderstatus, round(sum(o_totalprice), 2) AS s_price, count(*) AS cnt
        |FROM orders GROUP BY o_orderstatus HAVING count(*) > 10""".stripMargin,

    "q_sql_param" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 150000.0 AND o_orderstatus = 'F'""".stripMargin,

    "q_sql_window" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS r_sum,
        | count(value) OVER w AS r_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_sql_skew_window" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS k_sum,
        | count(value) OVER w AS k_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_sql_maxsize" ->
      """SELECT e.event_id, t.c AS m_cnt
        |FROM events e, LATERAL (
        |  SELECT count(v) AS c
        |  FROM (SELECT b.value AS v FROM events b
        |        WHERE b.user_id = e.user_id
        |          AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)
        |        ORDER BY epoch_ms(b.ts) DESC, b.event_id DESC LIMIT 5)
        |) t""".stripMargin,

    "q_window_then_agg" ->
      """SELECT et, CAST(sum(w_cnt) AS BIGINT) AS s, count(*) AS c FROM (
        |  SELECT event_type AS et,
        |    count(value) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |      RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS w_cnt
        |  FROM events) GROUP BY et""".stripMargin,

    "q_agg_then_window" ->
      """SELECT user_id, cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY user_id % 100 ORDER BY user_id
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cnt
        |FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)""".stripMargin,

    "q_sql_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_sql_alias" ->
      """SELECT o.o_orderkey AS id, o.o_totalprice AS price,
        |  o.o_orderstatus AS st
        |FROM orders AS o WHERE o.o_orderkey < 1000""".stripMargin,

    "q_sql_interval_join" ->
      """SELECT e.event_id AS event_id,
        |  (SELECT r.event_id FROM events r
        |   WHERE r.user_id = e.user_id
        |     AND r.ts BETWEEN e.ts - INTERVAL 1 DAY
        |                  AND e.ts - INTERVAL 1 SECOND
        |   ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS prev_event
        |FROM events e""".stripMargin,

    "q_sql_last_join" ->
      """SELECT o_orderkey, o_totalprice, r.last_line, r.last_qty
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey, l_linenumber AS last_line, l_quantity AS last_qty
        |  FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |          ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) AS rn
        |        FROM lineitem) WHERE rn = 1
        |) r ON o_orderkey = r.l_orderkey""".stripMargin,

    "q_sql_window_union" ->
      """SELECT e.event_id,
        | (SELECT round(sum(b.value), 3) FROM events b
        |  WHERE b.user_id = e.user_id
        |    AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)) AS u_sum
        |FROM events e WHERE e.event_type = 'purchase'""".stripMargin,

    "q_long_window" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS lw_sum,
        | count(value) OVER w AS lw_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_long_window_inc" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS lw_sum,
        | count(value) OVER w AS lw_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_sql_long_window" ->
      """WITH ev AS (
        |  SELECT * FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id, epoch_ms(ts)
        |                             ORDER BY event_id) = 1)
        |SELECT event_id,
        | round(sum(value) OVER w, 3) AS lw_sum,
        | count(value) OVER w AS lw_cnt
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 1800000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_agg_full" ->
      """SELECT round(sum(l_extendedprice), 2) AS s_price, count(*) AS cnt,
        | round(avg(l_quantity), 6) AS avg_qty,
        | min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,

    "q_multi_window" ->
      """SELECT event_id,
        | round(sum(value) OVER w1, 3) AS w1_sum,
        | round(sum(value) OVER w2, 3) AS w2_sum,
        | count(value) OVER w1 AS w1_cnt
        |FROM events
        |WINDOW w1 AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |              RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW),
        |       w2 AS (PARTITION BY event_type ORDER BY epoch_ms(ts), event_id
        |              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_scalar_str2" ->
      """SELECT p_partkey,
        | hex(encode(p_brand)) AS hx,
        | decode(unhex(hex(encode(p_brand)))) AS unhx,
        | CAST(length(p_name) AS INTEGER) AS clen,
        | chr(65 + CAST(p_partkey % 26 AS INTEGER)) AS chr,
        | split_part(p_type, ' ', 1) AS first_word,
        | lpad(p_brand, 12, '*') AS pad,
        | rtrim(ltrim('  ' || p_brand || '  ')) AS trimmed
        |FROM part""".stripMargin,

    "q_json2" ->
      """SELECT event_id,
        | CAST(json_array_length('[1,2,' || (event_id % 10) || ']') AS INTEGER) AS jlen,
        | CAST(json_extract_string('{"a":{"b":' || user_id || '}}', '$.a.b') AS BIGINT) AS nested
        |FROM events""".stripMargin,

    "q_array2" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(list_position([l_quantity, l_discount, l_tax], l_discount) AS BIGINT) AS pos,
        | array_to_string(list_transform([l_quantity, l_discount],
        |   x -> printf('%.2f', x)), ',') AS sl,
        | array_to_string(list_transform([l_quantity, l_discount, l_tax],
        |   x -> printf('%.2f', x + x)), ',') AS zipped,
        | CAST(len(list_distinct([l_quantity, l_discount, l_tax])) AS INTEGER) AS ndist
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin,

    "q_ddl_dml" ->
      """SELECT grp, round(sum(v), 2) AS s, count(*) AS c
        |FROM (VALUES (1, 'a', 10.0), (3, 'b', 30.0), (4, 'b', 40.0)) t(id, grp, v)
        |GROUP BY grp""".stripMargin,

    "q_skew_window" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS sw_sum,
        | count(value) OVER w AS sw_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_skew_window_hot" ->
      """SELECT event_id,
        | round(sum(value) OVER w, 3) AS sw_sum,
        | count(value) OVER w AS sw_cnt
        |FROM events
        |WINDOW w AS (PARTITION BY user_id % 4 ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_skew_window_arr" ->
      """SELECT e.event_id, round(t.s, 3) AS k_sum, t.c AS k_cnt, t.mx AS k_max
        |FROM events e, LATERAL (
        |  SELECT sum(v) AS s, count(v) AS c, max(v) AS mx
        |  FROM (SELECT b.value AS v FROM events b
        |        WHERE b.user_id % 10 = e.user_id % 10
        |          AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)
        |          AND (epoch_ms(b.ts) <> epoch_ms(e.ts) OR b.event_id = e.event_id)
        |        ORDER BY epoch_ms(b.ts) DESC, b.event_id DESC LIMIT 5)
        |) t""".stripMargin,

    "q_sql_request" ->
      """SELECT e.event_id,
        | round(coalesce((SELECT sum(b.value) FROM events b
        |   WHERE b.user_id = e.user_id AND b.event_id % 97 <> 0
        |     AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)), 0)
        |   + e.value, 3) AS pit_sum,
        | (SELECT count(b.value) FROM events b
        |   WHERE b.user_id = e.user_id AND b.event_id % 97 <> 0
        |     AND epoch_ms(b.ts) BETWEEN epoch_ms(e.ts) - 600000 AND epoch_ms(e.ts)) + 1 AS pit_cnt
        |FROM events e WHERE e.event_id % 97 = 0""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(doc_id || ':s9'), 1, 8) < '33333333'""".stripMargin,

    "q_sample_stratified" ->
      """SELECT lang, doc_id FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY md5(doc_id || ':s9'), doc_id) <= 30""".stripMargin,

    "q_rebalance" ->
      """WITH sh AS (SELECT * FROM (VALUES ('en', 0.5), ('de', 0.25),
        |    ('fr', 0.25)) AS t(lang, share)),
        |c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
        |      FROM documents GROUP BY lang),
        |j AS (SELECT c.lang, n, share FROM c JOIN sh USING (lang)),
        |np AS (SELECT min(n / share) AS np FROM j),
        |r AS (SELECT lang, least(1.0, share * np / n) AS rate
        |      FROM j CROSS JOIN np)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
        |WHERE CAST(concat('0x', substr(md5(d.doc_id || ':r14'), 1, 8))
        |        AS BIGINT) / 4294967296.0 < r.rate""".stripMargin,

    "q_temperature_mix" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
        |           FROM documents GROUP BY lang),
        |p AS (SELECT lang, n,
        |        pow(n, 0.5) / sum(pow(n, 0.5)) OVER () AS p FROM c),
        |np AS (SELECT min(n / p) AS np FROM p),
        |r AS (SELECT lang,
        |        floor(least(1.0, p * np / n) * 1000000) / 1000000 AS rate
        |      FROM p CROSS JOIN np)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
        |WHERE CAST(concat('0x', substr(md5(d.doc_id || ':t15'), 1, 8))
        |        AS BIGINT) / 4294967296.0 < r.rate""".stripMargin,

    "q_sample_weighted" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(doc_id || ':w9'), 1, 8))
        |        AS BIGINT) / 4294967296.0
        |  < least(1.0, greatest(0.0,
        |      len(regexp_split_to_array(trim(text), '\s+')) / 150.0))""".stripMargin,

    "q_sql_hash_sample" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(concat('0x', substr(md5(doc_id || ':w9'), 1, 8))
        |    AS BIGINT) / 4294967296.0 AS frac
        |FROM documents
        |WHERE substr(md5(doc_id || ':s9'), 1, 8) < '40000000'""".stripMargin,

    "q_sql_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT lang,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        |  FROM documents),
        |tk AS (SELECT lang, tok FROM toks WHERE len(tok) > 0),
        |ex AS (SELECT lang, tok AS term, CAST(count(*) AS BIGINT) AS cnt
        |       FROM tk GROUP BY lang, tok),
        |n AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM tk
        |      GROUP BY lang)
        |SELECT ex.lang,
        |  CAST(sum(CASE WHEN cnt > n / 17.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hot,
        |  1 AS contained_ok, 1 AS bounds_ok
        |FROM ex JOIN n ON ex.lang = n.lang
        |GROUP BY ex.lang""".stripMargin,

    "q_sql_dedup_exact" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT *, row_number() OVER (PARTITION BY text
        |    ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1""".stripMargin,

    "q_sql_dedup_minhash" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS w
        |  FROM documents WHERE doc_id % 5 = 0),
        |sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
        |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, 1 AS coverage_ok
        |FROM inter
        |JOIN sz s1 ON id1 = s1.doc_id
        |JOIN sz s2 ON id2 = s2.doc_id
        |WHERE CAST(i AS DOUBLE) / (s1.sz + s2.sz - i) >= 0.6""".stripMargin,

    "q_sql_dedup_semantic" ->
      """WITH e AS (SELECT vec_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |        list_dot_product(a.v, b.v)
        |          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_true, 1 AS coverage_ok
        |FROM p WHERE cos >= 0.3""".stripMargin,

    "q_tfidf" ->
      """WITH tc AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT doc_id,
        |          unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |        FROM documents)
        |  GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |       FROM tc GROUP BY term),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
        |SELECT doc_id, term,
        |  round(cnt * ln(n_docs / df), 6) AS score
        |FROM tc JOIN df USING (term) CROSS JOIN n
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |  ORDER BY cnt * ln(n_docs / df) DESC, term) <= 3""".stripMargin,

    // the oracle manifests the SOURCE corpus directly — matching the
    // Spark side's written-and-read-back manifest proves the writer
    // moved every row exactly once
    "q_shard_manifest" ->
      """WITH t AS (SELECT doc_id, text,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS toks,
        |    CAST(CAST(concat('0x', substr(md5(doc_id || ':rel14'), 1, 8))
        |      AS BIGINT) % 16 AS INTEGER) AS shard,
        |    CAST(concat('0x', substr(md5(doc_id || ':' || text), 1, 15))
        |      AS BIGINT) AS h
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(toks) AS BIGINT) AS n_tokens, bit_xor(h) AS fp
        |FROM t GROUP BY shard""".stripMargin,

    // counts are exact; quantile_cont replays Spark's exact type-7
    // percentile; the quality term reuses q_text_stats' proven
    // floor(q*1e6) fragment
    "q_profile" ->
      """WITH t AS (SELECT lang AS stratum,
        |             regexp_split_to_array(trim(text), '\s+') AS ws,
        |             length(regexp_replace(text, '\s+', '', 'g')) AS nc,
        |             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |           FROM documents),
        |s AS (SELECT stratum, len(ws) AS toks, fp,
        |        CAST(floor((CAST(0.5 AS DOUBLE) * least(CAST(len(ws) AS DOUBLE) / 100, 1.0)
        |          + CAST(0.3 AS DOUBLE) * (1 - CAST(len(list_filter(ws, w -> lower(w) IN
        |              ('the','a','and','of','to','in','is'))) AS DOUBLE) / len(ws))
        |          + CAST(0.2 AS DOUBLE) * least((CAST(nc AS DOUBLE) / len(ws)) / 8, 1.0)) * 1000000)
        |          AS BIGINT) AS q6
        |      FROM t)
        |SELECT stratum,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS n_tokens,
        |  round(quantile_cont(toks, 0.5), 6) AS tok_p50,
        |  round(quantile_cont(toks, 0.9), 6) AS tok_p90,
        |  round(quantile_cont(toks, 0.99), 6) AS tok_p99,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
        |  CAST(sum(CASE WHEN toks < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |  CAST(sum(CASE WHEN q6 >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
        |FROM s GROUP BY stratum""".stripMargin,

    // identical association order and the identical sorted-term fold —
    // every double op replays bit-exactly (see TextOps.bm25TopK)
    "q_bm25" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        |           FROM documents WHERE doc_id % 100 <> 0),
        |base AS (SELECT doc_id, ws, CAST(len(ws) AS DOUBLE) AS dl FROM d),
        |tc AS (SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |       FROM (SELECT doc_id, dl, unnest(ws) AS term FROM base)
        |       GROUP BY doc_id, dl, term),
        |dfv AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tc GROUP BY term),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM base),
        |qs AS (SELECT doc_id AS qid,
        |         list_distinct(regexp_split_to_array(trim(text), '\s+')[1:8]) AS qts
        |       FROM documents WHERE doc_id % 100 = 0),
        |qt AS (SELECT qid, unnest(qts) AS term FROM qs),
        |c AS (SELECT qid, tc.doc_id AS doc_id, tc.term AS term,
        |        ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
        |          / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS w
        |      FROM qt JOIN tc USING (term) JOIN dfv USING (term) CROSS JOIN st),
        |s AS (SELECT qid, doc_id,
        |        list_reduce(list(w ORDER BY term), (a, x) -> a + x) AS score
        |      FROM c GROUP BY qid, doc_id)
        |SELECT qid, CAST(rnk AS INTEGER) AS rank, doc_id,
        |       round(score, 6) AS score
        |FROM (SELECT qid, doc_id, score,
        |        row_number() OVER (PARTITION BY qid
        |          ORDER BY score DESC, doc_id) AS rnk FROM s)
        |WHERE rnk <= 5""".stripMargin,

    "q_perplexity" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      x -> x <> '') AS t
        |  FROM documents),
        |tok AS (SELECT doc_id, u.w FROM tk, unnest(t) AS u(w)),
        |vocab AS (SELECT w FROM (SELECT w, count(*) c FROM tok GROUP BY w
        |                         ORDER BY c DESC, w LIMIT 20)),
        |vs AS (SELECT CAST(count(*) + 1 AS DOUBLE) AS v FROM vocab),
        |big AS (
        |  SELECT doc_id, p AS pos,
        |    CASE WHEN t[p+1] IN (SELECT w FROM vocab)
        |      THEN t[p+1] ELSE '<unk>' END AS w1,
        |    CASE WHEN t[p+2] IN (SELECT w FROM vocab)
        |      THEN t[p+2] ELSE '<unk>' END AS w2
        |  FROM tk, unnest(generate_series(0, len(t)-2)) AS g(p)
        |  WHERE len(t) >= 2),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1,2),
        |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
        |terms AS (
        |  SELECT b.doc_id, b.pos,
        |    ln((coalesce(c2.c2,0) + 1.0) / (coalesce(c1.c1,0) + vs.v)) AS lp
        |  FROM big b LEFT JOIN c2 USING (w1,w2) LEFT JOIN c1 USING (w1), vs),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    list_reduce(list(lp ORDER BY pos), (a,b) -> a+b) AS s
        |  FROM terms GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  round(a.s / a.n_bigrams, 6) AS avg_logprob,
        |  round(exp(-a.s / a.n_bigrams), 4) AS ppl
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "q_vocab" ->
      """WITH w AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
        |    AS term
        |  FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS tf,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM w GROUP BY term
        |ORDER BY tf DESC, term LIMIT 50""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tk,
        |    CAST(concat('0x', substr(md5(doc_id || ':p14'), 1, 8)) AS BIGINT)
        |      % 8 AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, shard, tk,
        |        CAST(sum(tk) OVER (PARTITION BY shard ORDER BY doc_id)
        |          AS BIGINT) AS en
        |      FROM t WHERE tk > 0),
        |s AS (SELECT doc_id, shard, en - tk AS st, en FROM c),
        |g AS (SELECT doc_id, shard, st, en,
        |        unnest(generate_series(st // 256, (en - 1) // 256)) AS p
        |      FROM s)
        |SELECT doc_id, shard, p AS pack_id,
        |  greatest(st, p * 256) - st AS doc_off,
        |  greatest(st, p * 256) - p * 256 AS pack_off,
        |  least(en, (p + 1) * 256) - greatest(st, p * 256) AS span_len
        |FROM g""".stripMargin,

    "q_pack_shuffled" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tk,
        |    CAST(concat('0x', substr(md5(doc_id || ':p14'), 1, 8)) AS BIGINT)
        |      % 8 AS shard,
        |    md5(doc_id || ':p14#o') AS ord
        |  FROM documents),
        |c AS (SELECT doc_id, shard, tk,
        |        CAST(sum(tk) OVER (PARTITION BY shard ORDER BY ord)
        |          AS BIGINT) AS en
        |      FROM t WHERE tk > 0),
        |s AS (SELECT doc_id, shard, en - tk AS st, en FROM c),
        |g AS (SELECT doc_id, shard, st, en,
        |        unnest(generate_series(st // 256, (en - 1) // 256)) AS p
        |      FROM s)
        |SELECT doc_id, shard, p AS pack_id,
        |  greatest(st, p * 256) - st AS doc_off,
        |  greatest(st, p * 256) - p * 256 AS pack_off,
        |  least(en, (p + 1) * 256) - greatest(st, p * 256) AS span_len
        |FROM g""".stripMargin,

    "q_stream_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tk,
        |    CAST(concat('0x', substr(md5(doc_id || ':p14'), 1, 8)) AS BIGINT)
        |      % 8 AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, shard, tk,
        |        CAST(sum(tk) OVER (PARTITION BY shard ORDER BY doc_id)
        |          AS BIGINT) AS en
        |      FROM t WHERE tk > 0),
        |s AS (SELECT doc_id, shard, en - tk AS st, en FROM c),
        |g AS (SELECT doc_id, shard, st, en,
        |        unnest(generate_series(st // 256, (en - 1) // 256)) AS p
        |      FROM s)
        |SELECT doc_id, shard, p AS pack_id,
        |  greatest(st, p * 256) - st AS doc_off,
        |  greatest(st, p * 256) - p * 256 AS pack_off,
        |  least(en, (p + 1) * 256) - greatest(st, p * 256) AS span_len
        |FROM g""".stripMargin,

    "q_pack_texts" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
        |      AS tk,
        |    CAST(concat('0x', substr(md5(doc_id || ':p14'), 1, 8)) AS BIGINT)
        |      % 8 AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, shard, ws, tk,
        |        CAST(sum(tk) OVER (PARTITION BY shard ORDER BY doc_id)
        |          AS BIGINT) AS en
        |      FROM t WHERE tk > 0),
        |s AS (SELECT doc_id, shard, ws, en - tk AS st, en FROM c),
        |g AS (SELECT doc_id, shard, ws, st, en,
        |        unnest(generate_series(st // 256, (en - 1) // 256)) AS p
        |      FROM s),
        |sp AS (
        |  SELECT shard, p AS pack_id,
        |    greatest(st, p * 256) - p * 256 AS pack_off,
        |    array_to_string(ws[(greatest(st, p * 256) - st + 1):
        |      (least(en, (p + 1) * 256) - st)], ' ') AS tok_str,
        |    least(en, (p + 1) * 256) - greatest(st, p * 256) AS span_len
        |  FROM g)
        |SELECT shard, pack_id,
        |  string_agg(tok_str, ' ' ORDER BY pack_off) AS text,
        |  CAST(sum(span_len) AS BIGINT) AS n_tokens
        |FROM sp GROUP BY shard, pack_id""".stripMargin,

    "q_stream_dedup" ->
      """SELECT doc_id, text FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY text)""".stripMargin,

    "q_stream_deploy" ->
      """WITH ev AS (
        |  SELECT * FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id, epoch_ms(ts)
        |                             ORDER BY event_id) = 1)
        |SELECT event_id,
        | round(sum(value) OVER w, 3) AS sd_sum,
        | count(value) OVER w AS sd_cnt,
        | lag(value, 1) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) AS sd_prev,
        | round(first_value(value) OVER w, 3) AS sd_first
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_bench_shape" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer)
        |SELECT e.event_id,
        | upper(e.event_type) AS et_up,
        | e.value * 2 AS v2,
        | c.c_nationkey,
        | round(c.c_acctbal / 100, 4) AS bal_h,
        | t.dc AS w_dc, round(t.s, 3) AS w_sum, t.c AS w_cnt,
        | t.clicks AS w_clicks, t.big AS w_big
        |FROM events e
        |LEFT JOIN cust c ON e.user_id = c.c_custkey,
        |LATERAL (
        |  SELECT count(DISTINCT v) AS dc, sum(v) AS s, count(v) AS c,
        |    count(CASE WHEN et = 'click' THEN v END) AS clicks,
        |    count(CASE WHEN v > 100 THEN v END) AS big
        |  FROM (SELECT b.value AS v, b.event_type AS et FROM events b
        |        WHERE b.user_id = e.user_id
        |          AND epoch_ms(b.ts)
        |              BETWEEN epoch_ms(e.ts) - 2592000000 AND epoch_ms(e.ts)
        |        ORDER BY epoch_ms(b.ts) DESC, b.event_id DESC LIMIT 100)
        |) t""".stripMargin
  )

  /** Headline subset run by graft.Bench at sf0.1. Ratio-paired queries
    * (PlainBaseline twins) run FIRST: their sub-second timings otherwise
    * sit in the GC/page-cache shadow of the multi-second approximate
    * operators, which swung measured ratios by up to 2× run-to-run. */
  def benchQueries: Seq[String] = Seq(
    "q1_agg", "q_window_rows_range", "q_window_rows", "q_last_join",
    "q_window_maxsize", "q_sql_window", "q_bench_shape",
    "q_groupby_having", "q_distinct_count",
    "q_dedup_exact", "q_dedup_span", "q_dedup_lshseen",
    "q_text_stats", "q_text_repetition",
    "q_decontaminate", "q_decontaminate_bloom",
    "q_pack_sequences", "q_vocab", "q_tfidf", "q_perplexity",
    "q_profile", "q_bm25",
    "q_join_window", "q_request_mode", "q_long_window",
    "q_zorder",
    "q_skew_window", "q_skew_window_arr", "q_skew_window_hot",
    "q_ann_topk", "q_dedup_semantic",
    "q_dedup_minhash", "q_dedup_lshseen_capped",
    "q_dedup_minhash_skew", "q_dedup_minhash_skew_uncapped")

  /** Bench-time overrides: the CORRECTNESS-gate versions of the
    * approximate operators spend most of their time computing the
    * EXACT twin to measure recall/MAE against (q_dedup_minhash's truth
    * side is ~97% of its gate cost at sf0.1) — that audit belongs to
    * the Verify gate, not the benchmark. The bench times the operator
    * a production pipeline would run: the banded-LSH candidate pass
    * itself. Names absent here bench their gate definition unchanged. */
  def benchVariants: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the gate definition computes the quadratic exact truth to grade
    // coverage — that audit belongs to Verify; the bench times the
    // operator a pipeline would run (solo entry, no plain twin: the
    // formulation IS the plain shape). nlist scales with the corpus
    // (target ~250 docs per cluster, capped — the SemDeDup production
    // shape: cluster COUNT grows with data, per-cluster pair cost
    // stays constant) so the benched cost is ~linear in corpus size,
    // not quadratic; the sizing count() job is deliberately inside the
    // timing — picking nlist is part of what the pipeline runs.
    "q_dedup_semantic" -> ((s: SparkSession, d: String) => {
      val e = Tables.load(GraftSession.tune(s), d, "embeddings")
      val nlist = math.min(4096, math.max(8, (e.count() / 250).toInt))
      graft.operators.Dedup.semanticDedup(e, "vec_id", "embedding",
        threshold = 0.3, nlist = nlist, iters = 5, nprobe = 2)
    }),
    "q_dedup_minhash" -> ((s: SparkSession, d: String) => {
      val docs = Tables.load(GraftSession.tune(s), d, "documents")
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 1, bands = 8, rowsPerBand = 3, threshold = 0.25)
    }),

    // The production-hygiene configuration of q_dedup_lshseen: hot
    // buckets (boilerplate-pattern clusters) capped at 64 docs. Timing-
    // only — the uncapped form is the correctness-gated definition, the
    // cap is a recall trade a 100 TB deployment makes deliberately
    // (DedupSimilaritySpec pins the semantics). On THIS dup-dense
    // synthetic corpus the cap's count window costs more than it saves
    // (~9.8 s vs ~7.9 s uncapped at sf0.1) because the first-seen
    // join-back is already linear in bucket size; under a real mega
    // bucket it helps only mildly for the same reason (SkewCapProbe,
    // 10% boilerplate fixture at sf0.1: 7.49 s uncapped → 7.14 s
    // capped). The operator whose complexity the cap actually bounds
    // is the PAIRS form — see q_dedup_minhash_skew below.
    // Measurement note (closes VERDICT r17 watch #2): BENCH_r17
    // committed a 50.54 s capped vs 9.68 s uncapped reading — a 5×
    // inversion nothing in the plan explains. The prescribed isolated
    // best-of-5 at sf0.1 under the cold-cache protocol (r18, idle box)
    // reads capped 7.17–8.57 s vs uncapped 6.31–7.85 s (bests 7.17 vs
    // 6.31 — the documented ~1.1× count-window overhead), and the r18
    // driver benches read 7.84 vs 8.40; the 50 s draw never reproduces.
    // Cause class: solo bench entries get ONE sample, and a GC/LRU
    // burst mid-draw owns the whole number — the 'cold' field added to
    // the bench JSON now surfaces such draws instead of letting them
    // stand alone.
    "q_dedup_lshseen_capped" -> ((s: SparkSession, d: String) => {
      val docs = Tables.load(GraftSession.tune(s), d, "documents")
      graft.operators.Dedup.lshFirstSeen(docs, "doc_id", "text",
        maxBucketSize = 64)
    }),

    // The hot-bucket cap under REAL bucket skew (VERDICT r15 item 1):
    // 10% of the corpus rewritten to one boilerplate template — one
    // mega bucket per band, the O(bucket²) pair-enumeration case the
    // cap exists for. Measured at sf0.1 (graft.tools.SkewCapProbe,
    // best-of-3): uncapped 10.15 s; cap=16 0.57 s; cap=64 0.61 s;
    // cap=256 1.11 s — the cap wins 16.8× at 64, and 64 is the default
    // recommendation (retains more small-cluster recall than 16 at the
    // same cost; 256 already doubles the runtime). The skew fixture is
    // derived deterministically so both variants time the same corpus.
    "q_dedup_minhash_skew" -> ((s: SparkSession, d: String) =>
      minhashSkew(s, d, cap = 64)),
    "q_dedup_minhash_skew_uncapped" -> ((s: SparkSession, d: String) =>
      minhashSkew(s, d, cap = 0)),

    // The gate definition (30-min frame over user_id) verifies the MV
    // arithmetic but sits in the regime where a direct window wins
    // (frames of ~0-2 rows at any SF of this data). The bench times
    // the regime the operator EXISTS for — long frames over hot keys,
    // where Spark's sliding RANGE frame recomputes the whole buffer
    // per row (no retraction in WindowExec's SlidingWindowFunctionFrame)
    // and goes quadratic, while the MV path stays
    // O(rows-per-bucket + buckets-per-frame) per row. 3-day frame,
    // 6-hour buckets, user_id%10 hot keys (~10k rows each, ~1.1k rows
    // per frame at sf0.1).
    "q_long_window" -> ((s: SparkSession, d: String) => {
      val ev = Tables.load(GraftSession.tune(s), d, "events")
        .withColumn("hk", col("user_id") % 10)
      val pre = graft.operators.LongWindow.buildPreAgg(
        ev, col("hk"), col("ts_ms"), col("value"), 21600000L)
      graft.operators.LongWindow.sumCountOverLongWindow(ev, pre,
          col("hk"), col("ts_ms"), col("value"), col("event_id"),
          precedingMs = 259200000L, bucketMs = 21600000L)
        .select(col("event_id"), round(col("lw_sum"), 3).as("lw_sum"),
          col("lw_cnt"))
    })
  )

  /** Boilerplate-skew fixture for the hot-bucket-cap bench pair: 10%
    * of documents share one template text (one mega bucket per band). */
  private def minhashSkew(s: SparkSession, d: String,
      cap: Int): DataFrame = {
    val docs = Tables.load(GraftSession.tune(s), d, "documents")
      .withColumn("text",
        when(col("doc_id") % 10 === 0,
          lit("the quick brown template boilerplate footer text " +
            "repeated across every page of the crawl"))
          .otherwise(col("text")))
    graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 1, bands = 8, rowsPerBand = 3, threshold = 0.25,
      maxBucketSize = cap)
  }

  /** Plan-gate overrides (graft.Plans / PlanQualitySpec): operators
    * whose public form ends in a materialization barrier
    * (localCheckpoint → `Scan ExistingRDD`) expose their pre-barrier
    * plan here so a regression in the actual shape stays visible.
    * Names absent here inspect their gate definition unchanged. */
  def planVariants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_lshseen" -> ((s: SparkSession, d: String) => {
      val docs = Tables.load(GraftSession.tune(s), d, "documents")
      graft.operators.Dedup.lshFirstSeenPlan(docs, "doc_id", "text")._1
    }),
    // the components rounds are eager, so the auditable lazy plan is
    // the pair-enumeration stage (bucketed self-join + argmin-literal
    // assignment), not the final labeling joins
    "q_dedup_semantic" -> ((s: SparkSession, d: String) => {
      val e = Tables.load(GraftSession.tune(s), d, "embeddings")
      val (edges, assigned) =
        graft.operators.Dedup.semanticDedupEdges(e, "vec_id", "embedding",
          threshold = 0.3, nlist = 8, iters = 5, nprobe = 2)
      // plan inspection never executes the edges, so the persisted
      // assignment handle would leak a registered RDD per gate run;
      // dropping the cache does not change the audited plan shape
      assigned.unpersist(false)
      edges
    })
  )
}
