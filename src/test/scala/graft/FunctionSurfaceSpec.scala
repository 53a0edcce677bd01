package graft

import org.apache.spark.sql.functions._
import graft.sql.GraftSql

/** Completeness sweep over the reference's GENERATED function doc
  * (docs/zh/openmldb_sql/udfs_8h.md — 152 `### function` entries): every
  * documented name must plan through the SQL front-end under at least
  * one documented signature. The YAML corpus proves semantics for the
  * functions it exercises; this spec proves no documented name is
  * silently absent. */
class FunctionSurfaceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (1, 10L, 1.5f, 2.5, "ab,cd", "k1:1,k2:2", true,
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05"),
      java.sql.Date.valueOf("2024-01-02"), "[1,2]")
  ).toDF("i32", "i64", "f", "dbl", "s", "kv", "b", "ts", "dt", "js")

  /** documented names (udfs_8h.md) → representative documented call */
  private val calls: Map[String, String] = Map(
    "abs" -> "abs(dbl)", "acos" -> "acos(dbl)", "add" -> "add(i32, i32)",
    "add_months" -> "add_months(dt, 1)",
    "array_contains" -> "array_contains(split(s, ','), 'ab')",
    "asin" -> "asin(dbl)", "at" -> "at(dbl, 0) OVER w",
    "atan" -> "atan(dbl)", "atan2" -> "atan2(dbl, dbl)",
    "avg" -> "avg(dbl) OVER w", "avg_cate" -> "avg_cate(dbl, s) OVER w",
    "avg_cate_where" -> "avg_cate_where(dbl, b, s) OVER w",
    "avg_where" -> "avg_where(dbl, b) OVER w",
    "bigint" -> "bigint(i32)", "bool" -> "bool(i32)",
    "ceil" -> "ceil(dbl)", "ceiling" -> "ceiling(dbl)",
    "char" -> "char(i32)", "char_length" -> "char_length(s)",
    "character_length" -> "character_length(s)",
    "concat" -> "concat(s, s)", "concat_ws" -> "concat_ws('-', s, s)",
    "cos" -> "cos(dbl)", "cot" -> "cot(dbl)",
    "count" -> "count(dbl) OVER w",
    "count_cate" -> "count_cate(dbl, s) OVER w",
    "count_cate_where" -> "count_cate_where(dbl, b, s) OVER w",
    "count_where" -> "count_where(dbl, b) OVER w",
    "date" -> "date(ts)", "date_format" -> "date_format(ts, '%Y-%m-%d')",
    "datediff" -> "datediff(dt, dt)", "day" -> "day(ts)",
    "dayofmonth" -> "dayofmonth(ts)", "dayofweek" -> "dayofweek(ts)",
    "dayofyear" -> "dayofyear(ts)", "degrees" -> "degrees(dbl)",
    "distinct_count" -> "distinct_count(dbl) OVER w",
    "double" -> "double(i32)", "drawdown" -> "drawdown(dbl) OVER w",
    "earth_distance" -> "earth_distance(dbl, dbl, dbl, dbl)",
    "entropy" -> "entropy(s) OVER w", "ew_avg" -> "ew_avg(dbl, 0.5) OVER w",
    "exp" -> "exp(dbl)",
    "farm_fingerprint" -> "farm_fingerprint(s)",
    "first_value" -> "first_value(dbl) OVER w",
    "float" -> "float(i32)", "floor" -> "floor(dbl)",
    "get_json_object" -> "get_json_object(js, '$[0]')",
    "hash64" -> "hash64(s)", "hex" -> "hex(i64)", "hour" -> "hour(ts)",
    "identity" -> "identity(dbl)", "if_null" -> "if_null(s, 'x')",
    "ifnull" -> "ifnull(s, 'x')", "inc" -> "inc(i32)",
    "int" -> "int(i64)", "int16" -> "int16(i32)",
    "int32" -> "int32(i64)", "int64" -> "int64(i32)",
    "is_null" -> "is_null(s)", "isnull" -> "isnull(s)",
    "join" -> "`join`(split(s, ','), '-')",
    "json_array_length" -> "json_array_length(js)",
    "lag" -> "lag(dbl, 1) OVER w", "last_day" -> "last_day(ts)",
    "lcase" -> "lcase(s)", "like_match" -> "like_match(s, 'a%')",
    "ilike_match" -> "ilike_match(s, 'A%')",
    "list_except_by_key" -> "`join`(list_except_by_key(split(kv, ','), 'k1'), ' ')",
    "list_except_by_value" -> "`join`(list_except_by_value(split(kv, ','), '1'), ' ')",
    "ln" -> "ln(dbl)", "log" -> "log(dbl)", "log10" -> "log10(dbl)",
    "log2" -> "log2(dbl)", "lower" -> "lower(s)",
    "make_tuple" -> "make_tuple(i32, s)",
    "max" -> "max(dbl) OVER w", "max_cate" -> "max_cate(dbl, s) OVER w",
    "max_cate_where" -> "max_cate_where(dbl, b, s) OVER w",
    "max_where" -> "max_where(dbl, b) OVER w",
    "maximum" -> "maximum(i32, i32)", "median" -> "median(dbl) OVER w",
    "min" -> "min(dbl) OVER w", "min_cate" -> "min_cate(dbl, s) OVER w",
    "min_cate_where" -> "min_cate_where(dbl, b, s) OVER w",
    "min_where" -> "min_where(dbl, b) OVER w",
    "minimum" -> "minimum(i32, i32)", "minute" -> "minute(ts)",
    "month" -> "month(ts)",
    "nth_value_where" -> "nth_value_where(dbl, 1, b) OVER w",
    "nvl" -> "nvl(s, 'x')", "nvl2" -> "nvl2(s, 'x', 'y')",
    "pmod" -> "pmod(i32, i32)", "pow" -> "pow(dbl, 2)",
    "power" -> "power(dbl, 2)", "radians" -> "radians(dbl)",
    "regexp_like" -> "regexp_like(s, 'a.*')",
    "replace" -> "replace(s, 'a', 'b')", "reverse" -> "reverse(s)",
    "round" -> "round(dbl)", "second" -> "second(ts)",
    "sin" -> "sin(dbl)", "size" -> "size(split(s, ','))",
    "smallint" -> "smallint(i32)",
    "split" -> "split(s, ',')", "split_array" -> "split_array(s, ',')",
    "split_by_key" -> "split_by_key(kv, ',', ':')",
    "split_by_value" -> "split_by_value(kv, ',', ':')",
    "sqrt" -> "sqrt(dbl)", "std" -> "std(dbl) OVER w",
    "stddev" -> "stddev(dbl) OVER w", "stddev_pop" -> "stddev_pop(dbl) OVER w",
    "stddev_samp" -> "stddev_samp(dbl) OVER w",
    "strcmp" -> "strcmp(s, s)", "string" -> "string(i32)",
    "substr" -> "substr(s, 1, 2)", "substring" -> "substring(s, 1, 2)",
    "sum" -> "sum(dbl) OVER w", "sum_cate" -> "sum_cate(dbl, s) OVER w",
    "sum_cate_where" -> "sum_cate_where(dbl, b, s) OVER w",
    "sum_where" -> "sum_where(dbl, b) OVER w",
    "tan" -> "tan(dbl)", "timestamp" -> "timestamp(i64)",
    "top" -> "top(s, 2) OVER w", "top1_ratio" -> "top1_ratio(s) OVER w",
    "top_n_key_avg_cate_where" -> "top_n_key_avg_cate_where(dbl, b, s, 2) OVER w",
    "top_n_key_count_cate_where" -> "top_n_key_count_cate_where(dbl, b, s, 2) OVER w",
    "top_n_key_max_cate_where" -> "top_n_key_max_cate_where(dbl, b, s, 2) OVER w",
    "top_n_key_min_cate_where" -> "top_n_key_min_cate_where(dbl, b, s, 2) OVER w",
    "top_n_key_ratio_cate" -> "top_n_key_ratio_cate(dbl, b, s, 2) OVER w",
    "top_n_key_sum_cate_where" -> "top_n_key_sum_cate_where(dbl, b, s, 2) OVER w",
    "top_n_value_avg_cate_where" -> "top_n_value_avg_cate_where(dbl, b, s, 2) OVER w",
    "top_n_value_count_cate_where" -> "top_n_value_count_cate_where(dbl, b, s, 2) OVER w",
    "top_n_value_max_cate_where" -> "top_n_value_max_cate_where(dbl, b, s, 2) OVER w",
    "top_n_value_min_cate_where" -> "top_n_value_min_cate_where(dbl, b, s, 2) OVER w",
    "top_n_value_ratio_cate" -> "top_n_value_ratio_cate(dbl, b, s, 2) OVER w",
    "top_n_value_sum_cate_where" -> "top_n_value_sum_cate_where(dbl, b, s, 2) OVER w",
    "topn_frequency" -> "topn_frequency(s, 2) OVER w",
    "truncate" -> "truncate(dbl)", "ucase" -> "ucase(s)",
    "unhex" -> "unhex(hex(i64))",
    "unix_timestamp" -> "unix_timestamp(ts)",
    "upper" -> "upper(s)", "var_pop" -> "var_pop(dbl) OVER w",
    "var_samp" -> "var_samp(dbl) OVER w",
    "variance" -> "variance(dbl) OVER w",
    "week" -> "week(ts)", "weekofyear" -> "weekofyear(ts)",
    "window_split" -> "window_split(s, ',') OVER w",
    "window_split_by_key" -> "window_split_by_key(kv, ',', ':') OVER w",
    "window_split_by_value" -> "window_split_by_value(kv, ',', ':') OVER w",
    "year" -> "year(ts)",
    "lag_is_window" -> "lag(dbl, 1) OVER w")

  test("every function in the reference's generated doc plans") {
    val docNames = calls.keySet - "lag_is_window"
    val failures = docNames.toSeq.sorted.flatMap { name =>
      val call = calls(name)
      val sql =
        if (call.contains("OVER w"))
          s"SELECT i32, $call AS r FROM t WINDOW w AS (PARTITION BY i32 " +
            "ORDER BY i64 ROWS_RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)"
        else s"SELECT $call AS r FROM t"
      try { GraftSql.sql(spark, sql, Map("t" -> t)).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getMessage.linesIterator.next().take(120)}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} documented functions do not plan:\n" +
        failures.mkString("\n"))
  }

  test("every documented operator evaluates") {
    // functions_and_operators/operators.md: comparison, logical,
    // arithmetic (incl. DIV/MOD keywords), bitwise
    val ops = Seq(
      "i32 > 0", "i32 >= 1", "i32 < 2", "i32 <= 1", "i32 != 2",
      "i32 <> 2", "i32 = 1", "i32 == 1",
      "i32 BETWEEN 0 AND 2", "i32 IN (1, 2)",
      "s LIKE 'a%'", "s ILIKE 'A%'", "s RLIKE 'a.*'",
      "b AND b", "b OR b", "b XOR b", "NOT b", "!b",
      "i32 % 2", "i32 MOD 2", "i32 * 2", "i32 + 2", "i32 - 2",
      "i32 / 2", "i32 DIV 2", "+i32", "-i32",
      "i64 & 3", "i64 | 3", "i64 ^ 3", "~i64")
    val failures = ops.flatMap { op =>
      try { GraftSql.sql(spark, s"SELECT ($op) AS r FROM t",
        Map("t" -> t)).collect(); None }
      catch { case e: Throwable =>
        Some(s"$op: ${e.getMessage.linesIterator.next().take(100)}") }
    }
    assert(failures.isEmpty,
      s"${failures.size} operators do not evaluate:\n${failures.mkString("\n")}")
  }

  test("documented UDAFs plan in GROUP BY context too") {
    val g = Seq((1, 1.5, "a", true, "x,y"), (1, 2.5, "b", false, "y,z"),
      (2, 9.0, "a", true, "z"))
      .toDF("k", "dbl", "s", "b", "csv")
    val aggCalls = Seq(
      "sum(dbl)", "count(dbl)", "avg(dbl)", "min(dbl)", "max(dbl)",
      "distinct_count(dbl)", "median(dbl)", "std(dbl)", "stddev(dbl)",
      "stddev_pop(dbl)", "stddev_samp(dbl)", "var_pop(dbl)",
      "var_samp(dbl)", "variance(dbl)",
      "sum_where(dbl, b)", "count_where(dbl, b)", "avg_where(dbl, b)",
      "min_where(dbl, b)", "max_where(dbl, b)",
      "sum_cate(dbl, s)", "count_cate(dbl, s)", "avg_cate(dbl, s)",
      "min_cate(dbl, s)", "max_cate(dbl, s)",
      "sum_cate_where(dbl, b, s)", "count_cate_where(dbl, b, s)",
      "avg_cate_where(dbl, b, s)", "min_cate_where(dbl, b, s)",
      "max_cate_where(dbl, b, s)",
      "top_n_key_sum_cate_where(dbl, b, s, 2)",
      "top_n_key_ratio_cate(dbl, b, s, 2)",
      "top_n_value_sum_cate_where(dbl, b, s, 2)",
      "top_n_value_ratio_cate(dbl, b, s, 2)",
      "entropy(s)", "drawdown(dbl)", "top1_ratio(s)",
      "topn_frequency(s, 2)", "top(dbl, 2)")
    val failures = aggCalls.flatMap { call =>
      try { GraftSql.sql(spark,
        s"SELECT k, $call AS r FROM g GROUP BY k", Map("g" -> g)).collect()
        None }
      catch { case e: Throwable =>
        Some(s"$call: ${e.getMessage.linesIterator.next().take(100)}") }
    }
    assert(failures.isEmpty,
      s"${failures.size} UDAFs do not plan grouped:\n${failures.mkString("\n")}")
    // grouped values: distinct_count counts NULL as a value; top sorts
    // desc with the reference rendering; topn_frequency pads to n
    val gn = Seq((1, Some(1.5), "a"), (1, None, "a"), (1, Some(1.5), "b"))
      .toDF("k", "dbl", "s")
    val r = GraftSql.sql(spark,
      "SELECT k, distinct_count(dbl) AS dc, top(dbl, 2) AS tp, " +
        "topn_frequency(s, 3) AS tf FROM gn GROUP BY k",
      Map("gn" -> gn)).collect()(0)
    assert(r.getLong(1) == 2L, s"distinct_count: $r")
    assert(r.getString(2) == "1.500000,1.500000", s"top: $r")
    assert(r.getString(3) == "a,b,NULL", s"topn_frequency: $r")
    // ew_avg grouped: documented rejection (weights need an order)
    val e = intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SELECT k, ew_avg(dbl, 0.5) AS e FROM g GROUP BY k",
        Map("g" -> g)).collect()
    }
    assert(e.getMessage.contains("ordered frame"))
  }

  test("surface-gap closures compute the documented values") {
    // scalars closed by the sweep: add/inc/maximum/minimum/if_null
    val r = GraftSql.sql(spark,
      "SELECT add(i32, 2) AS a, inc(i32) AS b, maximum(i32, 5) AS c, " +
        "minimum(i32, 5) AS d, if_null(cast(null as string), 'x') AS e FROM t",
      Map("t" -> t)).collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 2 &&
      r.getInt(2) == 5 && r.getInt(3) == 1 && r.getString(4) == "x")

    // ew_avg over a SQL window matches the Aggregator formulation:
    // newest-first weights (1-a)^i over non-null values
    val ev = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0))
      .toDF("k", "o", "v")
    val got = GraftSql.sql(spark,
      """SELECT o, ew_avg(v, 0.5) OVER w AS e, top(v, 2) OVER w AS tp
        |FROM ev WINDOW w AS (PARTITION BY k ORDER BY o
        |  ROWS_RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)""".stripMargin,
      Map("ev" -> ev)).collect().map(x => x.getLong(0) ->
        (x.getDouble(1), x.getString(2))).toMap
    // frame at o=3: vals newest-first 30,20,10; w = 1,.5,.25
    val want3 = (30 * 1.0 + 20 * 0.5 + 10 * 0.25) / 1.75
    assert(math.abs(got(3L)._1 - want3) < 1e-9)
    assert(math.abs(got(2L)._1 - (20 + 10 * 0.5) / 1.5) < 1e-9)
    assert(got(3L)._2 == "30.000000,20.000000")
    // integral values render plain
    val evi = Seq((1L, 1L, 7L), (1L, 2L, 9L)).toDF("k", "o", "v")
    val gi = GraftSql.sql(spark,
      """SELECT o, top(v, 2) OVER w AS tp
        |FROM ev WINDOW w AS (PARTITION BY k ORDER BY o
        |  ROWS_RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)""".stripMargin,
      Map("ev" -> evi)).collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(gi(2L) == "9,7")
  }
}
