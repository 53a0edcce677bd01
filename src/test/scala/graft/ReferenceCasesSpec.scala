package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.sql.GraftSql

/** Reference YAML SQL-case goldens, hand-ported (cases cited by
  * file:line from /root/reference/cases). The dialect SQL runs through
  * GraftSql verbatim (placeholders {0}/{1} → t0/t1); `timestamp`
  * columns use the engine's canonical int64-ms representation.
  */
class ReferenceCasesSpec extends SparkSpec {

  private def typ(t: String): DataType = t match {
    case "int"       => IntegerType
    case "smallint"  => ShortType
    case "string"    => StringType
    case "bigint"    => LongType
    case "float"     => FloatType
    case "double"    => DoubleType
    case "timestamp" => LongType // int64 ms (SURVEY §1.2)
    case "date"      => StringType
  }

  private def tbl(name: String, cols: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    val schema = StructType(cols.map { c =>
      val Array(n, t) = c.split(" ")
      StructField(n, typ(t))
    })
    val rdd = spark.sparkContext.parallelize(rows.map(Row(_: _*)))
    spark.createDataFrame(rdd, schema).createOrReplaceTempView(name)
  }

  // normalize every numeric to a fixed-scale BigDecimal so Int/Long/
  // Double representations compare equal (Scala Seq literals unify
  // mixed numerics to Double)
  private def norm(x: Any): Any = x match {
    case null      => null
    case i: Int    => BigDecimal(i).setScale(6)
    case l: Long   => BigDecimal(l).setScale(6)
    case sh: Short => BigDecimal(sh.toInt).setScale(6)
    case f: Float  => BigDecimal(f.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    case d: Double => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    case s         => s
  }

  private def check(sql: String, orderCol: String,
      expect: Seq[Seq[Any]]): Unit = {
    val out = GraftSql.sql(spark, sql)
    val oi = out.columns.indexOf(orderCol)
    def sortKey(v: Any): (Long, String) = v match {
      case n: Number => (n.longValue, "")
      case s         => (0L, String.valueOf(s))
    }
    val got = out.collect().toSeq
      .sortBy(r => sortKey(r.get(oi)))
      .map(_.toSeq.map(norm))
    val want = expect.map(_.map(norm))
    assert(got == want, s"\ngot:  ${got.mkString("\n      ")}\nwant: ${want.mkString("\n      ")}")
  }

  private val stdCols = Seq("id int", "c1 string", "c3 int", "c4 bigint",
    "c5 float", "c6 double", "c7 timestamp", "c8 date")
  private val stdRows: Seq[Seq[Any]] = Seq(
    Seq(1, "aa", 20, 30L, 1.1f, 2.1, 1590738990000L, "2020-05-01"),
    Seq(2, "aa", 21, 31L, 1.2f, 2.2, 1590738990001L, "2020-05-02"),
    Seq(3, "aa", 22, 32L, 1.3f, 2.3, 1590738990002L, "2020-05-03"),
    Seq(4, "aa", 23, 33L, 1.4f, 2.4, 1590738990003L, "2020-05-04"),
    Seq(5, "aa", 24, 34L, 1.5f, 2.5, 1590738990004L, "2020-05-05"))

  test("test_maxsize.yaml id 0: MAXSIZE smaller than the window") {
    tbl("t0", stdCols, stdRows)
    check(
      """SELECT id, c1, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |  ROWS_RANGE BETWEEN 6 PRECEDING AND CURRENT ROW MAXSIZE 3)""".stripMargin,
      "id",
      Seq(Seq(1, "aa", 30L), Seq(2, "aa", 61L), Seq(3, "aa", 93L),
        Seq(4, "aa", 96L), Seq(5, "aa", 99L)))
  }

  test("test_maxsize.yaml id 1: MAXSIZE larger than the window") {
    tbl("t0", stdCols, stdRows)
    check(
      """SELECT id, c1, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |  ROWS_RANGE BETWEEN 2 PRECEDING AND CURRENT ROW MAXSIZE 5)""".stripMargin,
      "id",
      Seq(Seq(1, "aa", 30L), Seq(2, "aa", 61L), Seq(3, "aa", 93L),
        Seq(4, "aa", 96L), Seq(5, "aa", 99L)))
  }

  test("test_window_exclude_current_time.yaml id 0: OPEN PRECEDING EXCLUDE CURRENT_TIME") {
    val cols = Seq("c1 string", "c3 int", "c4 double", "c7 timestamp")
    val rows: Seq[Seq[Any]] = Seq(
      Seq("aa", -2, 1.0, 0L), Seq("aa", -1, 1.0, 0L), Seq("aa", 0, 1.0, 0L),
      Seq("aa", 1, 1.0, 1590738990000L), Seq("aa", 2, 1.0, 1590738990000L),
      Seq("aa", 3, 1.0, 1590738992000L), Seq("aa", 4, 1.0, 1590738993000L),
      Seq("aa", 5, 1.0, 1590738994000L), Seq("aa", 6, 1.0, 1590738994000L),
      Seq("aa", 7, 1.0, 1590738999000L), Seq("aa", 8, 1.0, 1590739001000L),
      Seq("aa", 9, 1.0, 1590739002000L))
    tbl("t0", cols, rows)
    check(
      """SELECT c3, c7, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |  ROWS_RANGE BETWEEN 4s OPEN PRECEDING AND CURRENT ROW
        |  EXCLUDE CURRENT_TIME)""".stripMargin,
      "c3",
      Seq(Seq(-2, 0L, 1.0), Seq(-1, 0L, 1.0), Seq(0, 0L, 1.0),
        Seq(1, 1590738990000L, 1.0), Seq(2, 1590738990000L, 1.0),
        Seq(3, 1590738992000L, 3.0), Seq(4, 1590738993000L, 4.0),
        Seq(5, 1590738994000L, 3.0), Seq(6, 1590738994000L, 3.0),
        Seq(7, 1590738999000L, 1.0), Seq(8, 1590739001000L, 2.0),
        Seq(9, 1590739002000L, 3.0)))
  }

  test("test_window_union.yaml id 0: plain WINDOW UNION with ROWS frame") {
    tbl("t0", stdCols, Seq(
      Seq(1, "aa", 20, 30L, 1.1f, 2.1, 1590738990000L, "2020-05-01"),
      Seq(4, "dd", 20, 33L, 1.4f, 2.4, 1590738993000L, "2020-05-04"),
      Seq(5, "ee", 21, 34L, 1.5f, 2.5, 1590738994000L, "2020-05-05")))
    tbl("t1", stdCols, Seq(
      Seq(2, "bb", 20, 31L, 1.2f, 2.2, 1590738991000L, "2020-05-02"),
      Seq(3, "cc", 20, 32L, 1.3f, 2.3, 1590738992000L, "2020-05-03")))
    check(
      """SELECT id, c1, c3, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (UNION t1 PARTITION BY t0.c3 ORDER BY t0.c7
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
      "id",
      Seq(Seq(1, "aa", 20, 30L), Seq(4, "dd", 20, 96L), Seq(5, "ee", 21, 34L)))
  }

  private val ljCols = Seq("c1 string", "c2 int", "c3 bigint", "c4 timestamp")

  test("test_lastjoin_simple.yaml id 1: ordered LAST JOIN") {
    tbl("t0", ljCols, Seq(
      Seq("aa", 2, 3L, 1590738989000L), Seq("bb", 21, 31L, 1590738990000L),
      Seq("cc", 41, 51L, 1590738991000L)))
    tbl("t1", ljCols, Seq(
      Seq("aa", 2, 13L, 1590738989000L), Seq("bb", 21, 131L, 1590738990000L),
      Seq("cc", 41, 151L, 1590738992000L)))
    check(
      """select t0.c1 AS c1, t0.c2 AS c2, t1.c3 AS c3, t1.c4 AS c4
        |from t0 last join t1 ORDER BY t1.c3 on t0.c1 = t1.c1""".stripMargin,
      "c1",
      Seq(Seq("aa", 2, 13L, 1590738989000L),
        Seq("bb", 21, 131L, 1590738990000L),
        Seq("cc", 41, 151L, 1590738992000L)))
  }

  test("test_lastjoin_simple.yaml id 2: unmatched left rows keep nulls") {
    tbl("t0", ljCols, Seq(
      Seq("aa", 2, 3L, 1590738989000L), Seq("bb", 21, 31L, 1590738990000L),
      Seq("cc", 41, 51L, 1590738991000L)))
    tbl("t1", ljCols, Seq(
      Seq("aa", 2, 13L, 1590738989000L), Seq("bb", 21, 131L, 1590738990000L),
      Seq("dd", 41, 151L, 1590738991000L)))
    check(
      """select t0.c1 AS c1, t0.c2 AS c2, t1.c3 AS c3, t1.c4 AS c4
        |from t0 last join t1 ORDER BY t1.c3 on t0.c1 = t1.c1""".stripMargin,
      "c1",
      Seq(Seq("aa", 2, 13L, 1590738989000L),
        Seq("bb", 21, 131L, 1590738990000L),
        Seq("cc", 41, null, null)))
  }

  private val crCols = Seq("c1 string", "c3 int", "c4 bigint", "c5 float",
    "c6 double", "c7 timestamp", "c8 date")
  private val crRows: Seq[Seq[Any]] = Seq(
    Seq("aa", 20, 30L, 1.1f, 2.1, 1590738990000L, "2020-05-01"),
    Seq("aa", 21, 31L, 1.2f, 2.2, 1590738991000L, "2020-05-02"),
    Seq("aa", 22, 32L, 1.3f, 2.3, 1590738992000L, "2020-05-03"),
    Seq("aa", 23, 33L, 1.4f, 2.4, 1590738993000L, "2020-05-04"),
    Seq("bb", 24, 34L, 1.5f, 2.5, 1590738994000L, "2020-05-05"))

  test("test_current_row.yaml id 0: ROWS frame EXCLUDE CURRENT_ROW") {
    tbl("t0", crCols, crRows)
    check(
      """SELECT c1, c3, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT_ROW)""".stripMargin,
      "c3",
      Seq(Seq("aa", 20, null), Seq("aa", 21, 30L), Seq("aa", 22, 61L),
        Seq("aa", 23, 63L), Seq("bb", 24, null)))
  }

  test("test_current_row.yaml id 1: ROWS_RANGE EXCLUDE CURRENT_ROW") {
    tbl("t0", crCols, crRows)
    check(
      """SELECT c1, c3, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |  ROWS_RANGE BETWEEN 2s PRECEDING AND CURRENT ROW EXCLUDE CURRENT_ROW)""".stripMargin,
      "c3",
      Seq(Seq("aa", 20, null), Seq("aa", 21, 30L), Seq("aa", 22, 61L),
        Seq("aa", 23, 63L), Seq("bb", 24, null)))
  }

  test("window_attributes.yaml id 10: two EXCLUDE CURRENT_ROW windows, no merge") {
    tbl("t0", crCols, crRows)
    check(
      """SELECT c1, c3, sum(c4) OVER w1 as w1_c4_sum,
        |  count(c5) OVER w2 as w2_c5_count FROM t0
        |WINDOW
        |  w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW EXCLUDE CURRENT_ROW),
        |  w2 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |    ROWS_RANGE BETWEEN 2s PRECEDING AND CURRENT ROW EXCLUDE CURRENT_ROW)""".stripMargin,
      "c3",
      Seq(Seq("aa", 20, null, 0L), Seq("aa", 21, 30L, 1L),
        Seq("aa", 22, 61L, 2L), Seq("aa", 23, 63L, 2L),
        Seq("bb", 24, null, 0L)))
  }

  test("test_window_union.yaml id 13: UNION with INSTANCE_NOT_IN_WINDOW") {
    tbl("t0", stdCols, Seq(
      Seq(1, "aa", 20, 30L, 1.1f, 2.1, 1590738993000L, "2020-05-01"),
      Seq(4, "dd", 20, 33L, 1.4f, 2.4, 1590738994000L, "2020-05-04"),
      Seq(5, "ee", 21, 34L, 1.5f, 2.5, 1590738995000L, "2020-05-05")))
    tbl("t1", stdCols, Seq(
      Seq(2, "bb", 20, 31L, 1.2f, 2.2, 1590738991000L, "2020-05-02"),
      Seq(3, "cc", 20, 32L, 1.3f, 2.3, 1590738992000L, "2020-05-03")))
    check(
      """SELECT id, c1, c3, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (UNION t1 PARTITION BY t0.c3 ORDER BY t0.c7
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW INSTANCE_NOT_IN_WINDOW)""".stripMargin,
      "id",
      Seq(Seq(1, "aa", 20, 93L), Seq(4, "dd", 20, 96L), Seq(5, "ee", 21, 34L)))
  }

  test("last_join_window_query.yaml id 0: LAST JOIN feeding window features") {
    tbl("t1", Seq("col0 string", "col1 int", "col2 smallint", "col3 float",
      "col4 double", "col5 bigint", "col6 string"), Seq(
      Seq("0", 1, 5.toShort, 1.1f, 11.1, 1L, "1"),
      Seq("0", 2, 5.toShort, 2.2f, 22.2, 2L, "22"),
      Seq("1", 3, 55.toShort, 3.3f, 33.3, 1L, "333"),
      Seq("1", 4, 55.toShort, 4.4f, 44.4, 2L, "4444"),
      Seq("2", 5, 55.toShort, 5.5f, 55.5, 3L, "a" * 66)))
    tbl("t2", Seq("str0 string", "str1 string", "col3 float", "col4 double",
      "col2 smallint", "col1 int", "col5 bigint"), Seq(
      Seq("2", "EEEEE", 5.5f, 550.5, 550.toShort, 5, 3L),
      Seq("1", "DDDD", 4.4f, 440.4, 550.toShort, 4, 2L),
      Seq("1", "CCC", 3.3f, 330.3, 550.toShort, 3, 1L),
      Seq("0", "BB", 2.2f, 220.2, 50.toShort, 2, 2L),
      Seq("0", "A", 1.1f, 110.1, 50.toShort, 1, 1L)))
    check(
      """SELECT t1.col1 as id, t1.col2 as t1_col2, t1.col5 as t1_col5,
        |sum(t1.col1) OVER w1 as w1_col1_sum, sum(t1.col3) OVER w1 as w1_col3_sum,
        |sum(t2.col4) OVER w1 as w1_t2_col4_sum, sum(t2.col2) OVER w1 as w1_t2_col2_sum,
        |sum(t1.col5) OVER w1 as w1_col5_sum,
        |str1 as t2_str1 FROM t1
        |last join t2 order by t2.col5 on t1.col1 = t2.col1 and t1.col5 = t2.col5
        |WINDOW w1 AS (PARTITION BY t1.col2 ORDER BY t1.col5
        |  ROWS_RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) limit 10""".stripMargin,
      "id",
      Seq(
        Seq(1, 5, 1L, 1L, 1.1, 110.1, 50L, 1L, "A"),
        Seq(2, 5, 2L, 3L, 3.3, 330.3, 100L, 3L, "BB"),
        Seq(3, 55, 1L, 3L, 3.3, 330.3, 550L, 1L, "CCC"),
        Seq(4, 55, 2L, 7L, 7.7, 770.7, 1100L, 3L, "DDDD"),
        Seq(5, 55, 3L, 12L, 13.2, 1321.2, 1650L, 6L, "EEEEE")))
  }

  test("test_window_union.yaml id 11: FROM subquery + UNION subquery") {
    tbl("t0", stdCols, Seq(
      Seq(1, "aa", 20, 30L, 1.1f, 2.1, 1590738990000L, "2020-05-01"),
      Seq(4, "dd", 20, 33L, 1.4f, 2.4, 1590738993000L, "2020-05-04"),
      Seq(5, "ee", 21, 34L, 1.5f, 2.5, 1590738994000L, "2020-05-05")))
    tbl("t1", stdCols, Seq(
      Seq(2, "bb", 20, 31L, 1.2f, 2.2, 1590738991000L, "2020-05-02"),
      Seq(3, "cc", 20, 32L, 1.3f, 2.3, 1590738992000L, "2020-05-03")))
    check(
      """SELECT id, c1, c3, sum(c4) OVER w1 as w1_c4_sum
        |FROM ( select * from t0 )
        |WINDOW w1 AS (UNION ( select * from t1 ) PARTITION BY t0.c3
        |  ORDER BY t0.c7 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
      "id",
      Seq(Seq(1, "aa", 20, 30L), Seq(4, "dd", 20, 96L), Seq(5, "ee", 21, 34L)))
  }

  test("test_window_union.yaml id 12: multiple union tables, one a subquery") {
    tbl("t0", stdCols, Seq(
      Seq(1, "aa", 20, 30L, 1.1f, 2.1, 1590738990000L, "2020-05-01"),
      Seq(4, "dd", 20, 33L, 1.4f, 2.4, 1590738993000L, "2020-05-04"),
      Seq(5, "dd", 20, 33L, 1.4f, 2.4, 1590738994000L, "2020-05-04"),
      Seq(6, "ee", 21, 34L, 1.5f, 2.5, 1590738995000L, "2020-05-05")))
    tbl("t1", stdCols, Seq(
      Seq(3, "cc", 20, 32L, 1.3f, 2.3, 1590738992000L, "2020-05-03")))
    tbl("t2", stdCols, Seq(
      Seq(2, "bb", 20, 31L, 1.2f, 2.2, 1590738991000L, "2020-05-02")))
    check(
      """SELECT id, c1, c3, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (UNION ( select * from t1 ), t2 PARTITION BY t0.c3
        |  ORDER BY t0.c7 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,
      "id",
      Seq(Seq(1, "aa", 20, 30L), Seq(4, "dd", 20, 126L),
        Seq(5, "dd", 20, 129L), Seq(6, "ee", 21, 34L)))
  }

  test("test_window_exclude_current_time.yaml id 1: MAXSIZE 2 + OPEN + EXCLUDE CT") {
    val cols = Seq("c1 string", "c3 int", "c4 double", "c7 timestamp")
    val rows: Seq[Seq[Any]] = Seq(
      Seq("aa", 1, 1.0, 1590738990000L), Seq("aa", 2, 1.0, 1590738990000L),
      Seq("aa", 3, 1.0, 1590738992000L), Seq("aa", 4, 1.0, 1590738993000L),
      Seq("aa", 5, 1.0, 1590738994000L), Seq("aa", 6, 1.0, 1590738994000L),
      Seq("aa", 7, 1.0, 1590738999000L), Seq("aa", 8, 1.0, 1590739001000L),
      Seq("aa", 9, 1.0, 1590739002000L))
    tbl("t0", cols, rows)
    check(
      """SELECT c3, c7, sum(c4) OVER w1 as w1_c4_sum FROM t0
        |WINDOW w1 AS (PARTITION BY t0.c1 ORDER BY t0.c7
        |  ROWS_RANGE BETWEEN 4s OPEN PRECEDING AND CURRENT ROW
        |  MAXSIZE 2 EXCLUDE CURRENT_TIME)""".stripMargin,
      "c3",
      Seq(Seq(1, 1590738990000L, 1.0), Seq(2, 1590738990000L, 1.0),
        Seq(3, 1590738992000L, 2.0), Seq(4, 1590738993000L, 2.0),
        Seq(5, 1590738994000L, 2.0), Seq(6, 1590738994000L, 2.0),
        Seq(7, 1590738999000L, 1.0), Seq(8, 1590739001000L, 2.0),
        Seq(9, 1590739002000L, 2.0)))
  }

  test("window_attributes.yaml id 11: UNBOUNDED ROWS EXCLUDE CURRENT_ROW with min/max") {
    // note Seq[Any]: an all-numeric Seq literal weak-lub-widens Ints to
    // Long, breaking the IntegerType row encoder
    tbl("t1", Seq("id int", "ts timestamp", "g int", "val int"), Seq(
      Seq[Any](1, 99000L, 111, 21), Seq[Any](2, 100000L, 111, 22),
      Seq[Any](3, 101000L, 111, 23), Seq[Any](4, 102000L, 111, 44),
      Seq[Any](5, 100000L, 114, 56), Seq[Any](6, 102000L, 114, 52)))
    check(
      """select id, count(val) over w as cnt, max(val) over w as mv,
        |  min(val) over w as mi
        |FROM t1 WINDOW w as (PARTITION by g ORDER by ts
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE CURRENT_ROW)""".stripMargin,
      "id",
      Seq(Seq(1, 0L, null, null), Seq(2, 1L, 21, 21), Seq(3, 2L, 22, 21),
        Seq(4, 3L, 23, 21), Seq(5, 0L, null, null), Seq(6, 1L, 56, 56)))
  }

  test("group_query.yaml id 1: group by with mixed-type sums") {
    tbl("t1", Seq("col0 string", "col1 int", "col2 smallint", "col3 float",
      "col4 double", "col5 bigint", "col6 string"), Seq(
      Seq("0", 1, 5.toShort, 1.1f, 11.1, 1L, "1"),
      Seq("0", 2, 5.toShort, 2.2f, 22.2, 2L, "22"),
      Seq("1", 3, 55.toShort, 3.3f, 33.3, 1L, "333"),
      Seq("1", 4, 55.toShort, 4.4f, 44.4, 2L, "4444"),
      Seq("2", 5, 55.toShort, 5.5f, 55.5, 3L, "a" * 66)))
    check(
      """SELECT col2, sum(col1) as col1_sum, sum(col3) as col3_sum,
        |sum(col4) as col4_sum, sum(col2) as col2_sum,
        |sum(col5) as col5_sum FROM t1 Group By t1.col2""".stripMargin,
      "col2",
      Seq(Seq(5, 3L, 3.3, 33.3, 10L, 3L),
        Seq(55, 12L, 13.2, 133.2, 165L, 6L)))
  }

  test("test_window.yaml shape: anonymous window over ROWS frame") {
    tbl("t0", stdCols, stdRows)
    check(
      """SELECT id, sum(c4) OVER (PARTITION BY c1 ORDER BY c7
        |  ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM t0""".stripMargin,
      "id",
      Seq(Seq(1, 30L), Seq(2, 61L), Seq(3, 63L), Seq(4, 65L), Seq(5, 67L)))
  }
}
