package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sql.GraftSql

/** `SET @@window_skew_opt = 'true'` — the SQL planner's time-bucket
  * window skew optimization (reference: openmldb-batch
  * OpenmldbBatchConfig.scala:52-73 `spark.openmldb.window.skew.opt`,
  * SkewDataFrameUtils.scala). The salted rewrite must be LOSSLESS:
  * every window shape that buckets yields byte-identical results to
  * the unsalted plan, and ineligible shapes (ROWS frames, unbounded
  * frames, lag) silently keep their unbucketed plan.
  */
class SkewWindowSqlSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (u0: 60 rows incl. duplicate timestamps) + normal keys
  private lazy val ev: DataFrame = {
    val hot = (0 until 60).map(i => ("u0", (i / 2) * 1000L, i.toDouble))
    val cold = for (u <- 1 to 5; i <- 0 until 8)
      yield (s"u$u", i * 700L, (u * 100 + i).toDouble)
    (hot ++ cold).toDF("pk", "ts", "v")
  }

  private def withSkew[A](body: => A): A = {
    GraftSql.statement(spark, "SET @@window_skew_opt = 'true'")
    try body
    finally GraftSql.statement(spark, "SET @@window_skew_opt = 'false'")
  }

  private def run(sql: String, tables: Map[String, DataFrame]): Seq[String] =
    GraftSql.sql(spark, sql, tables).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def assertLossless(sql: String,
      tables: Map[String, DataFrame] = Map("ev" -> ev)): Unit = {
    val plainRows = run(sql, tables)
    val skewRows = withSkew(run(sql, tables))
    assert(skewRows == plainRows, s"skewed result diverged for:\n$sql")
  }

  test("plain ROWS_RANGE sum/count/avg buckets losslessly (strict ties)") {
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s, count(v) OVER w AS c,
        |  avg(v) OVER w AS a
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  test("MAXSIZE + EXCLUDE CURRENT_TIME / CURRENT_ROW bucket losslessly") {
    assertLossless(
      """SELECT pk, ts, count(v) OVER w AS c, max(v) OVER w AS mx
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW MAXSIZE 4)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW
        |  EXCLUDE CURRENT_TIME)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW
        |  EXCLUDE CURRENT_ROW)""".stripMargin)
  }

  test("WINDOW UNION and frame-only aggregates bucket losslessly") {
    val side = Seq(("u0", 1500L, 1000.0), ("u1", 900L, 2000.0))
      .toDF("pk", "ts", "v")
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s, distinct_count(v) OVER w AS dc
        |FROM ev WINDOW w AS (UNION side PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW)""".stripMargin,
      Map("ev" -> ev, "side" -> side))
  }

  test("upper Prec bound and OPEN frames bucket losslessly") {
    assertLossless(
      """SELECT pk, ts, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND 1s PRECEDING)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s OPEN PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  test("ineligible shapes (unbounded / lag) stay correct under the flag") {
    assertLossless(
      """SELECT pk, ts, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, lag(v, 1) OVER w AS pv
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  test("bounded ROWS frames chunk losslessly (incl. EXCLUDE / bounds)") {
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS BETWEEN 5 PRECEDING AND 2 PRECEDING)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, distinct_count(v) OVER w AS dc
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW EXCLUDE CURRENT_ROW)""".stripMargin)
  }

  test("ROWS chunking stays lossless across a chunk boundary (>4096 rows)") {
    // one key larger than the minimum chunk, with duplicate timestamps:
    // rows just past rank 4096 must read their history from the prior
    // chunk's replicas
    val big = (0 until 9000).map(i => ("uh", (i / 2) * 10L, i.toDouble))
      .toDF("pk", "ts", "v")
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)""".stripMargin,
      Map("ev" -> big))
  }

  test("ROWS + EXCLUDE CURRENT_TIME stays unbucketed (reach is unbounded)") {
    // a same-ts run longer than the minimum chunk: EXCLUDE CURRENT_TIME
    // filters same-ts predecessors BEFORE the row cap, so the frame of
    // a row early in the second chunk must reach across the ENTIRE
    // first-chunk ts-run to the older rows — no fixed chunk span covers
    // that, so the shape must stay out of the chunking rewrite
    val run = (0 until 4200).map { i =>
      ("uh", if (i < 8) 100L else 200L, i.toDouble) }
      .toDF("pk", "ts", "v")
    val sql = """SELECT pk, ts, sum(v) OVER w AS s
      |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
      |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW EXCLUDE CURRENT_TIME)""".stripMargin
    assertLossless(sql, Map("ev" -> run))
    val plan = withSkew(GraftSql.sql(spark, sql, Map("ev" -> run)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_swb"),
      "ROWS + EXCLUDE CURRENT_TIME must not chunk")
  }

  test("DESC order buckets losslessly (negated-key buckets)") {
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts DESC
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w AS s
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts DESC
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin)
    assertLossless(
      """SELECT pk, ts, max(v) OVER w AS mx
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts DESC
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW MAXSIZE 3)""".stripMargin)
  }

  test("DESC RANGE frames reach toward larger keys (dialect extension)") {
    // hand-computed: DESC preceding = later timestamps
    val t = Seq(("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
      ("a", 40L, 4.0)).toDF("k", "ts", "v")
    def q(sql: String) = GraftSql.sql(spark, sql, Map("t" -> t)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val rr = q("""SELECT ts, sum(v) OVER w AS s FROM t
      |WINDOW w AS (PARTITION BY k ORDER BY ts DESC
      |  ROWS_RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)""".stripMargin)
    assert(rr == Seq((10L, 3.0), (20L, 5.0), (30L, 7.0), (40L, 4.0)))
    // and the same under the skew flag
    val rrSkew = withSkew(q("""SELECT ts, sum(v) OVER w AS s FROM t
      |WINDOW w AS (PARTITION BY k ORDER BY ts DESC
      |  ROWS_RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)""".stripMargin))
    assert(rrSkew == rr)
    // ROWS agrees with the same direction convention
    val rw = q("""SELECT ts, sum(v) OVER w AS s FROM t
      |WINDOW w AS (PARTITION BY k ORDER BY ts DESC
      |  ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)""".stripMargin)
    assert(rw == Seq((10L, 3.0), (20L, 5.0), (30L, 7.0), (40L, 4.0)))
  }

  test("mixed ROWS + RANGE group buckets both shapes") {
    assertLossless(
      """SELECT pk, ts, sum(v) OVER w1 AS s1, sum(v) OVER w2 AS s2
        |FROM ev WINDOW w1 AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW),
        |w2 AS (PARTITION BY pk ORDER BY ts
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin)
  }

  test("ROWS window with UNION keeps the whole group unbucketed, correct") {
    val side = Seq(("u0", 1500L, 1000.0)).toDF("pk", "ts", "v")
    val sql = """SELECT pk, ts, count(v) OVER w AS c
      |FROM ev WINDOW w AS (UNION side PARTITION BY pk ORDER BY ts
      |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin
    assertLossless(sql, Map("ev" -> ev, "side" -> side))
    val plan = withSkew(GraftSql.sql(spark, sql,
      Map("ev" -> ev, "side" -> side))).queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_swb"))
  }

  test("the chunked ROWS plan exchanges on (keys, chunk)") {
    val df = withSkew(GraftSql.sql(spark,
      """SELECT pk, ts, sum(v) OVER w AS s
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,
      Map("ev" -> ev)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_swb_0"),
      s"expected chunk column in plan:\n${plan.take(2000)}")
    assert(plan.contains("hashpartitioning(pk"), "expected keyed exchange")
  }

  test("the skewed plan exchanges on (keys, bucket) — the split is real") {
    val df = withSkew(GraftSql.sql(spark,
      """SELECT pk, ts, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW MAXSIZE 4)""".stripMargin,
      Map("ev" -> ev)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__graft_swb_0"),
      s"expected skew bucket column in plan:\n${plan.take(2000)}")
    assert(plan.contains("hashpartitioning(pk"), "expected keyed exchange")
    // and the flag off → no bucket column
    val off = GraftSql.sql(spark,
      """SELECT pk, ts, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW MAXSIZE 4)""".stripMargin,
      Map("ev" -> ev))
    assert(!off.queryExecution.executedPlan.toString.contains("__graft_swb"))
  }

  test("SET validates the flag and the plan cache keys on it") {
    intercept[IllegalArgumentException] {
      GraftSql.statement(spark, "SET @@window_skew_opt = 'sideways'")
    }
    // same text + same sources, different flag → different plans
    val sql0 =
      """SELECT pk, ts, count(v) OVER w AS c
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW)""".stripMargin
    val p1 = GraftSql.sql(spark, sql0, Map("ev" -> ev))
      .queryExecution.executedPlan.toString
    val p2 = withSkew(GraftSql.sql(spark, sql0, Map("ev" -> ev))
      .queryExecution.executedPlan.toString)
    assert(!p1.contains("__graft_swb"))
    assert(p2.contains("__graft_swb"))
  }
}
