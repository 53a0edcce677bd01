package graft

import org.scalatest.funsuite.AnyFunSuite

/** Request-mode FROM-subquery semantics: the request row flows through
  * the subquery's projection, and derived-side LAST JOINs re-align per
  * request row (the FeatureZero multi-out pattern,
  * cases/function/fz_ddl). */
class RequestModeSubquerySpec extends SparkSpec {
  test("subquery-from last join with alias") {
    import spark.implicits._
    val t = Seq(("a", 1L, 10), ("b", 2L, 20)).toDF("reqId", "ts", "v")
    t.createOrReplaceTempView("flattenRequest")
    val sql = """select * from
(
select reqId as reqId_1, `reqId` as orig0 from `flattenRequest`
)
as out0
last join
(
select reqId as reqId_5, v as v5 from `flattenRequest`
) as out1
on out0.reqId_1 = out1.reqId_5"""
    val df = graft.sql.GraftSql.sql(spark, sql)
    df.show()
    assert(df.columns.toSeq ==
      Seq("reqId_1", "orig0", "reqId_5", "v5"))
    val req = graft.sql.GraftSql.requestMode(spark, sql, t,
      Map("flattenRequest" -> t))
    req.show()
    assert(req.columns.toSeq ==
      Seq("reqId_1", "orig0", "reqId_5", "v5"))
  }

  test("duplicate join keys across requests re-align per request row") {
    import spark.implicits._
    val hist = Seq(("a", 900L, 1)).toDF("reqId", "ts", "v")
    hist.createOrReplaceTempView("flattenRequest")
    // two requests share reqId "a" but carry different ts: each must
    // pair with ITS OWN derived-side row (the reference executes each
    // request independently)
    val reqs = Seq(("a", 1000L, 10), ("a", 2000L, 20)).toDF("reqId", "ts", "v")
    val sql = """select * from
      (select reqId as r1, ts as t1 from flattenRequest) as out0
      last join
      (select reqId as r2, sum(v) over w as s2 from flattenRequest
        window w as (partition by reqId order by ts
          rows_range between 10s preceding and current row)) as out1
      on out0.r1 = out1.r2"""
    val out = graft.sql.GraftSql.requestMode(spark, sql, reqs,
      Map("flattenRequest" -> hist))
      .orderBy("t1").collect()
    assert(out.length == 2)
    // request 1 (ts=1000): frame holds history v=1 + own v=10 → 11
    // request 2 (ts=2000): frame holds history v=1 + own v=20 → 21
    assert(out(0).getAs[Number]("s2").longValue == 11L)
    assert(out(1).getAs[Number]("s2").longValue == 21L)
  }
}
