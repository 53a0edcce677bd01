package graft

import org.apache.spark.sql.DataFrame
import graft.sql.GraftSql

/** REVIEW SCRATCH — delete after review. Checks whether the window
  * skew optimization stays lossless when a registered UDAF takes a
  * nested window-result argument (evaluated per FRAME row). */
class SkewReproScratch extends SparkSpec {
  import spark.implicits._

  test("UDAF with nested window arg under skew opt is lossless") {
    GraftSql.resetCatalogState(spark)
    GraftSql.statement(spark,
      "CREATE AGGREGATE FUNCTION sum2_agg(x DOUBLE) RETURNS DOUBLE " +
        "OPTIONS (INIT = 'CAST(0.0 AS DOUBLE)', STEP = 'acc + x')")
    val rows = (0 until 40).map(i => ("u0", i * 1300L, i.toDouble))
    val ev: DataFrame = rows.toDF("pk", "ts", "v")
    val sql =
      """SELECT pk, ts, sum2_agg(count(v) OVER w) OVER w AS s
        |FROM ev WINDOW w AS (PARTITION BY pk ORDER BY ts
        |  ROWS_RANGE BETWEEN 5s PRECEDING AND CURRENT ROW)""".stripMargin
    def run(): Seq[String] =
      GraftSql.sql(spark, sql, Map("ev" -> ev)).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    val plain = run()
    GraftSql.statement(spark, "SET @@window_skew_opt = 'true'")
    val skewed =
      try run()
      finally GraftSql.statement(spark, "SET @@window_skew_opt = 'false'")
    val diffs = plain.zip(skewed).filter { case (a, b) => a != b }
    println(s"[repro] total=${plain.size} diverging=${diffs.size}")
    diffs.take(5).foreach { case (a, b) => println(s"[repro] plain=$a skew=$b") }
    assert(diffs.isEmpty, s"${diffs.size} rows diverged")
  }
}
