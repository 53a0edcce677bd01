package graft

/** The bench must ALWAYS emit its one-line JSON — a missing/broken table
  * degrades to an "errors" entry instead of aborting the JVM with no
  * output (the BENCH_r10/r11 failure mode: one bad view registration
  * produced rc=1 and parsed=null, losing every timing). */
class BenchGuardSpec extends SparkSpec {

  private def parse(json: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(json).toDS)
  }

  test("bench emits parseable JSON even when every table dir is broken") {
    val broken = "/tmp/graft_bench_guard_nonexistent_dir"
    val (json, failed) = Bench.run(spark, broken, broken, Seq("q1_agg"))
    assert(failed > 0)
    val df = parse(json)
    assert(df.columns.contains("metric"))
    assert(df.columns.contains("errors"))
    val errCols = df.select("errors.*").columns
    // the baseline view registration failure is recorded, not fatal
    assert(errCols.contains("register_views"))
    assert(errCols.contains("q1_agg"))
  }

  test("bench emits JSON with timings on a good dir") {
    val good = "/root/testdata/sf0.001"
    val (json, failed) = Bench.run(spark, good, good, Seq("q1_agg"))
    assert(failed == 0, s"unexpected failures: $json")
    val df = parse(json)
    val row = df.select("queries.q1_agg", "ratio.q1_agg").head
    assert(row.getDouble(0) > 0.0)
    assert(row.getDouble(1) > 0.0)
  }
}
