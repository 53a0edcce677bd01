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

  test("error strings with quotes/backslashes/newlines stay parseable") {
    val vals = Seq("q_ok" -> 0.5)
    val errs = Seq(
      "q_bad" -> "path \"C:\\tmp\" not found\nline2 \u0001ctl")
    val json = Bench.emitJson(vals, vals, vals, errs, "/tmp/sf")
    val df = parse(json)
    val err = df.select("errors.q_bad").collect().head.getString(0)
    assert(err == "path \"C:\\tmp\" not found\nline2 \u0001ctl")
  }

  test("full-size JSON line fits the harness's ~2000-char output tail") {
    // Synthesize the worst case: every bench query present in all three
    // maps with a 3-decimal timing. sbt appends a ~80-char [success] line
    // after ours, so the line itself must stay under ~1900 chars or the
    // harness's tail truncates the front and the JSON never parses (the
    // parsed=null failure mode of every round through r13).
    val names = SparkEntry.benchQueries
    val vals = names.map(n => n -> 1234.5678)
    val json = Bench.emitJson(vals, vals, vals, Seq.empty, "/root/testdata/sf0.1")
    assert(json.length < 1900, s"bench JSON line too long: ${json.length}")
    assert(!json.contains("\n"))
    val df = parse(json)
    assert(df.select("queries.*").columns.length == names.size)
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
