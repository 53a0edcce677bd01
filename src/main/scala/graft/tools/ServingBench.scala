package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.serving.ApiServer
import graft.sql.GraftSql

/** Per-request latency/throughput of the ONLINE serving path — the
  * counterpart of the reference's headline metric ("a few milliseconds
  * per request", README.md:60; JMH SampleTime in microseconds, 10
  * threads, benchmark/.../OpenMLDBPerfBenchmark.java:31-37) on this
  * engine's substrate.
  *
  * Query shape = the reference benchmark generator's
  * (benchmark/.../Util.java:71-110 genScript, BenchmarkConfig defaults
  * WINDOW_NUM=2 / WINDOW_SIZE=1000 / JOIN_NUM=2): scalar exprs + 2
  * windows x {distinct_count, sum, count, avg, 2x case-when-count}
  * over ROWS_RANGE 30d PRECEDING MAXSIZE 1000, plus 2 LAST JOINs to
  * dimension tables, DEPLOYed and served per request. Both windows
  * partition on HIGH-CARDINALITY keys (user_id / user_id+event_type),
  * matching the reference's col_s0/col_s1 indexed keys — a
  * few-distinct-values partition key (plain event_type) turns a
  * sliding RANGE frame with collecting aggregates into
  * O(partition x frame) work per window evaluation, the mega-partition
  * shape the skew/long-window rewrites exist for, not the serving
  * benchmark's.
  *
  * Two surfaces are timed, both answering from the same requestMode
  * plan (ApiServerSpec pins REST == CALL row-for-row):
  *  - `embedded`: in-process request -> DataFrame -> collect (the
  *    reference's SDK CallProcedure analog)
  *  - `http`: POST /dbs/default/deployments/{name} through ApiServer
  *    (the reference's apiserver analog), at several client
  *    concurrency levels (the reference JMH runs 10 threads)
  *
  * Substrate note (why these numbers are ms-to-sub-second, not the
  * reference's microseconds): the reference executes a request inside
  * one tablet thread over in-memory skiplist indexes — no scheduler.
  * Here every request is a Spark local[32] job: ~10 ms of DAG/task
  * scheduling floor, plus a scan of the key's history partition
  * (no per-key index; the online view is a cached columnar snapshot).
  * That is the honest cost of serving from a general dataflow engine;
  * the p50/p99 below document it rather than hide it. Concurrency
  * amortizes the scheduler: RPS at c=10 is the comparable figure.
  *
  * Usage: ServingBench [sfDir] [outPath] — writes one JSON object and
  * prints it. */
object ServingBench {

  private val DeploySql =
    """DEPLOY sb_perf OPTIONS(overwrite=true)
      |SELECT event_id, user_id,
      |  upper(event_type) AS et_up,
      |  substr(event_type, 2) AS et_sub,
      |  value * 2 AS v2,
      |  c_nationkey, c_acctbal, s_nationkey,
      |  distinct_count(event_type) OVER w0 AS dc_w0,
      |  sum(value) OVER w0 AS sum_w0,
      |  count(event_type) OVER w0 AS cnt_w0,
      |  avg(value) OVER w0 AS avg_w0,
      |  case when !isnull(at(event_type, 0)) OVER w0 then count(event_type) OVER w0 else null end AS cw0_s,
      |  case when !isnull(at(value, 0)) OVER w0 then count(value) OVER w0 else null end AS cw0_v,
      |  distinct_count(event_type) OVER w1 AS dc_w1,
      |  sum(value) OVER w1 AS sum_w1,
      |  count(event_type) OVER w1 AS cnt_w1,
      |  avg(value) OVER w1 AS avg_w1,
      |  case when !isnull(at(event_type, 0)) OVER w1 then count(event_type) OVER w1 else null end AS cw1_s,
      |  case when !isnull(at(value, 0)) OVER w1 then count(value) OVER w1 else null end AS cw1_v
      |FROM sb_events
      |LAST JOIN sb_cust ON user_id = c_custkey
      |LAST JOIN sb_supp ON user_id = s_suppkey
      |WINDOW w0 AS (PARTITION BY user_id ORDER BY ts_ms
      |    ROWS_RANGE BETWEEN 30d PRECEDING AND CURRENT ROW MAXSIZE 1000),
      |  w1 AS (PARTITION BY user_id, event_type ORDER BY ts_ms
      |    ROWS_RANGE BETWEEN 30d PRECEDING AND CURRENT ROW MAXSIZE 1000)""".stripMargin

  final case class Stats(n: Int, p50Ms: Double, p95Ms: Double, p99Ms: Double,
      meanMs: Double, rps: Double)

  private def stats(latsNs: Seq[Long], wallNs: Long): Stats = {
    val s = latsNs.sorted
    def pct(p: Double) = s(math.min(s.length - 1, (p * s.length).toInt)) / 1e6
    Stats(s.length, pct(0.50), pct(0.95), pct(0.99),
      s.map(_ / 1e6).sum / s.length, s.length / (wallNs / 1e9))
  }

  /** Run `total` requests across `threads` workers; returns latencies. */
  private def drive(threads: Int, total: Int)(req: Int => Unit): Stats = {
    val pool = Executors.newFixedThreadPool(threads)
    val lats = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val latch = new CountDownLatch(total)
    val t0 = System.nanoTime()
    (0 until total).foreach { i =>
      pool.execute { () =>
        val r0 = System.nanoTime()
        try req(i) finally {
          lats.add(System.nanoTime() - r0); latch.countDown()
        }
      }
    }
    latch.await(30, TimeUnit.MINUTES)
    val wall = System.nanoTime() - t0
    pool.shutdownNow()
    import scala.jdk.CollectionConverters._
    stats(lats.asScala.map(_.longValue()).toSeq, wall)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = if (args.length > 1) args(1) else "SERVING_BENCH.json"
    val spark = GraftSession.builder().getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")

    // online history: the serving tier is memory-resident by contract —
    // cache the views (the reference's tablet holds them in skiplists)
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts_ms"))
      .cache()
    val nHist = ev.count()
    ev.createOrReplaceTempView("sb_events")
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")).cache()
    cust.count(); cust.createOrReplaceTempView("sb_cust")
    val supp = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).cache()
    supp.count(); supp.createOrReplaceTempView("sb_supp")

    GraftSql.statement(spark, DeploySql)
    val bodySql = GraftSql.callableBody(spark, "sb_perf").get
    val reqSchema = spark.table("sb_events").schema

    // request corpus: real history rows (key exists, frame non-empty),
    // ts bumped past the stored max so each request is "now"
    val maxTs = ev.agg(max(col("ts_ms"))).head.getLong(0)
    val reqRows: Array[Row] = ev.orderBy(col("event_id"))
      .limit(512).collect()
      .map(r => Row(r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3), maxTs + 1000L))

    def oneRequestDf(i: Int): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(reqRows(i % reqRows.length)), reqSchema)

    def embeddedCall(i: Int): Unit = {
      val n = GraftSql.serveRequest(spark, bodySql, oneRequestDf(i)).collect().length
      require(n == 1, s"expected 1 row, got $n")
    }

    val srv = ApiServer.start(spark, threads = 16)
    val client = HttpClient.newHttpClient()
    val url = URI.create(
      s"http://127.0.0.1:${srv.port}/dbs/default/deployments/sb_perf")
    def httpCall(i: Int): Unit = {
      val r = reqRows(i % reqRows.length)
      val body = s"""{"input": [[${r.getLong(0)}, ${r.getLong(1)}, """ +
        s""""${r.getString(2)}", ${r.getDouble(3)}, ${r.getLong(4)}]]}"""
      val resp = client.send(HttpRequest.newBuilder(url)
          .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
          .build(), HttpResponse.BodyHandlers.ofString())
      require(resp.body().contains("\"code\":0"), resp.body().take(200))
    }

    // warmup: plan caches + C2 JIT of the interpreted per-request eval
    // path on both surfaces (the reference's JMH harness warms the
    // same way — SampleTime iterations discard warmup; 8 calls left
    // the c1 sweep measuring JIT ramp, not the serving path)
    (0 until 96).foreach(embeddedCall)
    (0 until 48).foreach(httpCall)

    val levels = Seq(1, 4, 10)
    def sweep(f: Int => Unit): Map[Int, Stats] =
      levels.map { c => c -> drive(c, math.max(40, c * 30))(f) }.toMap

    val emb = sweep(embeddedCall)
    val http = sweep(httpCall)
    srv.stop()

    def fmt(m: Map[Int, Stats]): String = m.toSeq.sortBy(_._1).map {
      case (c, s) =>
        f""""c$c":{"n":${s.n},"p50_ms":${s.p50Ms}%.1f,"p95_ms":${s.p95Ms}%.1f,""" +
          f""""p99_ms":${s.p99Ms}%.1f,"mean_ms":${s.meanMs}%.1f,"rps":${s.rps}%.1f}"""
    }.mkString(",")

    val json =
      s"""{"bench":"serving","sf_dir":"$sfDir","history_rows":$nHist,""" +
        s""""shape":"2 windows x {distinct_count,sum,count,avg,2x case-when-count} ROWS_RANGE 30d MAXSIZE 1000 + 2 LAST JOINs (reference Util.genScript defaults)",""" +
        s""""embedded":{${fmt(emb)}},"http":{${fmt(http)}},""" +
        s""""reference_note":"reference README.md:60 reports few-ms request latency on its native tablet (JMH SampleTime us, 10 threads); this engine pays a Spark job-scheduling floor per request — see ServingBench scaladoc"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
