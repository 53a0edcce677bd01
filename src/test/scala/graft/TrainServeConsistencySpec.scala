package graft

import org.apache.spark.sql.types.TimestampType
import graft.cases.{CaseLoader, SqlCase}
import graft.sql.{GraftSql, StreamDeploy}

/** The reference runs every SqlCase through batch AND request modes
  * and requires identical results — its train/serve consistency
  * authority (`hybridse/src/testing/engine_test_base.h:75-100`,
  * `EngineTest : TestWithParam<SqlCase>` instantiated per mode). This
  * spec re-expresses that over this engine's two run modes: batch =
  * [[GraftSql.sql]]; serving = [[StreamDeploy.serve]], which replays
  * the table insert-by-insert and answers each row point-in-time from
  * per-key state — exactly the reference's request engine discipline.
  *
  * Cases whose shape the deploy compiler legitimately rejects (WINDOW
  * UNION, INSTANCE_NOT_IN_WINDOW, DESC order, multiple window
  * signatures, non-streamable aggregates) cancel with the compiler's
  * own message, so the skip set is visible; the suite additionally
  * asserts a healthy floor of genuinely-compared cases per file.
  */
class TrainServeConsistencySpec extends SparkSpec {

  private val base = "/root/reference/cases"

  override def beforeAll(): Unit = {
    super.beforeAll()
    // the reference harness registers `inc` as an external UDF
    // (udaf_query.yaml id 4)
    spark.udf.register("inc", (x: Int) => x + 1)
  }

  private val files = Seq(
    ("function/window/test_window_row.yaml", "ts_window_row", 10),
    ("function/window/test_window_row_range.yaml", "ts_window_rr", 10),
    ("function/window/test_window.yaml", "ts_window", 5),
    // the cluster files are mostly multi-table — few single-input cases
    ("function/cluster/test_window_row.yaml", "ts_cl_row", 1),
    ("function/cluster/test_window_row_range.yaml", "ts_cl_rr", 1),
    ("query/window_query.yaml", "ts_window_q", 3),
    ("function/window/test_maxsize.yaml", "ts_maxsize", 5),
    ("function/window/test_current_row.yaml", "ts_excl_cr", 3),
    ("function/window/test_window_exclude_current_time.yaml",
      "ts_excl_ct", 3),
    ("function/window/window_attributes.yaml", "ts_win_attr", 3),
    ("function/function/test_udaf_function.yaml", "ts_udaf", 20),
    ("query/udaf_query.yaml", "ts_udaf_q", 3))

  private def eligible(c: SqlCase): Boolean =
    c.sql.trim.nonEmpty && c.sqls.isEmpty && c.parameters.isEmpty &&
      c.batchRequest.isEmpty && c.longWindow.isEmpty &&
      c.expect.success && c.expect.rows.isDefined &&
      c.inputs.length == 1 && c.inputs.head.columns.nonEmpty &&
      c.inputs.head.create.isEmpty &&
      !c.tags.exists(t => t.contains("TODO") || t.contains("bug")) &&
      !c.mode.contains("batch-unsupport") &&
      !c.mode.contains("request-unsupport") &&
      c.inputs.head.columns.forall(cd =>
        CaseData.typOpt(CaseData.declParts(cd).last).isDefined)

  private val compared = scala.collection.mutable.Map[String, Int]()

  files.foreach { case (path, tag, floor) =>
    val cases = CaseLoader.load(s"$base/$path", tag).filter(eligible)
    cases.foreach { c =>
      test(s"serve≡batch ${c.key} ${c.desc.trim}") {
        val tn = c.inputs.head.name.getOrElse("t0")
        val sql = c.sql.trim.stripSuffix(";").replace("{0}", tn)
        val df = CaseData.buildDf(spark, c.inputs.head)
        df.createOrReplaceTempView(tn)
        try {
          val batch = GraftSql.sql(spark, sql)
          val served =
            try StreamDeploy.serve(spark, sql, df.alias(tn))
            catch {
              case e: IllegalArgumentException =>
                cancel(s"deploy compiler rejects the shape: ${e.getMessage}")
            }
          def canon(d: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
            d.collect().toSeq.map(_.toSeq.map {
              case null => "null"
              case t: java.sql.Timestamp => t.getTime.toString
              case d0: Double => f"$d0%.6f"
              case f: Float => f"$f%.4f"
              case x => String.valueOf(x)
            }).sortBy(_.mkString("|"))
          assert(batch.columns.toSeq == served.columns.toSeq,
            s"columns: batch ${batch.columns.toSeq} vs serve ${served.columns.toSeq}")
          val b = canon(batch); val s2 = canon(served)
          assert(b == s2,
            s"\nsql: $sql\nbatch: ${b.take(8).mkString("\n       ")}\n" +
              s"serve: ${s2.take(8).mkString("\n       ")}")
          compared(tag) = compared.getOrElse(tag, 0) + 1
        } finally spark.catalog.dropTempView(tn)
      }
    }
    test(s"serve≡batch $tag compared at least $floor cases") {
      assert(compared.getOrElse(tag, 0) >= floor,
        s"only ${compared.getOrElse(tag, 0)} of ${cases.length} eligible " +
          "cases actually compared — the consistency net has gone vacuous")
    }
  }

  // ---- JOIN / WINDOW UNION shapes: multi-input cases where input {0}
  // is the served stream and inputs {1..} are static side tables (LAST
  // JOIN dims, WINDOW UNION history). The reference runs these same
  // cases through its request engine (engine_test_base.h request_mode;
  // cases/query/last_join_window_query.yaml,
  // function/window/test_window_union.yaml). ----

  private val filesMulti = Seq(
    ("query/last_join_window_query.yaml", "tsm_lj_window", 4),
    ("query/last_join_query.yaml", "tsm_lj", 14),
    ("function/join/test_lastjoin_simple.yaml", "tsm_lj_simple", 25),
    ("function/window/test_window_union.yaml", "tsm_win_union", 28))

  private def eligibleMulti(c: SqlCase): Boolean =
    c.sql.trim.nonEmpty && c.sqls.isEmpty && c.parameters.isEmpty &&
      c.batchRequest.isEmpty && c.longWindow.isEmpty &&
      c.expect.success && c.expect.rows.isDefined &&
      c.inputs.nonEmpty && c.inputs.forall(_.columns.nonEmpty) &&
      c.inputs.forall(_.create.isEmpty) &&
      !c.tags.exists(t => t.contains("TODO") || t.contains("bug")) &&
      !c.mode.contains("batch-unsupport") &&
      !c.mode.contains("request-unsupport") &&
      // a JOIN inside a FROM-subquery would need the subquery itself to
      // be the served stream — outside the serve() contract, whose
      // `events` IS the FROM table (deployments join at the top level)
      !c.sql.toLowerCase.replaceAll("\\s+", " ")
        .matches("(?s).*from\\s*\\(.*join.*") &&
      c.inputs.forall(_.columns.forall(cd =>
        CaseData.typOpt(CaseData.declParts(cd).last).isDefined))

  filesMulti.foreach { case (path, tag, floor) =>
    val cases = CaseLoader.load(s"$base/$path", tag).filter(eligibleMulti)
    cases.foreach { c =>
      test(s"serve≡batch ${c.key} ${c.desc.trim}") {
        val names = c.inputs.zipWithIndex.map { case (in, i) =>
          in.name.getOrElse(s"t$i") }
        val sql = names.zipWithIndex.foldLeft(
          c.sql.trim.stripSuffix(";")) { case (s, (n, i)) =>
          s.replace(s"{$i}", n) }
        val dfs = c.inputs.map(in => CaseData.buildDf(spark, in))
        names.zip(dfs).foreach { case (n, df) =>
          df.createOrReplaceTempView(n) }
        try {
          val batch = GraftSql.sql(spark, sql)
          val served =
            try StreamDeploy.serve(spark, sql, dfs.head.alias(names.head))
            catch {
              case e: IllegalArgumentException =>
                cancel(s"deploy compiler rejects the shape: ${e.getMessage}")
            }
          def canon(d: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
            d.collect().toSeq.map(_.toSeq.map {
              case null => "null"
              case t: java.sql.Timestamp => t.getTime.toString
              case d0: Double => f"$d0%.6f"
              case f: Float => f"$f%.4f"
              case x => String.valueOf(x)
            }).sortBy(_.mkString("|"))
          assert(batch.columns.toSeq == served.columns.toSeq,
            s"columns: batch ${batch.columns.toSeq} vs serve ${served.columns.toSeq}")
          val b = canon(batch); val s2 = canon(served)
          assert(b == s2,
            s"\nsql: $sql\nbatch: ${b.take(8).mkString("\n       ")}\n" +
              s"serve: ${s2.take(8).mkString("\n       ")}")
          compared(tag) = compared.getOrElse(tag, 0) + 1
        } finally names.foreach(spark.catalog.dropTempView)
      }
    }
    test(s"serve≡batch $tag compared at least $floor cases") {
      assert(compared.getOrElse(tag, 0) >= floor,
        s"only ${compared.getOrElse(tag, 0)} of ${cases.length} eligible " +
          "cases actually compared — the consistency net has gone vacuous")
    }
  }

  // ---- DEPLOY OPTIONS(long_windows=...): the pre-agg MV serving path
  // (long_window_optimized.h:29-50, src/storage/aggregator.cc) must
  // agree row-for-row with the batch plan, AND must actually answer
  // from the state-held partials, not full-frame scans. ----

  test("serve≡batch long_windows deployment answers from the MV partials") {
    import spark.implicits._
    val n = 1500
    val evs = for (k <- Seq("a", "b", "c"); i <- 0 until n)
      yield (k, i.toLong * 5 + (if (k == "b") 2 else 0),
        (i % 17).toLong, (i % 13) * 0.25)
    val df = evs.toDF("key", "ts", "qty", "amt")
    df.createOrReplaceTempView("lw_t")
    val sql = """SELECT key, ts, sum(qty) OVER w1 AS s, count(amt) OVER w1 AS c,
      avg(amt) OVER w1 AS a, min(amt) OVER w1 AS mn, max(qty) OVER w1 AS mx
      FROM lw_t
      WINDOW w1 AS (PARTITION BY key ORDER BY ts
        ROWS_RANGE BETWEEN 4000 PRECEDING AND CURRENT ROW)"""
    GraftSql.resetDeployments(spark)
    GraftSql.statement(spark,
      s"""DEPLOY lw_dep OPTIONS(long_windows="w1:1s") $sql""")
    StreamDeploy.LwMetrics.reset()
    val batch = GraftSql.sql(spark, sql)
    val served = StreamDeploy.serveDeployment(spark, "lw_dep", df.alias("lw_t"))
    def canon(d: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      d.collect().toSeq.map(_.toSeq.map {
        case null => "null"
        case d0: Double => f"$d0%.6f"
        case x => String.valueOf(x)
      }).sortBy(_.mkString("|"))
    assert(canon(batch) == canon(served))
    val m = StreamDeploy.LwMetrics
    // every request (3 keys × n rows) answered via the pre-agg path …
    assert(m.preAggRequests.sum == 3L * n * 5,
      s"preAggRequests=${m.preAggRequests.sum}")
    // … with ZERO full-frame raw evaluations anywhere in the run
    assert(m.rawRowsScanned.sum == 0L,
      s"rawRowsScanned=${m.rawRowsScanned.sum}")
    // edge scans (head+tail buckets) stay well under frame size: the
    // 4000ms frame holds ~800 rows; the two 1s edge buckets ≤ ~400.
    // Demonstrate the same deployment WITHOUT the option scans far more.
    StreamDeploy.LwMetrics.reset()
    val plain = StreamDeploy.serve(spark, sql, df.alias("lw_t"))
    assert(canon(plain) == canon(batch))
    val raw = m.rawRowsScanned.sum
    StreamDeploy.LwMetrics.reset()
    StreamDeploy.serveDeployment(spark, "lw_dep", df.alias("lw_t"))
      .collect()
    assert(m.preAggRowsScanned.sum * 2 < raw,
      s"preAgg=${m.preAggRowsScanned.sum} vs raw=$raw — the MV path " +
        "is not reducing per-request scan volume")
    GraftSql.resetDeployments(spark)
  }

  test("serve≡batch row-bucket long_windows deployment (kRowsNum)") {
    // DEPLOY OPTIONS(long_windows="w1:100"): a bare-integer bucket is
    // the reference's row-count pre-agg (aggregator.cc:1249-1251) —
    // ROWS frames answer from arrival-ordinal partials
    import spark.implicits._
    val n = 1500
    val evs = for (k <- Seq("a", "b", "c"); i <- 0 until n)
      yield (k, i.toLong * 5 + (if (k == "b") 2 else 0),
        (i % 17).toLong, (i % 13) * 0.25)
    val df = evs.toDF("key", "ts", "qty", "amt")
    df.createOrReplaceTempView("lwr_t")
    val sql = """SELECT key, ts, sum(qty) OVER w1 AS s, count(amt) OVER w1 AS c,
      avg(amt) OVER w1 AS a, min(amt) OVER w1 AS mn, max(qty) OVER w1 AS mx
      FROM lwr_t
      WINDOW w1 AS (PARTITION BY key ORDER BY ts
        ROWS BETWEEN 799 PRECEDING AND CURRENT ROW)"""
    GraftSql.resetDeployments(spark)
    GraftSql.statement(spark,
      s"""DEPLOY lwr_dep OPTIONS(long_windows="w1:100") $sql""")
    StreamDeploy.LwMetrics.reset()
    val batch = GraftSql.sql(spark, sql)
    val served = StreamDeploy.serveDeployment(spark, "lwr_dep",
      df.alias("lwr_t"))
    def canon(d: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      d.collect().toSeq.map(_.toSeq.map {
        case null => "null"
        case d0: Double => f"$d0%.6f"
        case x => String.valueOf(x)
      }).sortBy(_.mkString("|"))
    assert(canon(batch) == canon(served))
    val m = StreamDeploy.LwMetrics
    // every request (3 keys × n rows × 5 outputs) via the pre-agg path
    assert(m.preAggRequests.sum == 3L * n * 5,
      s"preAggRequests=${m.preAggRequests.sum}")
    assert(m.rawRowsScanned.sum == 0L,
      s"rawRowsScanned=${m.rawRowsScanned.sum}")
    // 800-row frames, 100-row buckets: edge scans < 200 rows/request
    assert(m.preAggRowsScanned.sum < m.preAggRequests.sum * 200,
      s"edge scan volume too high: ${m.preAggRowsScanned.sum}")
    GraftSql.resetDeployments(spark)
  }
}
