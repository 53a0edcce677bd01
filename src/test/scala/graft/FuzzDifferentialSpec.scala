package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sql.GraftSql

/** Grammar-driven differential fuzzing (VERDICT r15 item 7): a seeded
  * generator emits random dialect SQL over a fixture derived from the
  * sf0.01 events table and diffs the engine against an independent
  * twin —
  *
  *  - standard-overlap cases run the SAME text through `spark.sql`
  *    (two front-ends, one semantics);
  *  - dialect window extensions (ROWS_RANGE, OPEN PRECEDING, EXCLUDE
  *    CURRENT_ROW, MAXSIZE) get a mechanically derived Spark-SQL twin
  *    (frame translation / subtraction / HOF slice);
  *  - LAST JOIN (equi, as-of, general condition) diffs against the
  *    row_number-pick formulation.
  *
  * Order keys are unique (event_id) so ROWS frames are deterministic
  * on both sides. Doubles compare with relative tolerance — the
  * fixture's 2-decimal values make exact sums land on rounding
  * boundaries (the hash-compare trap the oracle gate avoids the same
  * way). Every case failure prints the seed, case index and both SQL
  * texts for replay. */
class FuzzDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val Seed = 20260816L
  private val Dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val ev = Tables.load(GraftSession.tune(spark), Dir, "events")
    ev.filter(col("event_id") % 4 === 0)
      .select(col("event_id").as("id"),
        (col("user_id") % 7).as("k1"),
        col("event_type").as("k2"),
        col("user_id").as("n"),
        col("value").as("v"),
        (col("event_id") % 2).as("par"))
      .localCheckpoint(true)
      .createOrReplaceTempView("fz")
    // union-side twin of fz: disjoint id space (mod class 2 vs 0) so
    // ORDER BY id never ties across tables; uts (id/64) is a coarse
    // key with REAL ties for the EXCLUDE CURRENT_TIME productions
    ev.filter(col("event_id") % 4 === 2)
      .select(col("event_id").as("id"),
        (col("user_id") % 7).as("k1"),
        col("event_type").as("k2"),
        col("user_id").as("n"),
        col("value").as("v"),
        (col("event_id") % 2).as("par"))
      .localCheckpoint(true)
      .createOrReplaceTempView("fzu")
    ev.filter(col("event_id") % 4 === 1)
      .select(col("event_id").as("id"),
        (col("user_id") % 37).as("k"),
        col("event_id").as("uts"),
        col("value").as("w"))
      .localCheckpoint(true)
      .createOrReplaceTempView("fzl")
    ev.filter(col("event_id") % 10 === 3)
      .select((col("user_id") % 37).as("k"),
        col("event_id").as("uts"),
        col("value").as("v"))
      .localCheckpoint(true)
      .createOrReplaceTempView("fzr")
  }

  /** key-prefixed rows compared field-wise; doubles with rel tolerance */
  private def diff(ours: DataFrame, twin: DataFrame, nKeys: Int,
      label: String): Option[String] = {
    def keyed(df: DataFrame): Map[String, Seq[Any]] =
      df.collect().toSeq.map { r =>
        val s = r.toSeq
        s.take(nKeys).map(x => if (x == null) "∅" else x.toString)
          .mkString("|") -> s
      }.toMap
    val a = keyed(ours); val b = keyed(twin)
    if (a.keySet != b.keySet)
      return Some(s"$label: key sets differ " +
        s"(onlyOurs=${(a.keySet -- b.keySet).take(3)}, " +
        s"onlyTwin=${(b.keySet -- a.keySet).take(3)}, " +
        s"sizes ${a.size}/${b.size})")
    def eq(x: Any, y: Any): Boolean = (x, y) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (d1: Double, d2: Double) =>
        (d1.isNaN && d2.isNaN) ||
          math.abs(d1 - d2) <= 1e-6 * math.max(1.0,
            math.max(math.abs(d1), math.abs(d2)))
      case (d1: Double, d2: Number) => eq(d1, d2.doubleValue())
      case (d1: Number, d2: Double) => eq(d1.doubleValue(), d2)
      case (x1, y1) => x1 == y1
    }
    a.keysIterator.flatMap { k =>
      val (ra, rb) = (a(k), b(k))
      if (ra.length != rb.length)
        Some(s"$label: row width differs at key $k: $ra vs $rb")
      else if (!ra.lazyZip(rb).forall(eq))
        Some(s"$label: key $k: ours=$ra twin=$rb")
      else None
    }.take(1).toSeq.headOption
  }

  private def pick[T](r: scala.util.Random, xs: Seq[T]): T =
    xs(r.nextInt(xs.length))

  test("the differ itself detects mismatches (harness self-check)") {
    assert(diff(spark.sql("SELECT 1 AS k, 1.0 AS v"),
      spark.sql("SELECT 1 AS k, 2.0 AS v"), 1, "x").isDefined)
    assert(diff(spark.sql("SELECT 1 AS k, 1.0 AS v"),
      spark.sql("SELECT 2 AS k, 1.0 AS v"), 1, "x").isDefined)
    assert(diff(spark.sql("SELECT 1 AS k, CAST(NULL AS DOUBLE) AS v"),
      spark.sql("SELECT 1 AS k, 0.0 AS v"), 1, "x").isDefined)
    // bare 1.0000000001 would be a DECIMAL literal — cast to the
    // double the tolerance path handles
    assert(diff(spark.sql("SELECT 1 AS k, CAST(1.0000000001 AS DOUBLE) AS v"),
      spark.sql("SELECT 1 AS k, CAST(1.0 AS DOUBLE) AS v"), 1, "x").isEmpty)
  }

  test("standard-overlap fuzz: 80 GROUP BY/HAVING cases agree with spark.sql") {
    val r = new scala.util.Random(Seed)
    val aggPool = Seq("sum(v)", "min(v)", "max(v)", "avg(v)", "count(v)",
      "count(*)", "sum(n)", "min(id)")
    val keyPool = Seq(Seq("k1"), Seq("k2"), Seq("k1", "k2"),
      Seq("par", "k2"), Seq("par", "k1"))
    (0 until 80).foreach { i =>
      val gkeys = pick(r, keyPool)
      val nAgg = 1 + r.nextInt(3)
      val aggs = (0 until nAgg).map(j => s"${pick(r, aggPool)} AS a$j")
      val where = pick(r, Seq("",
        s"WHERE v > ${r.nextInt(400)}",
        s"WHERE v <= ${50 + r.nextInt(400)} AND k1 <> ${r.nextInt(7)}",
        s"WHERE par = ${r.nextInt(2)}"))
      val having = pick(r, Seq("", s"HAVING count(*) > ${r.nextInt(40)}"))
      val sql = s"SELECT ${gkeys.mkString(", ")}, ${aggs.mkString(", ")} " +
        s"FROM fz $where GROUP BY ${gkeys.mkString(", ")} $having"
      diff(GraftSql.sql(spark, sql), spark.sql(sql), gkeys.length,
          s"seed=$Seed case=$i sql=[$sql]")
        .foreach(msg => fail(msg))
    }
  }

  test("window fuzz: 90 frame/attribute cases agree with a Spark twin") {
    val r = new scala.util.Random(Seed + 1)
    (0 until 90).foreach { i =>
      val pk = pick(r, Seq("k1", "k2", "par"))
      val n = 2 + r.nextInt(60)
      val kind = i % 5
      val (agg, frameD, exprT) = kind match {
        case 0 => // plain ROWS — identical text semantics
          val a = pick(r, Seq("sum", "count", "min", "max", "avg"))
          (a, s"ROWS BETWEEN $n PRECEDING AND CURRENT ROW",
            s"$a(v) OVER (PARTITION BY $pk ORDER BY id " +
              s"ROWS BETWEEN $n PRECEDING AND CURRENT ROW)")
        case 1 => // ROWS_RANGE == standard RANGE over the bigint key
          val a = pick(r, Seq("sum", "count", "min", "max", "avg"))
          (a, s"ROWS_RANGE BETWEEN $n PRECEDING AND CURRENT ROW",
            s"$a(v) OVER (PARTITION BY $pk ORDER BY id " +
              s"RANGE BETWEEN $n PRECEDING AND CURRENT ROW)")
        case 2 => // OPEN PRECEDING end bound: strictly before row -m
          val a = pick(r, Seq("sum", "count", "min", "max"))
          val m = 1 + r.nextInt(n - 1)
          (a, s"ROWS BETWEEN $n PRECEDING AND $m OPEN PRECEDING",
            s"$a(v) OVER (PARTITION BY $pk ORDER BY id " +
              s"ROWS BETWEEN $n PRECEDING AND ${m + 1} PRECEDING)")
        case 3 => // EXCLUDE CURRENT_ROW: subtract the current row's part
          val a = pick(r, Seq("sum", "count"))
          val fr = s"(PARTITION BY $pk ORDER BY id " +
            s"RANGE BETWEEN $n PRECEDING AND CURRENT ROW)"
          val t =
            if (a == "sum")
              s"CASE WHEN count(v) OVER $fr > 1 " +
                s"THEN sum(v) OVER $fr - v END"
            else s"count(v) OVER $fr - 1"
          (a, s"ROWS_RANGE BETWEEN $n PRECEDING AND CURRENT ROW " +
            "EXCLUDE CURRENT_ROW", t)
        case _ => // MAXSIZE m: newest m rows of the range frame
          val a = pick(r, Seq("sum", "count"))
          val m = 1 + r.nextInt(8)
          val fr = s"(PARTITION BY $pk ORDER BY id " +
            s"RANGE BETWEEN $n PRECEDING AND CURRENT ROW)"
          val t =
            if (a == "count") s"least(count(v) OVER $fr, $m)"
            else "aggregate(slice(reverse(array_sort(" +
              s"collect_list(named_struct('i', id, 'x', v)) OVER $fr)), " +
              s"1, $m), CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.x)"
          (a, s"ROWS_RANGE BETWEEN $n PRECEDING AND CURRENT ROW " +
            s"MAXSIZE $m", t)
      }
      val ours = s"SELECT id, $agg(v) OVER w AS x FROM fz " +
        s"WINDOW w AS (PARTITION BY $pk ORDER BY id $frameD)"
      val twin = s"SELECT id, $exprT AS x FROM fz"
      diff(GraftSql.sql(spark, ours), spark.sql(twin), 1,
          s"seed=${Seed + 1} case=$i ours=[$ours] twin=[$twin]")
        .foreach(msg => fail(msg))
    }
  }

  test("window-union/attribute-combo fuzz: 60 cases agree with a Spark twin") {
    val r = new scala.util.Random(Seed + 3)
    (0 until 60).foreach { i =>
      val pk = pick(r, Seq("k1", "par"))
      val n = 4 + r.nextInt(800)
      val (ours, twin, nKeys) = i % 5 match {
        case 0 => // WINDOW UNION: frame over fz ∪ fzu, output fz rows only
          val a = pick(r, Seq("sum", "count", "min", "max"))
          (s"SELECT id, $a(v) OVER w AS x FROM fz WINDOW w AS " +
             s"(UNION fzu PARTITION BY $pk ORDER BY id " +
             s"ROWS_RANGE BETWEEN $n PRECEDING AND CURRENT ROW)",
           s"SELECT id, x FROM (SELECT id, m, $a(v) OVER " +
             s"(PARTITION BY $pk ORDER BY id RANGE BETWEEN $n PRECEDING " +
             "AND CURRENT ROW) AS x FROM (" +
             s"SELECT id, $pk, v, 1 AS m FROM fz UNION ALL " +
             s"SELECT id, $pk, v, 0 AS m FROM fzu) u) t WHERE m = 1",
           1)
        case 1 => // UNION + INSTANCE_NOT_IN_WINDOW: union rows + self only
          val a = pick(r, Seq("sum", "count", "min"))
          val fr = s"(PARTITION BY $pk ORDER BY id RANGE BETWEEN " +
            s"$n PRECEDING AND CURRENT ROW)"
          val tx = a match {
            case "sum" =>
              s"v + coalesce(sum(CASE WHEN m = 0 THEN v END) OVER $fr, " +
                "CAST(0.0 AS DOUBLE))"
            case "count" =>
              s"count(CASE WHEN m = 0 THEN 1 END) OVER $fr + 1"
            case _ =>
              s"least(v, min(CASE WHEN m = 0 THEN v END) OVER $fr)"
          }
          (s"SELECT id, $a(v) OVER w AS x FROM fz WINDOW w AS " +
             s"(UNION fzu PARTITION BY $pk ORDER BY id " +
             s"ROWS_RANGE BETWEEN $n PRECEDING AND CURRENT ROW " +
             "INSTANCE_NOT_IN_WINDOW)",
           s"SELECT id, x FROM (SELECT id, m, $tx AS x FROM (" +
             s"SELECT id, $pk, v, 1 AS m FROM fz UNION ALL " +
             s"SELECT id, $pk, v, 0 AS m FROM fzu) u) t WHERE m = 1",
           1)
        case 2 => // EXCLUDE CURRENT_TIME over the tied uts key: the frame
          // is [cur-n, cur-1] + self whatever the tie handling, so the
          // twin sidesteps strict-vs-ANSI peer semantics entirely
          val a = pick(r, Seq("sum", "count"))
          val tx =
            if (a == "sum")
              s"coalesce(sum(v) OVER (PARTITION BY $pk ORDER BY uts " +
                s"RANGE BETWEEN $n PRECEDING AND 1 PRECEDING), " +
                "CAST(0.0 AS DOUBLE)) + v"
            else
              s"count(v) OVER (PARTITION BY $pk ORDER BY uts " +
                s"RANGE BETWEEN $n PRECEDING AND 1 PRECEDING) + 1"
          (s"SELECT id, $a(v) OVER w AS x FROM " +
             "(SELECT id, k1, par, v, CAST(floor(id / 64) AS BIGINT) " +
             "AS uts FROM fz) fzt WINDOW w AS " +
             s"(PARTITION BY $pk ORDER BY uts ROWS_RANGE BETWEEN " +
             s"$n PRECEDING AND CURRENT ROW EXCLUDE CURRENT_TIME)",
           s"SELECT id, $tx AS x FROM (SELECT id, k1, par, v, " +
             "CAST(floor(id / 64) AS BIGINT) AS uts FROM fz) fzt",
           1)
        case 3 => // MAXSIZE + EXCLUDE CURRENT_ROW: newest msz of [id-n, id-1]
          val a = pick(r, Seq("sum", "count"))
          val msz = 1 + r.nextInt(8)
          val fr2 = s"(PARTITION BY $pk ORDER BY id RANGE BETWEEN " +
            s"$n PRECEDING AND 1 PRECEDING)"
          val tx =
            if (a == "count") s"least(count(v) OVER $fr2, $msz)"
            else s"CASE WHEN count(v) OVER $fr2 > 0 THEN " +
              "aggregate(slice(reverse(array_sort(" +
              s"collect_list(named_struct('i', id, 'x', v)) OVER $fr2)), " +
              s"1, $msz), CAST(0.0 AS DOUBLE), (acc, e) -> acc + e.x) END"
          (s"SELECT id, $a(v) OVER w AS x FROM fz WINDOW w AS " +
             s"(PARTITION BY $pk ORDER BY id ROWS_RANGE BETWEEN " +
             s"$n PRECEDING AND CURRENT ROW MAXSIZE $msz " +
             "EXCLUDE CURRENT_ROW)",
           s"SELECT id, $tx AS x FROM fz", 1)
        case _ => // DESC frame direction: standard overlap, same text
          val a = pick(r, Seq("sum", "count", "min", "max", "avg"))
          val nr = 2 + r.nextInt(40)
          val sql = s"SELECT id, $a(v) OVER (PARTITION BY $pk " +
            s"ORDER BY id DESC ROWS BETWEEN $nr PRECEDING AND " +
            "CURRENT ROW) AS x FROM fz"
          (sql, sql, 1)
      }
      diff(GraftSql.sql(spark, ours), spark.sql(twin), nKeys,
          s"seed=${Seed + 3} case=$i ours=[$ours] twin=[$twin]")
        .foreach(msg => fail(msg))
    }
  }

  test("composition fuzz: 40 CTE→agg→window / multi-window cases " +
      "agree with spark.sql") {
    // standard-overlap productions over the two COMPOSITION paths the
    // flat fuzzers never reach: a grouped CTE feeding a window (the
    // agg↔window pipeline), and several named windows in one SELECT
    // (the dialect plans these as one stitched pass — CONCAT join
    // subsumption; Spark's front end computes them independently)
    // the dialect REQUIRES a window PARTITION BY (WINDOW_CLAUSE.md:125
    // "OpenMLDB requires that PARTITION BY must be configured") — the
    // fuzzer's first run generated a partition-less OVER and the parser
    // correctly refused it; pin that rejection as reference parity
    intercept[IllegalArgumentException] {
      GraftSql.sql(spark, "SELECT id, sum(v) OVER (ORDER BY id " +
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS x FROM fz")
    }
    val r = new scala.util.Random(Seed + 5)
    (0 until 40).foreach { i =>
      val sql = if (i % 2 == 0) {
        val gk = pick(r, Seq("k1", "k2", "par"))
        val a1 = pick(r, Seq("sum(v)", "avg(v)", "max(v)", "count(*)"))
        val n = 1 + r.nextInt(9)
        val wa = pick(r, Seq("sum", "min", "max", "count"))
        // pp: constant partition column — the dialect mandates
        // PARTITION BY and only supports column references there
        s"WITH g AS (SELECT $gk, $a1 AS sv, max(id) AS mid, 0 AS pp " +
          s"FROM fz GROUP BY $gk) " +
          s"SELECT mid, $wa(sv) OVER (PARTITION BY pp ORDER BY mid " +
          s"ROWS BETWEEN $n PRECEDING AND CURRENT ROW) AS x FROM g"
      } else {
        val (p1, p2) = (pick(r, Seq("k1", "k2")), pick(r, Seq("par", "k2")))
        val (n1, n2) = (1 + r.nextInt(40), 1 + r.nextInt(40))
        val (a1, a2) = (pick(r, Seq("sum", "min", "avg")),
          pick(r, Seq("count", "max", "sum")))
        s"SELECT id, $a1(v) OVER w1 AS x1, $a2(v) OVER w2 AS x2 FROM fz " +
          s"WINDOW w1 AS (PARTITION BY $p1 ORDER BY id " +
          s"ROWS BETWEEN $n1 PRECEDING AND CURRENT ROW), " +
          s"w2 AS (PARTITION BY $p2 ORDER BY id " +
          s"ROWS BETWEEN $n2 PRECEDING AND CURRENT ROW)"
      }
      diff(GraftSql.sql(spark, sql), spark.sql(sql), 1,
          s"seed=${Seed + 5} case=$i sql=[$sql]")
        .foreach(msg => fail(msg))
    }
  }

  test("train/serve fuzz: 30 random window queries agree between " +
      "batch and request-mode serving") {
    // the reference's highest-stakes invariant (its EngineTest runs
    // every case through both modes): random dialect windows here run
    // through GraftSql batch AND StreamDeploy.serve's insert-by-insert
    // state replay. The fixture's order key (id) is UNIQUE, so batch
    // RANGE frames equal the server's at-or-before arrival state.
    val ev = Tables.load(GraftSession.tune(spark), Dir, "events")
    val fx = ev.filter(col("event_id") % 16 === 5)
      .select(col("event_id").as("id"),
        (col("user_id") % 5).as("k"),
        col("value").as("v"))
      .orderBy("id")
      .localCheckpoint(true)
    fx.createOrReplaceTempView("fzts")
    val r = new scala.util.Random(Seed + 4)
    var skipped = 0
    (0 until 30).foreach { i =>
      val n = 2 + r.nextInt(300)
      val nAgg = 1 + r.nextInt(3)
      val aggs = (0 until nAgg).map { j =>
        val a = pick(r, Seq("sum", "count", "min", "max", "avg"))
        s"$a(v) OVER w AS a$j"
      }
      val attr = i % 4 match {
        case 0 => ""
        case 1 => s" MAXSIZE ${1 + r.nextInt(6)}"
        case 2 => " EXCLUDE CURRENT_ROW"
        case _ => " EXCLUDE CURRENT_TIME"
      }
      val frame = if (i % 2 == 0) s"ROWS BETWEEN $n PRECEDING AND CURRENT ROW"
        else s"ROWS_RANGE BETWEEN $n PRECEDING AND CURRENT ROW"
      // MAXSIZE is a ROWS_RANGE-only attribute in the dialect grammar
      val fr = if (attr.startsWith(" MAXSIZE"))
        s"ROWS_RANGE BETWEEN $n PRECEDING AND CURRENT ROW" else frame
      val sql = s"SELECT id, ${aggs.mkString(", ")} FROM fzts " +
        s"WINDOW w AS (PARTITION BY k ORDER BY id $fr$attr)"
      val batch = GraftSql.sql(spark, sql)
      val served =
        try graft.sql.StreamDeploy.serve(spark, sql, fx.alias("fzts"))
        catch { case _: IllegalArgumentException => skipped += 1; null }
      if (served != null)
        diff(batch, served, 1, s"seed=${Seed + 4} case=$i sql=[$sql]")
          .foreach(msg => fail(msg))
    }
    assert(skipped <= 6, s"deploy compiler rejected $skipped/30 shapes")
  }

  test("LAST JOIN fuzz: 40 equi/as-of/general cases agree with the " +
      "row_number twin") {
    val r = new scala.util.Random(Seed + 2)
    (0 until 40).foreach { i =>
      val cond = i % 3 match {
        case 0 => ""
        case 1 => s" AND fzr.uts <= fzl.uts"
        case _ => s" AND fzr.v < fzl.w - ${r.nextInt(50)}"
      }
      val ours = "SELECT fzl.id AS id, fzr.v AS bv FROM fzl " +
        s"LAST JOIN fzr ORDER BY fzr.uts ON fzl.k = fzr.k$cond"
      val twin = "SELECT id, bv FROM (" +
        "SELECT fzl.id AS id, fzr.v AS bv, row_number() OVER " +
        "(PARTITION BY fzl.id ORDER BY fzr.uts DESC) AS rn " +
        s"FROM fzl LEFT JOIN fzr ON fzl.k = fzr.k$cond) t WHERE rn = 1"
      diff(GraftSql.sql(spark, ours), spark.sql(twin), 1,
          s"seed=${Seed + 2} case=$i ours=[$ours] twin=[$twin]")
        .foreach(msg => fail(msg))
    }
  }
}
