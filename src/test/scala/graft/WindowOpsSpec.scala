package graft

import org.apache.spark.sql.functions._
import graft.operators.WindowOps

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  // (uid, key, ts_ms, value) — user u1 has a same-ts tie at ts=30
  private def df = Seq(
    (1L, "u1", 10L, 1.0), (2L, "u1", 20L, 2.0), (3L, "u1", 30L, 3.0),
    (4L, "u1", 30L, 4.0), (5L, "u1", 40L, 5.0),
    (6L, "u2", 10L, 10.0)
  ).toDF("uid", "k", "ts", "v")

  private def frame(maxSize: Int = 0, exclCT: Boolean = false,
      exclCR: Boolean = false, strict: Boolean = false) =
    WindowOps.frameArray(col("v"), col("ts"), col("uid"), Seq(col("k")),
      precedingMs = 25L, maxSize = maxSize, excludeCurrentTime = exclCT,
      excludeCurrentRow = exclCR, strictRowOrder = strict)

  private def sums(c: org.apache.spark.sql.Column): Map[Long, Double] =
    df.select(col("uid"), WindowOps.aggSum(c).as("s"))
      .as[(Long, Option[Double])].collect()
      .map(t => t._1 -> t._2.getOrElse(Double.NaN)).toMap

  test("plain ROWS_RANGE frame sums (peer-inclusive on ties)") {
    val s = sums(frame())
    assert(s(1L) == 1.0)
    assert(s(2L) == 3.0)            // 10,20
    assert(s(3L) == 2.0 + 3.0 + 4.0 + 1.0) // 10..30 incl. both ties
    assert(s(5L) == 2.0 + 3.0 + 4.0 + 5.0) // [15,40]
    assert(s(6L) == 10.0)
  }

  test("strictRowOrder drops same-ts peers that sort after the row") {
    val s = sums(frame(strict = true))
    assert(s(3L) == 1.0 + 2.0 + 3.0) // uid=4 peer excluded for row 3
    assert(s(4L) == 1.0 + 2.0 + 3.0 + 4.0)
  }

  test("MAXSIZE keeps only the n newest rows") {
    val s = sums(frame(maxSize = 2))
    assert(s(3L) == 3.0 + 4.0 || s(3L) == 4.0 + 3.0)
    assert(s(5L) == 5.0 + 4.0)     // newest two of {3,4,5}
  }

  test("EXCLUDE CURRENT_TIME drops same-ts peers but keeps self") {
    val s = sums(frame(exclCT = true))
    assert(s(3L) == 1.0 + 2.0 + 3.0)
    assert(s(4L) == 1.0 + 2.0 + 4.0)
  }

  test("EXCLUDE CURRENT_ROW drops only self (same-ts peers stay)") {
    val s = sums(frame(exclCR = true))
    assert(s(3L) == 1.0 + 2.0 + 4.0)
    assert(s(5L) == 2.0 + 3.0 + 4.0)
    assert(s(1L).isNaN) // frame emptied entirely -> SQL NULL sum
  }

  test("aggMin/aggMax/aggAvg/aggDistinctCount over the frame") {
    // window first, filter after — filtering first would shrink the frame
    val out = df.select(col("uid"),
      WindowOps.aggMin(frame()).as("mn"), WindowOps.aggMax(frame()).as("mx"),
      WindowOps.aggAvg(frame()).as("av"),
      WindowOps.aggDistinctCount(frame()).as("dc"))
      .filter(col("uid") === 5L).drop("uid")
      .collect()(0)
    assert(out.getDouble(0) == 2.0 && out.getDouble(1) == 5.0)
    assert(out.getDouble(2) == 3.5 && out.getLong(3) == 4L)
  }

  test("nth_value_where counts matches from frame start and end") {
    val cond = col("v") =!= 3.0
    val v = struct(col("v").as("value"), cond.as("cond"))
    val arr = WindowOps.frameArray(v, col("ts"), col("uid"), Seq(col("k")), 100L)
    val out = df.select(col("uid"),
      WindowOps.aggNthValueWhere(arr, 2).as("n2"),
      WindowOps.aggNthValueWhere(arr, -1).as("nl"),
      WindowOps.aggNthValueWhere(arr, 5).as("n5"))
      .filter(col("uid") === 5L).drop("uid")
      .collect()(0)
    // matches oldest-first: 1.0, 2.0, 4.0, 5.0
    assert(out.getDouble(0) == 2.0)
    assert(out.getDouble(1) == 5.0)
    assert(out.isNullAt(2)) // only 4 matches
  }

  test("window_split_by_key/value flatten frame rows newest-first") {
    val kv = concat(col("v").cast("int").cast("string"), lit(":x"))
    val arr = WindowOps.frameArray(kv, col("ts"), col("uid"), Seq(col("k")), 100L)
    val out = df.select(col("uid"),
      array_join(WindowOps.aggWindowSplitByKey(arr, ",", ":"), "|").as("j"))
      .filter(col("uid") === 5L)
      .collect()(0).getString(1)
    assert(out == "5|4|3|2|1")
  }

  test("strict MAXSIZE fast path: at-or-before newest-n with range bound") {
    val s = sums(frame(maxSize = 2, strict = true))
    assert(s(3L) == 2.0 + 3.0)     // tie-after uid=4 not yet in buffer
    assert(s(4L) == 3.0 + 4.0)
    assert(s(5L) == 4.0 + 5.0)
    assert(s(1L) == 1.0)
  }

  test("strict MAXSIZE + EXCLUDE CURRENT_ROW: empty frame sums to NULL") {
    val c = WindowOps.frameArray(col("v"), col("ts"), col("uid"),
      Seq(col("k")), 25L, maxSize = 2, excludeCurrentRow = true,
      strictRowOrder = true)
    val s = sums(c)
    assert(s(1L).isNaN)            // no prior rows -> NULL sum
    assert(s(4L) == 2.0 + 3.0)
    assert(s(5L) == 3.0 + 4.0)
    // count over the empty frame must be 0, not null/-1
    val cnt = df.select(col("uid"), WindowOps.aggCount(c).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(cnt(1L) == 0L && cnt(6L) == 0L)
  }

  test("unboundedAgg matches the collect-everything slow path") {
    import graft.operators.WindowOps.{frameArray, unboundedAgg}
    val unb = Long.MaxValue / 4
    for {
      exclCT <- Seq(false, true)
      exclCR <- Seq(false, true)
      fn <- Seq("sum", "count", "avg", "min", "max")
    } {
      val arr = frameArray(col("v"), col("ts"), col("uid"), Seq(col("k")),
        unb, excludeCurrentTime = exclCT, excludeCurrentRow = exclCR,
        strictRowOrder = true)
      val slow: org.apache.spark.sql.Column = fn match {
        case "sum"   => WindowOps.aggSum(arr)
        case "count" => WindowOps.aggCount(arr)
        case "avg"   => WindowOps.aggAvg(arr)
        case "min"   => WindowOps.aggMin(arr)
        case "max"   => WindowOps.aggMax(arr)
      }
      val fast = unboundedAgg(fn, col("v"), col("ts"), col("uid"),
        Seq(col("k")), exclCT, exclCR, memberFlag = None)
      val out = df.select(col("uid"), slow.as("slow"), fast.as("fast")).collect()
      out.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2) &&
          (r.isNullAt(1) || r.get(1) == r.get(2)),
          s"fn=$fn exclCT=$exclCT exclCR=$exclCR uid=${r.get(0)}: " +
            s"slow=${r.get(1)} fast=${r.get(2)}")
      }
    }
  }

  test("unboundedAgg with memberFlag matches INSTANCE_NOT_IN_WINDOW slow path") {
    import graft.operators.WindowOps.{frameArray, unboundedAgg}
    val unb = Long.MaxValue / 4
    val flag = col("v") <= 2.0 // "primary" rows
    val arr = frameArray(col("v"), col("ts"), col("uid"), Seq(col("k")),
      unb, isPrimary = flag, instanceNotInWindow = true, strictRowOrder = true)
    val slow = WindowOps.aggSum(arr)
    val fast = unboundedAgg("sum", col("v"), col("ts"), col("uid"),
      Seq(col("k")), excludeCurrentTime = false, excludeCurrentRow = false,
      memberFlag = Some(!flag))
    df.select(col("uid"), slow.as("slow"), fast.as("fast")).collect().foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2) &&
        (r.isNullAt(1) || r.get(1) == r.get(2)),
        s"uid=${r.get(0)}: slow=${r.get(1)} fast=${r.get(2)}")
    }
  }
}
