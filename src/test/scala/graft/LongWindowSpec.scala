package graft

import org.apache.spark.sql.functions._
import graft.operators.LongWindow

class LongWindowSpec extends SparkSpec {
  import spark.implicits._

  test("MV-rewritten long window equals the direct RANGE window") {
    // two keys, rows scattered across many buckets incl. same-ts ties
    val rng = new scala.util.Random(7)
    val data = (1 to 300).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else "b",
        (rng.nextInt(5000)).toLong, rng.nextInt(100).toDouble)
    }
    val df = data.toDF("uid", "k", "ts", "v")

    val preAgg = LongWindow.buildPreAgg(df, col("k"), col("ts"), col("v"), 100L)
    val mv = LongWindow.sumCountOverLongWindow(df, preAgg,
      col("k"), col("ts"), col("v"), col("uid"),
      precedingMs = 1000L, bucketMs = 100L)
      .select(col("uid"), col("lw_sum"), col("lw_cnt"), col("lw_min"), col("lw_max"))
      .as[(Long, Double, Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ts")).rangeBetween(-1000L, 0)
    val direct = df.select(col("uid"),
        sum(col("v")).over(w).as("s"), count(col("v")).over(w).as("c"),
        min(col("v")).over(w).as("mn"), max(col("v")).over(w).as("mx"))
      .as[(Long, Double, Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap

    assert(mv.keySet == direct.keySet)
    direct.foreach { case (uid, (s, c, mn, mx)) =>
      val (ms, mc, mmn, mmx) = mv(uid)
      assert(mc == c, s"count mismatch for uid $uid")
      assert(math.abs(ms - s) < 1e-6, s"sum mismatch for uid $uid: $ms vs $s")
      assert(mmn == mn && mmx == mx, s"min/max mismatch for uid $uid")
    }
  }

  test("incremental MV update equals the full rebuild (append-only, " +
      "out-of-order, multi-slice chains, null partials)") {
    val rng = new scala.util.Random(17)
    val data = (1 to 400).map { i =>
      (i.toLong, if (i % 3 == 0) "a" else "b", rng.nextInt(5000).toLong,
        // sprinkle NULL values so null-sum partials get exercised
        if (i % 37 == 0) null.asInstanceOf[java.lang.Double]
        else java.lang.Double.valueOf(rng.nextInt(100).toDouble))
    }
    val df = data.toDF("uid", "k", "ts", "v")

    def canon(mv: org.apache.spark.sql.DataFrame) =
      mv.select(col("k"), col("bucket"), col("b_sum"), col("b_cnt"),
          col("b_min"), col("b_max"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getLong(3),
            Option(r.get(4)).map(_.asInstanceOf[Double]),
            Option(r.get(5)).map(_.asInstanceOf[Double])))
        .toMap

    val full = canon(LongWindow.buildPreAgg(
      df, col("k"), col("ts"), col("v"), 100L))

    def assertSame(got: Map[(String, Long), (Option[Double], Long,
        Option[Double], Option[Double])]): Unit = {
      assert(got.keySet == full.keySet)
      full.foreach { case (kb, (s, c, mn, mx)) =>
        val (gs, gc, gmn, gmx) = got(kb)
        assert(gc == c, s"cnt mismatch at $kb")
        assert(gmn == mn && gmx == mx, s"min/max mismatch at $kb")
        (s, gs) match {
          case (Some(a), Some(b)) =>
            assert(math.abs(a - b) < 1e-9, s"sum mismatch at $kb: $b vs $a")
          case (a, b) => assert(a == b, s"null-sum mismatch at $kb")
        }
      }
    }

    // steady-state append: history below the time split, tail above —
    // the appended slice lands in new and boundary buckets
    val inc1 = LongWindow.updatePreAgg(
      LongWindow.buildPreAgg(df.filter(col("ts") < 2500),
        col("k"), col("ts"), col("v"), 100L),
      df.filter(col("ts") >= 2500), col("k"), col("ts"), col("v"), 100L)
    assertSame(canon(inc1))

    // out-of-order arrival: the "appended" slice is scattered across
    // OLD buckets (uid-keyed split, time-interleaved) — monoid merge
    // must fold into existing partials, not just append new buckets
    val inc2 = LongWindow.updatePreAgg(
      LongWindow.buildPreAgg(df.filter(col("uid") % 2 === 0),
        col("k"), col("ts"), col("v"), 100L),
      df.filter(col("uid") % 2 === 1), col("k"), col("ts"), col("v"), 100L)
    assertSame(canon(inc2))

    // chained updates: three successive slices folded one at a time
    val inc3 = Seq(1500, 3000).foldLeft(
      LongWindow.buildPreAgg(df.filter(col("ts") < 1500),
        col("k"), col("ts"), col("v"), 100L)) { (mv, lo) =>
      val hi = if (lo == 1500) 3000 else Int.MaxValue
      LongWindow.updatePreAgg(mv,
        df.filter(col("ts") >= lo && col("ts") < hi),
        col("k"), col("ts"), col("v"), 100L)
    }
    assertSame(canon(inc3))

    // serve-consistency: the incrementally maintained MV answers the
    // long window identically to the rebuilt one
    val servedInc = LongWindow.sumCountOverLongWindow(df, inc1,
        col("k"), col("ts"), col("v"), col("uid"), 1000L, 100L)
      .select(col("uid"), col("lw_sum"), col("lw_cnt"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val servedFull = LongWindow.sumCountOverLongWindow(df,
        LongWindow.buildPreAgg(df, col("k"), col("ts"), col("v"), 100L),
        col("k"), col("ts"), col("v"), col("uid"), 1000L, 100L)
      .select(col("uid"), col("lw_sum"), col("lw_cnt"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(servedInc.keySet == servedFull.keySet)
    servedFull.foreach { case (uid, (s, c)) =>
      assert(servedInc(uid)._2 == c)
      assert(math.abs(servedInc(uid)._1 - s) < 1e-9)
    }
  }

  test("preceding smaller than a bucket is rejected") {
    val df = Seq((1L, "a", 10L, 1.0)).toDF("uid", "k", "ts", "v")
    val pre = LongWindow.buildPreAgg(df, col("k"), col("ts"), col("v"), 100L)
    intercept[IllegalArgumentException] {
      LongWindow.sumCountOverLongWindow(df, pre, col("k"), col("ts"),
        col("v"), col("uid"), precedingMs = 50L, bucketMs = 100L)
    }
  }
}
