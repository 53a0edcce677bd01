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

  test("preceding smaller than a bucket is rejected") {
    val df = Seq((1L, "a", 10L, 1.0)).toDF("uid", "k", "ts", "v")
    val pre = LongWindow.buildPreAgg(df, col("k"), col("ts"), col("v"), 100L)
    intercept[IllegalArgumentException] {
      LongWindow.sumCountOverLongWindow(df, pre, col("k"), col("ts"),
        col("v"), col("uid"), precedingMs = 50L, bucketMs = 100L)
    }
  }
}
