package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftAggregates => A}

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  // reference doc example data for the *_cate_where families
  private def catedf = Seq(
    (0.0, true, "x"), (1.0, true, "y"), (2.0, false, "x"),
    (3.0, true, "y"), (4.0, false, "x"), (5.0, true, "z"), (6.0, true, "z")
  ).toDF("v", "cond", "k")

  test("cate renders k:v sorted by key with %f formatting") {
    val out = catedf.agg(A.cate("sum", col("v"), col("k"))).collect()(0).getString(0)
    assert(out == "x:6.000000,y:4.000000,z:11.000000")
  }

  test("top_n_key_sum_cate_where matches reference doc example") {
    val out = catedf.agg(A.top_n_key_cate("sum", col("v"),
      when(col("cond"), col("k")), 2)).collect()(0).getString(0)
    assert(out == "z:11.000000,y:4.000000") // top-2 keys desc
  }

  test("top_n_value_sum_cate_where matches reference doc example") {
    val df2 = Seq(
      (0.0, true, "x"), (1.0, true, "y"), (2.0, false, "x"),
      (3.0, false, "y"), (4.0, true, "x"), (5.0, true, "z"), (6.0, true, "z")
    ).toDF("v", "cond", "k")
    val out = df2.agg(A.top_n_value_cate("sum", col("v"),
      when(col("cond"), col("k")), 2)).collect()(0).getString(0)
    assert(out == "z:11.000000,x:4.000000") // top-2 by value desc
  }

  test("ew_avg weights newest rows highest") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 4.0)).toDF("ts", "v")
    val out = df.agg(A.ew_avg(col("ts"), col("v"), 0.5)).collect()(0).getDouble(0)
    // newest-first: 4, 2, 1 with weights 1, .5, .25 → (4+1+0.25)/1.75 = 3.0
    assert(math.abs(out - 3.0) < 1e-9)
  }

  test("drawdown finds max peak-to-newer-trough ratio") {
    val df = Seq((1L, 100.0), (2L, 50.0), (3L, 80.0)).toDF("ts", "v")
    // newest-first: 80, 50, 100 → min tracking: at 100, min=50 → (100-50)/100
    val out = df.agg(A.drawdown(col("ts"), col("v"))).collect()(0).getDouble(0)
    assert(math.abs(out - 0.5) < 1e-9)
  }

  test("entropy of a uniform 2-symbol distribution is 1 bit") {
    val df = Seq("a", "b", "a", "b").toDF("x")
    val out = df.agg(A.entropy(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(out - 1.0) < 1e-9)
  }

  test("topn_frequency pads with NULL to exactly n entries") {
    val df = Seq("a", "a", "b").toDF("x")
    val out = df.agg(A.topn_frequency(col("x"), 4)).collect()(0).getString(0)
    assert(out == "a,b,NULL,NULL")
  }

  test("top(k) returns k largest values desc comma-joined") {
    val df = Seq(1.0, 3.0, 2.0, 3.0).toDF("v")
    val out = df.agg(A.topStr(col("v"), 3)).collect()(0).getString(0)
    assert(out == "3.000000,3.000000,2.000000")
  }

  test("top1_ratio is 0.0 on empty input after filtering") {
    val df = Seq("a", "a", "b").toDF("x")
    val out = df.agg(A.top1_ratio(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(out - 2.0 / 3.0) < 1e-9)
  }
}
