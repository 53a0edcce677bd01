package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, PlainBaseline, SparkEntry, Tables}
import graft.operators.{LastJoin, WindowOps}

/** Scratch profiling main for the q_bench_shape pair (not part of the
  * driver contract; run with `Test/runMain graft.tools.ShapeProbe`). */
object ShapeProbe {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(spark: SparkSession, label: String)(df: => DataFrame): Unit = {
    val d = df
    materialize(d) // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); materialize(d); (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $label%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    PlainBaseline.registerViews(spark, dir)
    def T(n: String) = Tables.load(spark, dir, n)

    // full pair
    time(spark, "ours_full")(SparkEntry.queries("q_bench_shape")(spark, dir))
    time(spark, "plain_full")(PlainBaseline.query(spark, "q_bench_shape"))

    // events scan + normalize only
    time(spark, "ours_scan")(T("events"))
    time(spark, "plain_scan")(spark.table("pb_events"))

    // join only (no window)
    val cust = T("customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    time(spark, "ours_join") {
      LastJoin(T("events"), cust, Seq("user_id"), Seq("c_custkey"),
        Some(col("c_custkey")))
    }

    // window only (no join): our frameArray fast path + the 5 outputs
    def oursWin(src: DataFrame): DataFrame = {
      val fa = WindowOps.frameArray(
        struct(col("value").as("v"), col("event_type").as("et")),
        col("ts_ms"), col("event_id"), Seq(col("user_id")),
        2592000000L, maxSize = 100, strictRowOrder = true)
      val a = col("__arr")
      val vOf = (x: Column) => x("v")("v")
      val nn = filter(a, x => vOf(x).isNotNull)
      src.withColumn("__arr", fa).select(
        col("event_id"),
        size(array_distinct(transform(nn, vOf))).cast("long").as("w_dc"),
        round(when(size(nn) > 0,
          aggregate(nn, lit(0.0), (acc, x) => acc + vOf(x).cast("double"))), 3)
          .as("w_sum"),
        size(nn).cast("long").as("w_cnt"),
        size(filter(a, x => x("v")("et") === "click" && vOf(x).isNotNull))
          .cast("long").as("w_clicks"),
        size(filter(a, x => vOf(x).isNotNull && vOf(x) > 100))
          .cast("long").as("w_big"))
    }
    time(spark, "ours_win_only")(oursWin(T("events")))

    // flat-struct variant of the frame entry (no nested v struct)
    def oursWinFlat(src: DataFrame): DataFrame = {
      val spec = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_ms").asc, col("event_id").asc)
        .rowsBetween(-99L, 0L)
      val minTs = col("ts_ms") - 2592000000L
      val arr0 = reverse(collect_list(
        struct(col("ts_ms").as("ts"), col("value").as("v"),
          col("event_type").as("et"))).over(spec))
      val a = col("__arr")
      val vOf = (x: Column) => x("v")
      val nn = filter(a, x => vOf(x).isNotNull)
      src.withColumn("__arr", filter(arr0, x => x("ts") >= minTs)).select(
        col("event_id"),
        size(array_distinct(transform(nn, vOf))).cast("long").as("w_dc"),
        round(when(size(nn) > 0,
          aggregate(nn, lit(0.0), (acc, x) => acc + vOf(x).cast("double"))), 3)
          .as("w_sum"),
        size(nn).cast("long").as("w_cnt"),
        size(filter(a, x => x("et") === "click" && vOf(x).isNotNull))
          .cast("long").as("w_clicks"),
        size(filter(a, x => vOf(x).isNotNull && vOf(x) > 100))
          .cast("long").as("w_big"))
    }
    time(spark, "ours_win_flat")(oursWinFlat(T("events")))

    // values-array variant: extract the doubles ONCE, run the numeric
    // outputs over the flat double array (cheap copies), keep only
    // clicks on the struct array
    def oursWinVals(src: DataFrame): DataFrame = {
      val fa = WindowOps.frameArray(
        struct(col("value").as("v"), col("event_type").as("et")),
        col("ts_ms"), col("event_id"), Seq(col("user_id")),
        2592000000L, maxSize = 100, strictRowOrder = true)
      val a = col("__arr")
      val vOf = (x: Column) => x("v")("v")
      val nn = filter(transform(a, vOf), x => x.isNotNull)
      src.withColumn("__arr", fa).select(
        col("event_id"),
        size(array_distinct(nn)).cast("long").as("w_dc"),
        round(when(size(nn) > 0,
          aggregate(nn, lit(0.0), (acc, x) => acc + x.cast("double"))), 3)
          .as("w_sum"),
        size(nn).cast("long").as("w_cnt"),
        size(filter(a, x => x("v")("et") === "click" && vOf(x).isNotNull))
          .cast("long").as("w_clicks"),
        size(filter(nn, x => x > 100)).cast("long").as("w_big"))
    }
    time(spark, "ours_win_vals")(oursWinVals(T("events")))

    // lshFirstSeen stage costs
    {
      import graft.operators.{Dedup, TextOps}
      val docs = T("documents")
      time(spark, "lsh_toks") {
        docs.select(col("doc_id"),
          array_distinct(filter(TextOps.wordNgramsOf(
            filter(TextOps.words(col("text")), w => w =!= ""), 3),
            g => g =!= "")).as("t"))
      }
      time(spark, "lsh_buckets")(
        Dedup.lshBuckets(docs, "doc_id", "text", 4, 3))
      time(spark, "lsh_full")(
        Dedup.lshFirstSeen(docs, "doc_id", "text"))
      // variant: no cache, no checkpoint (recompute buckets twice)
      time(spark, "lsh_nocache") {
        val b = Dedup.lshBuckets(docs, "doc_id", "text", 4, 3)
        val f = b.groupBy("band", "bh").agg(min("doc_id").as("first_id"))
        val m = b.join(f, Seq("band", "bh"))
          .where(col("first_id") < col("doc_id"))
          .groupBy("doc_id").agg(min("first_id").as("matched_id"))
        docs.select(col("doc_id")).join(m, Seq("doc_id"), "left")
          .select(col("doc_id"), col("matched_id").isNotNull.as("is_dup"),
            col("matched_id"))
      }
      // variant: cache, lazy (no eager localCheckpoint)
      locally {
        val b = Dedup.lshBuckets(docs, "doc_id", "text", 4, 3).cache()
        val f = b.groupBy("band", "bh").agg(min("doc_id").as("first_id"))
        val m = b.join(f, Seq("band", "bh"))
          .where(col("first_id") < col("doc_id"))
          .groupBy("doc_id").agg(min("first_id").as("matched_id"))
        time(spark, "lsh_cache_lazy") {
          docs.select(col("doc_id")).join(m, Seq("doc_id"), "left")
            .select(col("doc_id"), col("matched_id").isNotNull.as("is_dup"),
              col("matched_id"))
        }
        b.unpersist(false)
      }
    }

    // the plain twin's window half alone
    time(spark, "plain_win_only")(spark.sql(
      """SELECT event_id,
        |  slice(reverse(array_sort(collect_list(
        |      struct(ts_ms, event_id AS eid, value AS v, event_type AS et)) OVER
        |    (PARTITION BY user_id ORDER BY ts_ms
        |     RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW))), 1, 100) AS arr
        |FROM pb_events""".stripMargin))

    spark.stop()
  }
}
