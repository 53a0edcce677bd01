package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The PartitionProvider (index scan) analog at scale: a table bucketed
  * on the window partition key satisfies the window's clustering
  * requirement, so the per-key window computes WITHOUT a shuffle — the
  * same access-path win the reference gets from its (key, ts) indexes
  * (group_and_sort_optimized.cc index selection). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("window over a bucketed table plans without an exchange") {
    val df = (1 to 1000).map(i => (s"u${i % 7}", i.toLong, i * 1.0))
      .toDF("k", "ts", "v")
    df.write.mode("overwrite")
      .bucketBy(8, "k").sortBy("k", "ts")
      .saveAsTable("graft_bucketed_events")
    try {
      val w = Window.partitionBy(col("k")).orderBy(col("ts"))
        .rangeBetween(-100L, 0)
      val q = spark.table("graft_bucketed_events")
        .select(col("k"), col("ts"), sum(col("v")).over(w).as("s"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed window still shuffles:\n$plan")
      // and it computes correctly
      val out = q.filter(col("k") === "u1" && col("ts") === 995L)
        .collect()(0).getDouble(2)
      // frame [895,995] step 7 → ts 897,904,...,995 → 15 values
      assert(out == (897 to 995 by 7).map(_.toDouble).sum)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_events")
    }
  }

  test("bucketed equi-join avoids shuffling both sides") {
    val a = (1 to 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "x")
    val b = (1 to 500).map(i => (i.toLong % 50, i * 2.0)).toDF("k", "y")
    a.write.mode("overwrite").bucketBy(8, "k").saveAsTable("graft_ba")
    b.write.mode("overwrite").bucketBy(8, "k").saveAsTable("graft_bb")
    try {
      // disable broadcast so the co-located sort-merge path is observable
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val q = spark.table("graft_ba")
          .join(spark.table("graft_bb"), "k")
        val plan = q.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join still shuffles:\n$plan")
        assert(q.count() == 5000) // 10 × 10 matches per key × 50 keys
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ba")
      spark.sql("DROP TABLE IF EXISTS graft_bb")
    }
  }
}
