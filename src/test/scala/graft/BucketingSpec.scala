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

  test("date-partitioned layout prunes partitions at the scan") {
    // the other half of the reference's (key, ts) index story at scale:
    // a time-range predicate over a date-partitioned table must touch
    // only the matching partition directories (PartitionFilters), so a
    // 100 TB table scans days, not history
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events_by_day"
    (0 until 1000).map(i => (i.toLong, s"2026-01-${1 + i % 20}", i * 1.0))
      .toDF("event_id", "day", "v")
      .write.partitionBy("day").mode("overwrite").parquet(path)
    val q = spark.read.parquet(path)
      .filter(col("day") === "2026-01-7" && col("v") > 100)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("day"),
      s"day predicate not applied as a partition filter:\n${plan.take(1200)}")
    assert(q.count() == (0 until 1000).count(i =>
      i % 20 == 6 && i > 100))
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
