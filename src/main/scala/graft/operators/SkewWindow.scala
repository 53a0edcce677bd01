package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-parallelized bounded-frame window — the reference's window-skew
  * optimization (`openmldb.window.skew.opt`:
  * java/openmldb-batch/.../WindowAggPlan.scala:87-100,
  * utils/SkewDataFrameUtils.scala) re-expressed Spark-first.
  *
  * A window over PARTITION BY k puts ALL rows of a hot key into one
  * task. For a frame bounded by `precedingMs`, a row at time t only
  * needs history back to t-precedingMs, so the key's timeline can be
  * cut into buckets of `bucketMs >= precedingMs` and each bucket
  * computed independently, provided each bucket also SEES the previous
  * bucket's rows as history. We replicate every row into its own
  * bucket (role=owner) and the next bucket (role=history), window over
  * (k, bucket), and keep owner outputs: the hot key becomes
  * span/bucketMs independent partitions at the cost of one 2×
  * row duplication — the same trade the reference's skew mode makes
  * with its quantile buckets + union of carry rows.
  */
object SkewWindow {

  /** sum/count of `v` over `RANGE precedingMs PRECEDING` per (key, ts),
    * computed skew-parallel. Adds `sw_sum`, `sw_cnt`. */
  def rangeSumCount(df: DataFrame, key: Column, tsMs: Column, v: Column,
      precedingMs: Long, bucketMs: Long): DataFrame = {
    require(bucketMs >= precedingMs,
      s"bucketMs ($bucketMs) must cover the frame span ($precedingMs)")
    val ownBucket = floor(tsMs / bucketMs).cast("long")
    // role 0 = owner row in its own bucket; role 1 = history replica in
    // the NEXT bucket (it can only ever be frame-history there)
    val exploded = df
      .withColumn("__own", ownBucket)
      .withColumn("__role", explode(array(lit(0), lit(1))))
      .withColumn("__bucket",
        when(col("__role") === 0, col("__own")).otherwise(col("__own") + 1))
    val w = Window.partitionBy(key, col("__bucket")).orderBy(tsMs)
      .rangeBetween(-precedingMs, 0)
    exploded
      .withColumn("sw_sum", sum(v).over(w))
      .withColumn("sw_cnt", count(v).over(w))
      .filter(col("__role") === 0)
      .drop("__own", "__role", "__bucket")
  }
}
