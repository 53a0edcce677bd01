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

  /** [[WindowOps.frameArray]] composed with the same time-bucket
    * replication: the frame-array slow path buffers the whole range span
    * per row inside ONE task per partition key, so a hot key at 100×
    * data materializes its entire history in a single task. Cutting the
    * key's timeline into `bucketMs`-wide buckets (owner + next-bucket
    * history replica, exactly as [[rangeSumCount]]) bounds every task at
    * two buckets of rows while computing the identical frame — all
    * extended window attributes (MAXSIZE / EXCLUDE CURRENT_TIME /
    * EXCLUDE CURRENT_ROW / WINDOW UNION flags / strict ties) filter on
    * (ts, uid) within the collected array and are bucket-invariant.
    * Only bounded frames can bucket (`precedingMs < UnboundedMs`);
    * unbounded frames use [[WindowOps.unboundedAgg]], which needs no
    * buffering in the first place. Reference analog:
    * utils/SkewDataFrameUtils.scala, OpenmldbBatchConfig.scala:52-73.
    *
    * Adds `outCol` (the frame array) to `df`; aggregate with the
    * [[WindowOps]] agg* helpers as usual.
    */
  def withFrameArray(df: DataFrame, outCol: String,
      v: Column, tsMs: Column, uid: Column, partition: Seq[Column],
      precedingMs: Long, bucketMs: Long,
      maxSize: Int = 0,
      excludeCurrentTime: Boolean = false,
      excludeCurrentRow: Boolean = false,
      isPrimary: Column = null,
      instanceNotInWindow: Boolean = false,
      strictRowOrder: Boolean = false,
      hiPrecedingMs: Long = 0,
      skipNewest: Int = 0): DataFrame = {
    require(precedingMs < WindowOps.UnboundedMs,
      "withFrameArray: only bounded frames can be bucketed " +
        "(use WindowOps.unboundedAgg for unbounded frames)")
    require(bucketMs >= precedingMs,
      s"bucketMs ($bucketMs) must cover the frame span ($precedingMs)")
    val exploded = df
      .withColumn("__sw_own", floor(tsMs / bucketMs).cast("long"))
      .withColumn("__sw_role", explode(array(lit(0), lit(1))))
      .withColumn("__sw_bucket", when(col("__sw_role") === 0, col("__sw_own"))
        .otherwise(col("__sw_own") + 1))
    val arr = WindowOps.frameArray(v, tsMs, uid,
      partition :+ col("__sw_bucket"),
      precedingMs, maxSize, excludeCurrentTime, excludeCurrentRow,
      isPrimary, instanceNotInWindow, strictRowOrder, hiPrecedingMs,
      skipNewest)
    exploded.withColumn(outCol, arr)
      .filter(col("__sw_role") === 0)
      .drop("__sw_own", "__sw_role", "__sw_bucket")
  }
}
