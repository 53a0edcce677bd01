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
  * bucket's rows as history. Every row lands in its own bucket
  * (role=owner); rows in the LAST `precedingMs` of a bucket — the only
  * ones any next-bucket frame can reach — also replicate into the next
  * bucket (role=history). Window over (k, bucket), keep owner outputs:
  * the hot key becomes span/bucketMs independent partitions at the
  * cost of a `1 + precedingMs/bucketMs` row duplication — the same
  * trade the reference's skew mode makes with its quantile buckets +
  * union of carry rows, minus the rows a frame can never reach.
  *
  * Pick `bucketMs` a small multiple of `precedingMs` (4× is a good
  * default): replication falls as 1 + p/b while a hot key still cuts
  * into span/bucketMs tasks.
  *
  * Measured cause of the q_skew_window bench ratio (~1.2× of the
  * plain unsalted window at sf0.1, rounds 14-16): the bench corpus
  * has UNIFORM keys — ~66 events per user_id spread over 30 days —
  * so time-bucketing shreds each key's 66-row window group into
  * ~one-row groups, and WindowExec's per-group constant costs
  * (frame-processor init, buffer churn) exceed the per-row frame
  * work the split is meant to parallelize. That ~1.2× is the
  * operator's worst case: the overhead of applying the skew rewrite
  * where no key is hot, bounded by the explode + 1+p/b replica
  * shuffle. On an actually hot key (the operator's purpose) the
  * plain window serializes the whole key in one task while this plan
  * cuts it into span/bucketMs independent ones. Alternatives
  * measured and rejected at sf0.1: union-of-two-scans instead of
  * explode (1.77× — double scan), bucketMs = precedingMs (2×
  * replication, same ~1.25× — the replica volume is not the
  * bottleneck at this key density).
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
    // the NEXT bucket (it can only ever be frame-history there). Only
    // the last precedingMs of a bucket can be any next-bucket frame's
    // history — tail-only replication prunes the rest BEFORE the
    // shuffle (a no-op when bucketMs == precedingMs; 1 + p/b total
    // rows when bucketMs is a multiple).
    // a row in the last precedingMs of its bucket explodes into
    // (own, own+1); everything else stays a single owner row — the
    // only extra column through the shuffle is __bucket itself, and
    // owner-ness is recomputed from ts afterwards
    val inTail = tsMs - ownBucket * bucketMs >= bucketMs - precedingMs
    val exploded = df.withColumn("__bucket",
      explode(when(inTail, array(ownBucket, ownBucket + 1))
        .otherwise(array(ownBucket))))
    val w = Window.partitionBy(key, col("__bucket")).orderBy(tsMs)
      .rangeBetween(-precedingMs, 0)
    exploded
      .withColumn("sw_sum", sum(v).over(w))
      .withColumn("sw_cnt", count(v).over(w))
      .filter(col("__bucket") === ownBucket)
      .drop("__bucket")
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
    // tail-only replication, as in [[rangeSumCount]]: a next-bucket
    // frame reaches back at most precedingMs (hiPrecedingMs only
    // raises the frame's NEAR edge), so only each bucket's last
    // precedingMs of rows replicate — a conditional bucket-array
    // explode, owner-ness recomputed from ts afterwards
    val ownBucket = floor(tsMs / bucketMs).cast("long")
    val inTail = tsMs - ownBucket * bucketMs >= bucketMs - precedingMs
    val exploded = df.withColumn("__sw_bucket",
      explode(when(inTail, array(ownBucket, ownBucket + 1))
        .otherwise(array(ownBucket))))
    val arr = WindowOps.frameArray(v, tsMs, uid,
      partition :+ col("__sw_bucket"),
      precedingMs, maxSize, excludeCurrentTime, excludeCurrentRow,
      isPrimary, instanceNotInWindow, strictRowOrder, hiPrecedingMs,
      skipNewest)
    exploded.withColumn(outCol, arr)
      .filter(col("__sw_bucket") === ownBucket)
      .drop("__sw_bucket")
  }
}
