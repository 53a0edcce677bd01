package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Long-window pre-aggregation: the reference's LongWindowOptimized
  * rewrite (hybridse/src/passes/physical/long_window_optimized.h:29-50;
  * storage aggregators src/storage/aggregator.cc; deploy option
  * `long_windows="w1:1d"`, DEPLOY_STATEMENT.md:100-156).
  *
  * A huge ROWS_RANGE frame (30d of ms-ticks) makes per-row frame scans
  * O(rows-in-frame). The rewrite answers each row from:
  *   head-bucket raw rows  +  Σ full-bucket partials  +  tail-bucket
  *   raw rows up to the current row
  * so per-row work is O(rows-per-bucket + buckets-per-frame).
  *
  * Spark formulation, all shuffles keyed on the partition key:
  *  - [[buildPreAgg]]: one groupBy (key, bucket) → the MV. Incremental
  *    maintenance = re-aggregating only new buckets (append-only data).
  *  - tail: cumulative sum within (key, bucket) — a window with a
  *    constant frame, whole-stage codegen.
  *  - full buckets: an equi-join on key against the MV with a bucket
  *    range predicate, aggregated back per row uid.
  *  - head: probe points (one per row, at the frame's left edge ts)
  *    UNIONED with the raw rows of their head bucket, then ONE
  *    cumulative window over (key, bucket) ordered by ts DESC — each
  *    probe reads the suffix aggregate "raw rows with ts' >= edge" as
  *    a running total. A (key, head-bucket) equi-join against raw rows
  *    (the previous formulation) is O(rows-per-bucket²) per bucket —
  *    every probe row pairs with every raw bucket row before the edge
  *    filter — which measured 0.9 s → 13.9 s from sf0.1 → sf1 (10×
  *    data, ~100× head-join intermediate: ~8M → ~830M pair rows). The
  *    union window is O(rows-per-bucket · log) per bucket and keeps
  *    the whole edge linear in the input at any bucket density.
  */
object LongWindow {

  /** The pre-agg MV: per (key, bucket) partials. */
  def buildPreAgg(df: DataFrame, key: Column, tsMs: Column, v: Column,
      bucketMs: Long): DataFrame =
    df.groupBy(key.as("k"), floor(tsMs / bucketMs).cast("long").as("bucket"))
      .agg(sum(v).as("b_sum"), count(v).as("b_cnt"),
        min(v).as("b_min"), max(v).as("b_max"))

  /** Incremental MV maintenance — the reference's ingest-time
    * aggregator semantics (src/storage/aggregator.cc: per-(key, bucket)
    * running partials updated per PUT, replayed from the binlog tail on
    * restart) in batch form. Aggregate ONLY the appended slice (one
    * shuffle of the slice, never the history) and merge partials into
    * the existing MV by (k, bucket): sums and counts add, min/max
    * combine — a commutative-monoid merge, so a slice touching an OLD
    * bucket (out-of-order arrival) folds in just as correctly as the
    * steady-state newest-bucket append. Update cost is O(appended) +
    * one merge join of the MV keyed on the same k the serving joins
    * use; at 100 TB the MV lives partitioned by k and the merge is the
    * only full-MV pass — the raw history is never re-read. Equality
    * with a from-scratch [[buildPreAgg]] (modulo fp association, which
    * the serving-side round() absorbs) is pinned by LongWindowSpec and
    * the q_long_window_inc oracle row. */
  def updatePreAgg(preAgg: DataFrame, appended: DataFrame,
      key: Column, tsMs: Column, v: Column, bucketMs: Long): DataFrame = {
    val delta = buildPreAgg(appended, key, tsMs, v, bucketMs)
      .select(col("k"), col("bucket"),
        col("b_sum").as("__d_sum"), col("b_cnt").as("__d_cnt"),
        col("b_min").as("__d_min"), col("b_max").as("__d_max"))
    // null-safe partial add: a bucket whose every v is NULL carries a
    // NULL sum with a 0 count — the merged sum must stay NULL unless
    // the other side contributes one (coalesce-to-0 would turn it
    // into 0.0 and diverge from the full rebuild's schema semantics)
    def addPartial(a: String, b: String) =
      when(col(b).isNull, col(a)).when(col(a).isNull, col(b))
        .otherwise(col(a) + col(b))
    preAgg.join(delta, Seq("k", "bucket"), "full_outer")
      .select(col("k"), col("bucket"),
        addPartial("b_sum", "__d_sum").as("b_sum"),
        (coalesce(col("b_cnt"), lit(0L)) +
          coalesce(col("__d_cnt"), lit(0L))).as("b_cnt"),
        least(col("b_min"), col("__d_min")).as("b_min"),
        greatest(col("b_max"), col("__d_max")).as("b_max"))
  }

  /** sum/count/min/max of `v` over `ROWS_RANGE precedingMs PRECEDING`
    * answered via the MV (the reference pre-aggregates exactly these —
    * src/storage/aggregator.h:121-278). `uid` must be unique per row.
    * Returns the input rows plus `lw_sum`, `lw_cnt`, `lw_min`, `lw_max`
    * (least/greatest skip null partials from absent edge groups). */
  def sumCountOverLongWindow(df: DataFrame, preAgg: DataFrame,
      key: Column, tsMs: Column, v: Column, uid: Column,
      precedingMs: Long, bucketMs: Long): DataFrame = {
    // a "long" window spans at least one full bucket; this also
    // guarantees the frame start never lands inside the row's own
    // bucket, so the tail cum-window never overcounts
    require(precedingMs >= bucketMs,
      s"long window requires precedingMs ($precedingMs) >= bucketMs ($bucketMs)")
    val hb = floor(tsMs / bucketMs).cast("long")         // row's bucket
    val lb = floor((tsMs - precedingMs) / bucketMs).cast("long") // frame-start bucket

    // tail: rows in the row's own bucket with ts' <= ts — cumulative
    // window inside (key, bucket); same-ts peers included (RANGE).
    // The spec partitions on the MATERIALIZED __hb column and all four
    // aggregates land in one projection: window specs built from a
    // fresh `hb` expression instance per aggregate analyze to distinct
    // bucket attributes, which defeats Spark's window fusion and plans
    // an exchange+sort PER AGGREGATE (observed: two full
    // hash(key, bucket) exchanges for sum+count at sf0.1).
    val withBuckets = df.withColumn("__hb", hb).withColumn("__lb", lb)
    val wTail = Window.partitionBy(key, col("__hb")).orderBy(tsMs)
      .rangeBetween(Window.unboundedPreceding, 0)
    val base = withBuckets.withColumns(Map(
      "__tail_sum" -> sum(v).over(wTail),
      "__tail_cnt" -> count(v).over(wTail),
      "__tail_min" -> min(v).over(wTail),
      "__tail_max" -> max(v).over(wTail)))

    // full buckets strictly between lb and hb. Per-row cost is
    // O(buckets-per-frame); size bucketMs so frames span ≲100 buckets.
    // A per-key PREFIX sum over the MV (full-range = prefix[hb-1] −
    // prefix[lb], O(1) per row) was considered and rejected: the
    // subtraction carries the ulp of the whole-partition running sum
    // (not of the frame sum), a float-cancellation error class the
    // round-to-3 hash oracle can flip on; direct summation of the
    // frame's bucket partials keeps the association the reference's
    // aggregator uses (src/storage/aggregator.cc).
    val fullJoin = base.select(uid.as("__uid"), key.as("__k"),
        col("__hb"), col("__lb"))
      .join(preAgg,
        col("__k") === col("k") &&
          col("bucket") > col("__lb") && col("bucket") < col("__hb"))
      .groupBy(col("__uid"))
      .agg(sum(col("b_sum")).as("__full_sum"), sum(col("b_cnt")).as("__full_cnt"),
        min(col("b_min")).as("__full_min"), max(col("b_max")).as("__full_max"))

    // head bucket (lb): raw rows with ts' >= ts - precedingMs, only
    // when the head bucket differs from the row's own bucket. One
    // probe point per row at the frame's left edge, unioned with the
    // bucket's raw rows; a DESC cumulative window hands each probe the
    // suffix aggregate of the raws at or after its edge (ties sort
    // raw-first so an exactly-on-edge raw row is included). Linear in
    // rows-per-bucket — see the class doc for the quadratic join this
    // replaces.
    val vType = df.select(v.as("__v")).schema.head.dataType
    val uidType = df.select(uid.as("__uid")).schema.head.dataType
    val probes = withBuckets
      .filter(col("__lb") < col("__hb"))
      .select(uid.as("__uid"), key.as("__k"), col("__lb").as("__b"),
        (tsMs - precedingMs).as("__t"), lit(1).as("__p"),
        lit(null).cast(vType).as("__v"))
    val raws = df.select(lit(null).cast(uidType).as("__uid"), key.as("__k"),
        floor(tsMs / bucketMs).cast("long").as("__b"), tsMs.as("__t"),
        lit(0).as("__p"), v.as("__v"))
    val wHead = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__t").desc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val rv = when(col("__p") === 0, col("__v"))
    val headJoin = probes.unionByName(raws)
      .withColumns(Map(
        "__head_sum" -> sum(rv).over(wHead),
        "__head_cnt" -> count(rv).over(wHead),
        "__head_min" -> min(rv).over(wHead),
        "__head_max" -> max(rv).over(wHead)))
      .filter(col("__p") === 1)
      .select(col("__uid"), col("__head_sum"), col("__head_cnt"),
        col("__head_min"), col("__head_max"))

    base
      .join(fullJoin, uid === col("__uid"), "left").drop("__uid")
      .join(headJoin, uid === col("__uid"), "left").drop("__uid")
      .withColumn("lw_sum",
        coalesce(col("__tail_sum"), lit(0.0)) +
          coalesce(col("__full_sum"), lit(0.0)) +
          coalesce(col("__head_sum"), lit(0.0)))
      .withColumn("lw_cnt",
        coalesce(col("__tail_cnt"), lit(0L)) +
          coalesce(col("__full_cnt"), lit(0L)) +
          coalesce(col("__head_cnt"), lit(0L)))
      .withColumn("lw_min",
        least(col("__tail_min"), col("__full_min"), col("__head_min")))
      .withColumn("lw_max",
        greatest(col("__tail_max"), col("__full_max"), col("__head_max")))
      .drop("__hb", "__lb", "__tail_sum", "__tail_cnt", "__tail_min",
        "__tail_max", "__full_sum", "__full_cnt", "__full_min", "__full_max",
        "__head_sum", "__head_cnt", "__head_min", "__head_max")
  }
}
