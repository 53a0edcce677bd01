package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch request mode: point-in-time-correct feature computation for a
  * set of request rows against history tables — the reference's
  * training-data generation semantics (sql_compiler.cc:173
  * BuildBatchRequestModePhysicalPlan; RequestUnionRunner,
  * runner.cc:1984-2123).
  *
  * Each request row's window frame is the union of {history rows of the
  * same key whose ts lies in the frame ending at the request ts} and
  * the request row itself — other request rows never leak into the
  * frame (physical_op.h:1504 PhysicalRequestUnionNode).
  *
  * Spark formulation: union history+requests with a provenance flag,
  * one shuffle on the partition keys, frame assembly via
  * [[WindowOps.frameArray]] with `instanceNotInWindow` semantics
  * (frame = non-request rows + the current row), output filtered to
  * request rows. Scales like any window: partition by key, no
  * per-request recomputation of history.
  */
object RequestMode {

  val FlagCol = "__graft_is_request"

  /** Union requests with history, tagging request provenance. Columns
    * are aligned by name; history-only columns become null on request
    * rows and vice versa. */
  def unionWithHistory(requests: DataFrame, history: DataFrame): DataFrame =
    requests.withColumn(FlagCol, lit(true))
      .unionByName(history.withColumn(FlagCol, lit(false)),
        allowMissingColumns = true)

  /** Request/history split of ONE source — row-equivalent to
    * `unionWithHistory(df.filter(cond), df.filter(!cond))` without
    * scanning the source twice (the filter+union form reads the
    * parquet twice and re-unions; training-data generation virtually
    * always derives both sides from the same event log). Deviation for
    * a NULL condition: these rows stay available as frame HISTORY,
    * where the filter+union form would drop them from both sides. */
  def tagRequests(events: DataFrame, isRequest: Column): DataFrame =
    events.withColumn(FlagCol, coalesce(isRequest, lit(false)))

  /** Point-in-time frame array of `v` for every request row.
    * Returns the unioned DataFrame (filter on [[FlagCol]] to keep
    * request rows) — compute aggregates over the returned column with
    * WindowOps.aggSum/aggCount/... */
  def pointInTimeFrame(
      union: DataFrame,
      v: Column, tsMs: Column, uid: Column,
      partition: Seq[Column],
      precedingMs: Long,
      maxSize: Int = 0,
      excludeCurrentTime: Boolean = false,
      excludeRequestRow: Boolean = false): Column =
    WindowOps.frameArray(v, tsMs, uid, partition, precedingMs,
      maxSize = maxSize,
      excludeCurrentTime = excludeCurrentTime,
      excludeCurrentRow = excludeRequestRow,
      isPrimary = col(FlagCol),
      instanceNotInWindow = true)
}
