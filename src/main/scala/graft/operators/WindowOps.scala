package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** OpenMLDB window semantics on Spark.
  *
  * Plain `ROWS` / `ROWS_RANGE` frames map 1:1 onto Spark's
  * `rowsBetween` / `rangeBetween` over a millisecond-epoch long order
  * key (reference: docs/en/openmldb_sql/dql/WINDOW_CLAUSE.md:5-31,
  * hybridse/include/node/node_enum.h:248-265). The extensions —
  * `MAXSIZE`, `EXCLUDE CURRENT_TIME`, `EXCLUDE CURRENT_ROW`,
  * `WINDOW ... UNION`, `INSTANCE_NOT_IN_WINDOW`
  * (WINDOW_CLAUSE.md:18,219-264; physical_op.h:1137-1186;
  * runner.cc:2036-2047) — have no Spark primitive. We express them as
  * a frame-array pipeline built ONLY from codegen'd built-ins:
  * `collect_list(struct(...)) OVER range-frame` → higher-order
  * `filter`/`slice`/`aggregate`. This stays inside whole-stage codegen
  * (no UDF, no JVM closure per row) and distributes exactly like any
  * window: one shuffle on the partition keys.
  *
  * Scale note: the collected frame array is bounded by the frame span
  * (and MAXSIZE caps it further) — the same working set the reference's
  * `HistoryWindow` buffer holds per row (include/vm/mem_catalog.h:344).
  */
object WindowOps {

  /** ROWS_RANGE frame: range over a millis long order key.
    *
    * KNOWN DEVIATION for tied order keys: Spark's `rangeBetween` (like
    * ANSI RANGE and DuckDB) includes ALL peers of the current order value
    * — including rows that sort after the current row — whereas the
    * reference's HistoryWindow buffer only holds rows at-or-before the
    * current row in partition order (runner.cc:624, mem_catalog.h:344).
    * When exact at-or-before semantics matter under ties, use
    * [[frameArray]] with `strictRowOrder = true` and a unique `uid`
    * consistent with ingestion order. */
  def rowsRange(partition: Seq[Column], orderMs: Column,
      precedingMs: Long, followingMs: Long = 0): WindowSpec =
    Window.partitionBy(partition: _*).orderBy(orderMs)
      .rangeBetween(-precedingMs, followingMs)

  /** ROWS frame with deterministic tie-break columns. */
  def rows(partition: Seq[Column], order: Seq[Column],
      preceding: Int, following: Int = 0): WindowSpec =
    Window.partitionBy(partition: _*).orderBy(order: _*)
      .rowsBetween(-preceding.toLong, following.toLong)

  /** Frame-entry struct: (ts, uid, flag, v). `uid` must be unique per
    * row (used to identify "the current row" among same-ts peers);
    * `flag` marks primary-table rows for WINDOW UNION semantics.
    */
  private def entry(ts: Column, uid: Column, flag: Column, v: Column): Column =
    struct(ts.as("ts"), uid.as("uid"), flag.as("flag"), v.as("v"))

  /** Collect the ROWS_RANGE frame of `v` as an array, newest-first,
    * applying the OpenMLDB window attributes. Returns a Column of
    * array<struct<ts,uid,flag,v>> ready for [[aggSum]] etc.
    *
    * @param primaryOnlyOutput when true (WINDOW UNION INSTANCE_NOT_IN_WINDOW),
    *   frame rows are restricted to NON-primary rows plus the current row.
    */
  def frameArray(
      v: Column, tsMs: Column, uid: Column,
      partition: Seq[Column],
      precedingMs: Long,
      maxSize: Int = 0,
      excludeCurrentTime: Boolean = false,
      excludeCurrentRow: Boolean = false,
      isPrimary: Column = lit(true),
      instanceNotInWindow: Boolean = false,
      strictRowOrder: Boolean = false): Column = {
    val spec = rowsRange(partition, tsMs, precedingMs)
    val arr0 = collect_list(entry(tsMs, uid, isPrimary, v)).over(spec)
    val curTs = tsMs
    val curUid = uid
    var arr = arr0
    if (strictRowOrder)
      // reference ROWS_RANGE: same-ts peers that sort AFTER the current
      // row (by uid = ingestion order) are not yet in the buffer
      arr = filter(arr, x => x("ts") =!= curTs || x("uid") <= curUid)
    if (instanceNotInWindow)
      arr = filter(arr, x => !x("flag") || x("uid") === curUid)
    if (excludeCurrentTime)
      arr = filter(arr, x => x("ts") =!= curTs || x("uid") === curUid)
    if (excludeCurrentRow)
      arr = filter(arr, x => x("uid") =!= curUid)
    // newest first; (ts, uid) is a total order because uid is unique.
    arr = reverse(array_sort(arr))
    if (maxSize > 0) arr = slice(arr, 1, maxSize)
    arr
  }

  /** SUM over a frame array (null values ignored, like SQL SUM). */
  def aggSum(arr: Column): Column =
    when(aggCount(arr) > 0,
      aggregate(filter(arr, x => x("v").isNotNull),
        lit(0.0), (acc, x) => acc + x("v").cast("double")))

  /** COUNT of non-null values. */
  def aggCount(arr: Column): Column =
    size(filter(arr, x => x("v").isNotNull)).cast("long")

  def aggAvg(arr: Column): Column =
    when(aggCount(arr) > 0, aggSum(arr) / aggCount(arr))

  def aggMin(arr: Column): Column =
    array_min(transform(arr, x => x("v")))

  def aggMax(arr: Column): Column =
    array_max(transform(arr, x => x("v")))

  def aggDistinctCount(arr: Column): Column =
    size(array_distinct(transform(filter(arr, x => x("v").isNotNull),
      x => x("v")))).cast("long")

  /** lag/at over the frame buffer: offset n from the newest row
    * (lag(v, 0) = newest = current row when not excluded) —
    * window_functions_def.cc:252 AtList semantics. */
  def aggLag(arr: Column, n: Int): Column =
    when(size(arr) > n, element_at(arr, n + 1)("v"))

  /** first_value = the frame's FIRST (oldest) row's value
    * (corrected post-0.9.0 semantics, window_functions_def.cc:276). */
  def aggFirstValue(arr: Column): Column =
    when(size(arr) > 0, element_at(arr, -1)("v"))

  /** last_value = the frame's LAST (newest) row's value. */
  def aggLastValue(arr: Column): Column =
    when(size(arr) > 0, element_at(arr, 1)("v"))

  /** nth_value_where over a frame array whose `v` entries are
    * `struct(value, cond)`: the idx-th row matching cond, counted from
    * the frame START for idx > 0 and from the frame END for idx < 0;
    * NULL when idx = 0 or there are fewer than |idx| matches
    * (window_functions_def.cc:113-205,342-365 NthValueWhere).
    */
  def aggNthValueWhere(arr: Column, idx: Int): Column = {
    if (idx == 0) lit(null)
    else {
      // arr is newest-first; matches keeps that order
      val matches = filter(arr, x => x("v")("cond"))
      val n = size(matches)
      if (idx > 0) // from frame start = oldest
        when(n >= idx, element_at(matches, -idx)("v")("value"))
      else // from frame end = newest
        when(n >= -idx, element_at(matches, -idx)("v")("value"))
    }
  }

  /** window_split(str, delim): every row's split list, concatenated in
    * frame order (newest first, matching the reference's reverse-ts
    * iteration — feature_zero_def.cc window_split family). Returns
    * array<string>. */
  def aggWindowSplit(arr: Column, delim: String): Column =
    flatten(transform(arr,
      x => graft.functions.GraftScalars.fz_split(x("v"), delim)))

  def aggWindowSplitByKey(arr: Column, delim: String, kvDelim: String): Column =
    flatten(transform(arr,
      x => graft.functions.GraftScalars.fz_split_by_key(x("v"), delim, kvDelim)))

  def aggWindowSplitByValue(arr: Column, delim: String, kvDelim: String): Column =
    flatten(transform(arr,
      x => graft.functions.GraftScalars.fz_split_by_value(x("v"), delim, kvDelim)))

  /** Union the primary table with WINDOW UNION side tables
    * (schema-aligned by name), tagging provenance. Output rows are
    * produced only for primary rows — callers window over the union
    * then `filter(col(flagCol))` (reference:
    * WindowAggPlanUtil.windowUnionTables, WindowAggPlan.scala:72-76).
    */
  def windowUnion(primary: DataFrame, unions: Seq[DataFrame],
      flagCol: String = "__graft_primary"): DataFrame = {
    val p = primary.withColumn(flagCol, lit(true))
    unions.foldLeft(p)((acc, u) =>
      acc.unionByName(u.withColumn(flagCol, lit(false)), allowMissingColumns = true))
  }
}
