package graft.functions

import org.apache.spark.sql.{Column, GraftColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** One-pass imperative scorer over a collected window frame array —
  * the scale-safe replacement for per-element Catalyst higher-order
  * lambdas (`aggregate`/`filter`/`transform`), which are interpreted,
  * rebuild expression state per ELEMENT, and are the JIT-hostile cost
  * center of the MAXSIZE/EXCLUDE/UNION window path (the reference
  * scores each frame with one C-level walk over its HistoryWindow
  * buffer, hybridse/include/vm/mem_catalog.h:344; this is the JVM
  * analog: one monomorphic loop over the ArrayData, type dispatch
  * resolved ONCE at plan time).
  *
  * Input: `array<struct<..., v: T>>` — the frame-entry shape
  * [[graft.operators.WindowOps.frameArray]] produces (full
  * `(ts,uid,flag,v)` or the narrowed `(ts,v)`). When `vField` is set,
  * `v` is a struct and the aggregate reads `v.<vField>` — this lets
  * the SQL planner score a SHARED multi-aggregate frame without the
  * per-aggregate interpreted `transform` that used to deep-copy the
  * array once per aggregate.
  *
  * Functions (matching the frame-array agg helpers bit-for-bit,
  * including double accumulation ORDER — newest-first array order):
  *  - `sum_double`: Σ v as double, NULL on empty/all-null frame
  *  - `sum_long`: exact integral Σ in a native long; Java two's
  *    complement overflow IS the reference's 2^64 wraparound
  *    (the old Decimal(38,0) + wrapToLongRange pair, one pass)
  *  - `count`: non-null count (0 on empty)
  *  - `avg`: sum_double / count, NULL when count = 0
  *  - `min` / `max`: null-skipping, NULL on empty/all-null
  *  - `dcount_null`: distinct count, NULL COUNTS as a distinct value
  *    (reference distinct_count, test_udaf_function.yaml id 5 row 4)
  *  - `dcount`: distinct count over non-null values only
  *
  * Evaluated via CodegenFallback: the surrounding projection stays
  * whole-stage-codegen'd and calls this eval once per ROW; the loop
  * body is plain JIT-compiled Scala, not interpreted Catalyst.
  */
case class FrameAggExpr(child: Expression, fn: String,
    vField: Option[String]) extends UnaryExpression with CodegenFallback {

  @transient private lazy val entryType: StructType =
    child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
  @transient private lazy val entryLen: Int = entryType.length
  @transient private lazy val vOrd: Int = entryType.fieldIndex("v")
  @transient private lazy val vType: DataType = entryType(vOrd).dataType
  @transient private lazy val valOrd: Int = vField match {
    case Some(f) => vType.asInstanceOf[StructType].fieldIndex(f)
    case None    => vOrd
  }
  @transient private lazy val valType: DataType = vField match {
    case Some(f) =>
      val st = vType.asInstanceOf[StructType]
      st(st.fieldIndex(f)).dataType
    case None => vType
  }
  @transient private lazy val vStructLen: Int = vField match {
    case Some(_) => vType.asInstanceOf[StructType].length
    case None    => 0
  }

  override def dataType: DataType = fn match {
    case "sum_double" | "avg"                => DoubleType
    case "sum_long" | "count" | "dcount" | "dcount_null" => LongType
    case "min" | "max"                       => valType
    case other => throw new IllegalArgumentException(
      s"FrameAggExpr: unknown fn '$other'")
  }
  override def nullable: Boolean = true

  /** The row holding the value (the entry itself, or the nested value
    * struct), or null when the value slot is null at this element. */
  @inline private def valRow(arr: ArrayData, i: Int): InternalRow = {
    val e = arr.getStruct(i, entryLen)
    if (e == null) return null
    if (vField.isEmpty) e
    else if (e.isNullAt(vOrd)) null
    else e.getStruct(vOrd, vStructLen)
  }

  // numeric getter resolved once at plan time — the loop body stays
  // monomorphic (same Cast-to-double semantics as the old
  // `x("v").cast("double")` fold)
  @transient private lazy val getD: (InternalRow, Int) => Double =
    valType match {
      case DoubleType  => (r, o) => r.getDouble(o)
      case FloatType   => (r, o) => r.getFloat(o).toDouble
      case LongType    => (r, o) => r.getLong(o).toDouble
      case IntegerType => (r, o) => r.getInt(o).toDouble
      case ShortType   => (r, o) => r.getShort(o).toDouble
      case ByteType    => (r, o) => r.getByte(o).toDouble
      case BooleanType => (r, o) => if (r.getBoolean(o)) 1.0 else 0.0
      case d: DecimalType =>
        (r, o) => r.getDecimal(o, d.precision, d.scale).toDouble
      case other => throw new IllegalArgumentException(
        s"FrameAggExpr($fn): non-numeric value type $other")
    }

  @transient private lazy val getL: (InternalRow, Int) => Long =
    valType match {
      case LongType    => (r, o) => r.getLong(o)
      case IntegerType => (r, o) => r.getInt(o).toLong
      case ShortType   => (r, o) => r.getShort(o).toLong
      case ByteType    => (r, o) => r.getByte(o).toLong
      case BooleanType => (r, o) => if (r.getBoolean(o)) 1L else 0L
      case other => throw new IllegalArgumentException(
        s"FrameAggExpr(sum_long): non-integral value type $other")
    }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(valType)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    fn match {
      case "sum_double" =>
        var s = 0.0; var any = false; var i = 0
        while (i < n) {
          val r = valRow(arr, i)
          if (r != null && !r.isNullAt(valOrd)) { s += getD(r, valOrd); any = true }
          i += 1
        }
        if (any) s else null
      case "sum_long" =>
        var s = 0L; var any = false; var i = 0
        while (i < n) {
          val r = valRow(arr, i)
          if (r != null && !r.isNullAt(valOrd)) { s += getL(r, valOrd); any = true }
          i += 1
        }
        if (any) s else null
      case "count" =>
        var c = 0L; var i = 0
        while (i < n) {
          val r = valRow(arr, i)
          if (r != null && !r.isNullAt(valOrd)) c += 1L
          i += 1
        }
        c
      case "avg" =>
        var s = 0.0; var c = 0L; var i = 0
        while (i < n) {
          val r = valRow(arr, i)
          if (r != null && !r.isNullAt(valOrd)) { s += getD(r, valOrd); c += 1L }
          i += 1
        }
        if (c > 0L) s / c else null
      case "min" | "max" =>
        val isMin = fn == "min"
        var best: Any = null; var i = 0
        while (i < n) {
          val r = valRow(arr, i)
          if (r != null && !r.isNullAt(valOrd)) {
            val v = r.get(valOrd, valType)
            if (best == null ||
                (if (isMin) ordering.compare(v, best) < 0
                 else ordering.compare(v, best) > 0)) best = v
          }
          i += 1
        }
        best
      case "dcount" | "dcount_null" =>
        val seen = new java.util.HashSet[Any]()
        var sawNull = false; var i = 0
        while (i < n) {
          val r = valRow(arr, i)
          if (r == null || r.isNullAt(valOrd)) sawNull = true
          else seen.add(r.get(valOrd, valType))
          i += 1
        }
        seen.size.toLong +
          (if (fn == "dcount_null" && sawNull) 1L else 0L)
      case other => throw new IllegalArgumentException(
        s"FrameAggExpr: unknown fn '$other'")
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = s"frame_$fn"
}

/** Range-cutoff over a frame array: keep entries with `ts >= minTs`,
  * in one imperative pass (the fast bounded-ROWS path's range bound —
  * replaces the interpreted higher-order `filter` that walked a
  * Catalyst tree per element). Entries are REFERENCED, not copied —
  * same lifetime contract as Catalyst's own ArrayFilter. */
case class FrameCutoffExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  @transient private lazy val entryType: StructType =
    left.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
  @transient private lazy val entryLen: Int = entryType.length
  @transient private lazy val tsOrd: Int = entryType.fieldIndex("ts")
  @transient private lazy val getTs: (InternalRow, Int) => Long =
    entryType(tsOrd).dataType match {
      case LongType    => (r, o) => r.getLong(o)
      case IntegerType => (r, o) => r.getInt(o).toLong
      case other => throw new IllegalArgumentException(
        s"frame_cutoff: ts must be an epoch-ms integral, got $other")
    }

  override def dataType: DataType = left.dataType
  override def nullable: Boolean = left.nullable

  override def nullSafeEval(arrIn: Any, minTsIn: Any): Any = {
    val arr = arrIn.asInstanceOf[ArrayData]
    val minTs = minTsIn.asInstanceOf[Long]
    val n = arr.numElements()
    var keep = 0
    var i = 0
    while (i < n) {
      val e = arr.getStruct(i, entryLen)
      if (e != null && getTs(e, tsOrd) >= minTs) keep += 1
      i += 1
    }
    if (keep == n) return arr
    val out = new Array[Any](keep)
    var j = 0
    i = 0
    while (i < n) {
      val e = arr.getStruct(i, entryLen)
      if (e != null && getTs(e, tsOrd) >= minTs) { out(j) = e; j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "frame_cutoff"
}

/** Column-level face of [[FrameAggExpr]] / [[FrameCutoffExpr]]. */
object FrameAgg {
  def agg(arr: Column, fn: String, vField: Option[String] = None): Column =
    GraftColumns.column(
      FrameAggExpr(GraftColumns.expression(arr), fn, vField))

  def cutoff(arr: Column, minTs: Column): Column =
    GraftColumns.column(FrameCutoffExpr(
      GraftColumns.expression(arr), GraftColumns.expression(minTs)))
}
