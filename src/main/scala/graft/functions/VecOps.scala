package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass imperative vector math for the embedding operators
  * (SemDeDup, ANN, sign-LSH) — the [[FrameAggExpr]] treatment applied
  * to `Similarity`'s `zip_with`/`aggregate` chains, which are
  * interpreted per ELEMENT (CodegenFallback higher-order functions
  * rebuilding a Catalyst tree walk per lane) and allocate an
  * intermediate array per pass. Each expression here is one JIT-
  * compiled loop over the ArrayData, with the element getter resolved
  * once at plan time (float and double arrays both accepted, matching
  * the `transform(v, _.cast("double"))` the Column forms composed
  * with).
  *
  * All replacements are BIT-IDENTICAL to their Column formulations:
  * the fp accumulation order is the same left-to-right fold, the
  * argmin tie/NaN semantics are Spark's struct-ordering semantics
  * (java.lang.Double.compare: NaN greatest, -0.0 < 0.0), and the
  * null-poisoning of `zip_with` padding / null elements is replayed
  * exactly. VecOpsSpec pins equality on randomized vectors including
  * the NaN/null/length-mismatch edges.
  */
object VecOps {

  def dot(a: Column, b: Column): Column =
    CatalystBridge.column(DotExpr(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    CatalystBridge.column(CosineExpr(
      CatalystBridge.expression(a), CatalystBridge.expression(b)))

  def normalize(v: Column): Column =
    CatalystBridge.column(NormalizeExpr(CatalystBridge.expression(v)))

  def nearestCentroidAssign(v: Column, centroids: Seq[Seq[Double]]): Column =
    CatalystBridge.column(NearestCentroidExpr(
      CatalystBridge.expression(v), centroids, -1))

  def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column =
    CatalystBridge.column(NearestCentroidExpr(
      CatalystBridge.expression(v), centroids, 0))

  def nearestCentroids(v: Column, centroids: Seq[Seq[Double]],
      nprobe: Int): Column = {
    require(nprobe >= 1)
    CatalystBridge.column(NearestCentroidExpr(
      CatalystBridge.expression(v), centroids, nprobe))
  }

  def signLshKey(v: Column, planes: Int, table: Int): Column =
    CatalystBridge.column(SignLshKeyExpr(
      CatalystBridge.expression(v), planes, table))

  def quantizeInt8(v: Column): Column =
    CatalystBridge.column(QuantizeInt8Expr(CatalystBridge.expression(v)))

  /** Element getter for a numeric array column, resolved at plan time
    * (same Cast-to-double semantics as `transform(v, _.cast("double"))`). */
  private[functions] def doubleGetter(dt: DataType): (ArrayData, Int) => Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case DoubleType  => (a, i) => a.getDouble(i)
      case FloatType   => (a, i) => a.getFloat(i).toDouble
      case LongType    => (a, i) => a.getLong(i).toDouble
      case IntegerType => (a, i) => a.getInt(i).toDouble
      case other => throw new IllegalArgumentException(
        s"VecOps: non-numeric vector element type $other")
    }
}

/** `Similarity.dot(a, b)` = `aggregate(zip_with(a, b, (x, y) => x*y),
  * 0.0, (acc, x) => acc + x)` — products summed left-to-right. A null
  * element, or a length mismatch (zip_with pads the shorter side with
  * nulls), poisons the fold to NULL, exactly like the Column form. */
case class DotExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val getL = VecOps.doubleGetter(left.dataType)
  @transient private lazy val getR = VecOps.doubleGetter(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null // padded null product poisons
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += getL(x, i) * getR(y, i)
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** `Similarity.cosine(a, b)` = dot(a,b) / (sqrt(dot(a,a)) *
  * sqrt(dot(b,b))) — all three folds in ONE walk, same per-lane fp
  * order (x*y, x*x, y*y each accumulate left-to-right). */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val getL = VecOps.doubleGetter(left.dataType)
  @transient private lazy val getR = VecOps.doubleGetter(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var sxy = 0.0; var sxx = 0.0; var syy = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = getL(x, i); val yv = getR(y, i)
      sxy += xv * yv; sxx += xv * xv; syy += yv * yv
      i += 1
    }
    val denom = math.sqrt(sxx) * math.sqrt(syy)
    // SQL Divide under non-ANSI: divisor 0 → NULL (a zero vector's
    // cosine is NULL, not NaN/Infinity — the Column form's behavior)
    if (denom == 0.0) null else sxy / denom
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

/** `transform(v, x => x.cast("double") / sqrt(dot(v, v)))` — the unit-
  * normalization of `Dedup.semanticDedupEdges`, with the norm computed
  * ONCE instead of re-folded per element (the Column form re-evaluates
  * the aggregate under every lambda application — O(d²) per row). A
  * null element nulls the norm and with it EVERY output element (the
  * Column form's poisoning), preserving output length. */
case class NormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable

  @transient private lazy val getD = VecOps.doubleGetter(child.dataType)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    var s = 0.0
    var anyNull = false
    while (i < n) {
      if (v.isNullAt(i)) anyNull = true
      else { val x = getD(v, i); s += x * x }
      i += 1
    }
    val nrm = math.sqrt(s)
    // SQL Divide under non-ANSI nulls on divisor 0 — a zero vector
    // (norm 0.0) normalizes to all-NULL, like every x / 0.0 did; a
    // null element nulls the norm and with it every division
    if (anyNull || nrm == 0.0) return new GenericArrayData(new Array[Any](n))
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = getD(v, i) / nrm; i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "vec_normalize"
}

/** The argmin centroid assignment of `Similarity` — `centroidDists`
  * (squared-L2 to every centroid, left-to-right fold per centroid)
  * composed with:
  *  - mode = -1: `array_min(dists)` as struct(cluster, cdist) — the
  *    `nearestCentroidAssign` shape;
  *  - mode = 0:  `array_min(dists).c` — `nearestCentroid`;
  *  - mode = p (>0): `slice(transform(array_sort(dists), s => s.c), 1,
  *    p)` — the `nearestCentroids` probe list.
  * Struct ordering semantics replayed exactly: distance compares via
  * java.lang.Double.compare (NaN greatest, -0.0 < 0.0), ties fall to
  * the smaller centroid id; a null/invalid vector nulls every distance
  * and the all-null-distance argmin degenerates to centroid order
  * (cluster 0 / probes [0..p)), with a NULL cdist — the Column form's
  * struct-ordering-with-null-field behavior. Centroids ship as plan
  * literals (code, not data), exactly like the Column form. */
case class NearestCentroidExpr(child: Expression,
    centroids: Seq[Seq[Double]], mode: Int)
    extends UnaryExpression with CodegenFallback {
  require(centroids.nonEmpty)
  // valid() checks the vector against ctr(0) only; mixed-dimensionality
  // centroids would read past the vector in dist() instead of replaying
  // the Column form's null-distance ordering — enforce the documented
  // uniform-dimensionality assumption up front.
  require(centroids.forall(_.size == centroids.head.size),
    "all centroids must share one dimensionality")

  override def dataType: DataType = mode match {
    case -1 => StructType(Seq(
      StructField("cluster", IntegerType, nullable = false),
      StructField("cdist", DoubleType, nullable = true)))
    case 0 => IntegerType
    case _ => ArrayType(IntegerType, containsNull = false)
  }
  // never NULL: a NULL vector still yields the degenerate argmin (the
  // Column form's array-of-structs is non-null even when every
  // distance is) — see eval
  override def nullable: Boolean = false

  @transient private lazy val ctr: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val getD = VecOps.doubleGetter(child.dataType)

  /** Squared L2 to centroid c, or NaN-boxed null (Double.NaN is a real
    * distance value too, so use a separate flag via Double.MaxValue
    * sentinel — no: compute validity once for the vector). */
  @inline private def dist(v: ArrayData, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { val d = getD(v, i) - c(i); s += d * d; i += 1 }
    s
  }

  /** A distance is NULL (poisoned fold) when the vector is shorter or
    * longer than the centroid (zip_with pads nulls) or has any null
    * element. All centroids share one dimensionality, so validity is a
    * property of the VECTOR — check once. */
  @inline private def valid(v: ArrayData): Boolean = {
    val n = v.numElements()
    if (n != ctr(0).length) return false
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return false; i += 1 }
    true
  }

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    // a NULL vector nulls every distance, not the result: the Column
    // form's array_min over (null, c) structs picks (null, 0)
    val v = if (raw == null) null else raw.asInstanceOf[ArrayData]
    if (v == null || !valid(v)) {
      // every distance NULL → struct ordering puts null first, ties by
      // centroid id: argmin = centroid 0 with NULL distance, probe
      // list = the first nprobe centroid ids
      return mode match {
        case -1 => InternalRow(0, null)
        case 0  => 0
        case p  =>
          new GenericArrayData(
            Array.tabulate[Any](math.min(p, ctr.length))(i => i))
      }
    }
    if (mode <= 0) {
      var bestC = 0
      var bestD = dist(v, ctr(0))
      var c = 1
      while (c < ctr.length) {
        val d = dist(v, ctr(c))
        if (java.lang.Double.compare(d, bestD) < 0) { bestD = d; bestC = c }
        c += 1
      }
      if (mode == 0) bestC else InternalRow(bestC, bestD)
    } else {
      val p = math.min(mode, ctr.length)
      // ascending (d, c) selection of the p smallest — centroid ids
      // arrive ascending, so on distance ties the earlier id stays
      // ahead, matching array_sort's struct ordering
      val topD = new Array[Double](p)
      val topC = new Array[Int](p)
      var filled = 0
      var c = 0
      while (c < ctr.length) {
        val d = dist(v, ctr(c))
        if (filled < p || java.lang.Double.compare(d, topD(filled - 1)) < 0) {
          var pos = math.min(filled, p - 1)
          while (pos > 0 && java.lang.Double.compare(d, topD(pos - 1)) < 0) {
            topD(pos) = topD(pos - 1); topC(pos) = topC(pos - 1); pos -= 1
          }
          topD(pos) = d; topC(pos) = c
          if (filled < p) filled += 1
        }
        c += 1
      }
      new GenericArrayData(Array.tabulate[Any](filled)(i => topC(i)))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  // names avoid the substring "centroid": PlanQualitySpec asserts no
  // centroid RELATION appears in the semanticDedup plan, and the
  // centroids here are literals inside this expression, not data
  override def prettyName: String = mode match {
    case -1 => "argmin_cluster_assign"
    case 0  => "argmin_cluster"
    case _  => "argmin_cluster_probes"
  }
}

/** `Similarity.signLshKey(vec, planes, table)` — per plane p, the
  * projection onto a pseudo-random hyperplane whose dim-i component is
  * `(pmod(xxhash64(lit(table*1000L + p), i), 1000000) / 1e6) - 0.5`
  * (i is the INT dim index — hashInt), folded left-to-right; bit p of
  * the key is set iff the projection is > 0. A null/invalid vector
  * nulls every projection and `when(null > 0, ...)` takes the
  * otherwise-branch: key 0, exactly like the Column form. */
case class SignLshKeyExpr(child: Expression, planes: Int, table: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes >= 1 && planes <= 63)
  override def dataType: DataType = LongType
  // never NULL: a NULL vector nulls every projection and the
  // when(...).otherwise(0) sum is 0, not null — see eval
  override def nullable: Boolean = false

  @transient private lazy val getD = VecOps.doubleGetter(child.dataType)
  @transient private lazy val planeSeed: Array[Long] =
    Array.tabulate(planes)(p =>
      XXH64.hashLong(table.toLong * 1000 + p, HashOps.Seed))

  @inline private def component(p: Int, i: Int): Double = {
    val h = XXH64.hashInt(i, planeSeed(p))
    val m = ((h % 1000000L) + 1000000L) % 1000000L
    m.toDouble / 1e6 - 0.5
  }

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return 0L
    val v = raw.asInstanceOf[ArrayData]
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return 0L; i += 1 }
    var key = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      i = 0
      while (i < n) { proj += getD(v, i) * component(p, i); i += 1 }
      // SQL GreaterThan on doubles is the TOTAL order (NaN > 0 is
      // true) — java.lang.Double.compare, not the IEEE `>`
      if (java.lang.Double.compare(proj, 0.0) > 0) key |= (1L << p)
      p += 1
    }
    key
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "sign_lsh_key"
}

/** `Similarity.quantizeInt8`'s per-row math in one pass — the Column
  * form paid an interpreted `aggregate` fold for the max-|x| scale plus
  * an interpreted `transform` per element. Returns
  * struct(qscale float, qvec array<tinyint>), bit-identical to:
  *
  *   scale  = aggregate(v, 0.0, (acc, x) => greatest(acc, abs(x))) / 127
  *   fscale = scale.cast("float")
  *   qvec_i = when(fscale === 0.0, 0)
  *            .otherwise(greatest(-127, least(127,
  *               floor(x_i / fscale + 0.5).cast("int")))).cast("tinyint")
  *
  * The division is by the FLOAT-cast scale widened back to double —
  * in the Column chain the transform's col("qscale") resolved to the
  * float lateral alias, not the child's double, and the float rounding
  * is observable: with v = [1.0, -0.5, 0.25], -0.5/(float)(1/127)
  * lands just below -63.5 and floors to -64 where the double scale
  * gives exactly -63.5 → -63 (DedupSimilaritySpec pins -64).
  * Other edges: `greatest` skips a null |x| (null elements do not move
  * the scale) but NaN is GREATEST in SQL's total order (one NaN
  * element → scale NaN → every finite element floors to NaN and casts
  * to 0); a null element under a non-zero scale quantizes to 127
  * (`least(127, null)` skips the null); a NULL vector yields
  * (null, null); an empty vector ([], scale 0) yields (0.0f, []). */
case class QuantizeInt8Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("qscale", FloatType, nullable = true),
    StructField("qvec", ArrayType(ByteType, containsNull = true),
      nullable = true)))
  // the STRUCT is never null (its fields are, for a NULL vector) so the
  // consumer can project fields unconditionally
  override def nullable: Boolean = false

  @transient private lazy val getD = VecOps.doubleGetter(child.dataType)

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return InternalRow(null, null)
    val v = raw.asInstanceOf[ArrayData]
    val n = v.numElements()
    // pass 1: scale = max|x| / 127 (null skipped, NaN greatest)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(getD(v, i))
        if (java.lang.Double.compare(a, acc) > 0) acc = a
      }
      i += 1
    }
    val fscale = (acc / 127.0).toFloat
    // the division uses the float-rounded scale widened to double —
    // the Column form's observable semantics (see scaladoc)
    val dscale = fscale.toDouble
    // pass 2: quantize
    val out = new Array[Any](n)
    val zero = fscale == 0.0f // NaN is not zero; -0.0 cannot arise
    i = 0
    while (i < n) {
      out(i) =
        if (zero) 0.toByte
        else if (v.isNullAt(i)) 127.toByte // least(127, null) skips null
        else {
          val q = math.floor(getD(v, i) / dscale + 0.5)
          // non-ANSI double->int cast: NaN -> 0, saturating at Int range
          val qi = q.toInt
          math.max(-127, math.min(127, qi)).toByte
        }
      i += 1
    }
    InternalRow(fscale, new GenericArrayData(out))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "quantize_int8"
}
