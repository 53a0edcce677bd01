package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ML-export feature-signature formatters: `csv`, `libsvm`, `gcformat`
  * over signature-tagged columns (`continuous`, `discrete[, bucket]`,
  * `binary_label`, `multiclass_label`, `regression_label`,
  * `gcformat_index`).
  *
  * Reference: hybridse/src/udf/default_defs/feature_signature_def.cc
  * (signature enum :26-33, GCFormat :213-290, CSV :292-342,
  * LIBSVM :344-430). The reference folds the variadic arguments in an
  * opaque accumulator; here every format is a pure per-row expression
  * fold done at plan-build time — slot numbers are static, so the whole
  * output is one codegen'd `concat`.
  *
  * `discrete` fingerprints with bit-exact FarmHash Fingerprint64 over
  * the reference's typed byte encodings (literal_traits.h
  * to_bytes_ref) — the runtime-dispatching `__graft_farm64_any` UDF
  * picks the encoding by value class, so a double column hashes its
  * 8 little-endian value bytes, not the string "30.0", matching both
  * the reference and this repo's SQL front-end (GraftSql.farmFnFor).
  */
object FeatureSignature {

  sealed trait Sig
  final case class SContinuous(v: Column) extends Sig
  final case class SDiscrete(v: Column, bucket: Long) extends Sig
  final case class SBinaryLabel(v: Column) extends Sig
  final case class SMulticlassLabel(v: Column) extends Sig
  final case class SRegressionLabel(v: Column) extends Sig
  final case class SGCIndex(v: Column) extends Sig

  def continuous(v: Column): Sig = SContinuous(v)
  def discrete(v: Column): Sig = SDiscrete(v, 0L)
  def discrete(v: Column, bucketSize: Long): Sig = SDiscrete(v, bucketSize)
  def binary_label(v: Column): Sig = SBinaryLabel(v)
  def multiclass_label(v: Column): Sig = SMulticlassLabel(v)
  def regression_label(v: Column): Sig = SRegressionLabel(v)
  def gcformat_index(v: Column): Sig = SGCIndex(v)

  /** std::to_string(double): fixed 6 decimals (feature_signature_def.cc
    * format_continuous). Continuous/regression values are doubles. */
  private def fmtCont(v: Column): Column = format_string("%.6f", v.cast("double"))
  private def fmtBinary(v: Column): Column =
    v.cast("boolean").cast("int").cast("string")
  private def fmtMulticlass(v: Column): Column = v.cast("long").cast("string")
  /** Discrete fingerprint: FarmHash over the reference's typed byte
    * encoding, dispatched at runtime by value class (the column's type
    * isn't resolvable at plan time here). Bucketed → unsigned
    * remainder (feature_signature_def.cc Discrete). */
  private def dHash(v: Column, bucket: Long): Column = {
    val h = call_udf("__graft_farm64_any", struct(v))
    if (bucket > 0) call_udf("__graft_umod", h, lit(bucket)) else h
  }

  private def fmtAny(s: Sig): Column = s match {
    case SContinuous(v)      => when(v.isNotNull, fmtCont(v))
    case SDiscrete(v, b)     => when(v.isNotNull, dHash(v, b).cast("string"))
    case SBinaryLabel(v)     => when(v.isNotNull, fmtBinary(v))
    case SMulticlassLabel(v) => when(v.isNotNull, fmtMulticlass(v))
    case SRegressionLabel(v) => when(v.isNotNull, fmtCont(v))
    case SGCIndex(v)         => when(v.isNotNull, v.cast("long").cast("string"))
  }

  /** CSV: every signature is one comma-separated slot in call order;
    * null values leave the slot empty (CSV::Update). */
  def csvFormat(sigs: Sig*): Column =
    concat_ws("", array_join(
      array(sigs.map(s => coalesce(fmtAny(s), lit(""))): _*), ","))

  private def isLabel(s: Sig): Boolean = s match {
    case _: SBinaryLabel | _: SMulticlassLabel | _: SRegressionLabel => true
    case _ => false
  }

  private def labelExpr(sigs: Seq[Sig]): Column =
    sigs.filter(isLabel).foldLeft(lit(null).cast("string")) {
      // each label signature overwrites; null value → empty label
      case (_, s) => coalesce(fmtAny(s), lit(""))
    }

  /** LIBSVM: "label slot:value ..." — continuous features use an
    * incrementing slot id; unbucketed discrete emits "hash:1" (no slot);
    * bucketed discrete emits "(slot+hash%bucket):1" and advances the
    * slot by bucket_size (LIBSVM::Update/UpdateDiscrete). */
  def libsvmFormat(sigs: Sig*): Column = {
    var slot = 1L
    val feats = Seq.newBuilder[Column]
    sigs.foreach {
      case SContinuous(v) =>
        feats += when(v.isNotNull, concat(lit(s"$slot:"), fmtCont(v)))
        slot += 1
      case SDiscrete(v, 0L) =>
        feats += when(v.isNotNull, concat(dHash(v, 0L).cast("string"), lit(":1")))
      case SDiscrete(v, b) =>
        feats += when(v.isNotNull,
          concat((lit(slot) + dHash(v, b)).cast("string"), lit(":1")))
        slot += b
      case _ => () // labels/index carry no feature slot
    }
    val featStr = array_join(array(feats.result(): _*), " ") // nulls skipped
    val label = coalesce(labelExpr(sigs), lit(""))
    when(label =!= "",
      when(featStr =!= "", concat(label, lit(" "), featStr)).otherwise(label))
      .otherwise(featStr)
  }

  /** FarmHash Fingerprint64 of an int64 slot number, computed at
    * plan-build time — bit-identical to the reference's
    * FarmFingerprint(slot_number) (feature_signature_def.cc:222). */
  def hashLongConst(v: Long): Long = FarmHash.ofLong(v)

  /** GCFormat: "label index| slot:hash(slot):value ..." — continuous
    * emits slot:hash64(slot):value, discrete emits slot:hash; both
    * advance the slot (GCFormat::Update/Output). */
  def gcformat(sigs: Sig*): Column = {
    var slot = 1L
    val feats = Seq.newBuilder[Column]
    var idx: Column = lit(null).cast("long")
    sigs.foreach {
      case SContinuous(v) =>
        feats += when(v.isNotNull,
          concat(lit(s"$slot:${hashLongConst(slot)}:"), fmtCont(v)))
        slot += 1
      case SDiscrete(v, b) =>
        feats += when(v.isNotNull,
          concat(lit(s"$slot:"), dHash(v, b).cast("string")))
        slot += 1
      case SGCIndex(v) => idx = when(v.isNotNull, v.cast("long")).otherwise(idx)
      case _ => ()
    }
    val featStr = array_join(array(feats.result(): _*), " ")
    val label = coalesce(labelExpr(sigs), lit(""))
    val idxStr = when(idx.isNotNull && idx >= 0,
      concat(lit(" "), idx.cast("string"))).otherwise(lit(" "))
    concat(label, idxStr, lit("| "), featStr)
  }
}
