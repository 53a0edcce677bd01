package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Storage TTL model — the reference's index expiry configuration and
  * GC semantics (docs/en/openmldb_sql/ddl/CREATE_TABLE_STATEMENT.md
  * "Configuration Rules for TTL and TTL_TYPE";
  * cases/function/ddl/test_ttl.yaml). Four kinds:
  *
  *  - absolute:  expire rows older than `now - absMs`
  *  - latest:    keep only the newest `lat` rows per key
  *  - absandlat: expire only rows that are BOTH old AND beyond `lat`
  *  - absorlat:  expire rows that are old OR beyond `lat`
  *
  * A 0 component is "no bound on that dimension" (its condition never
  * fires). The reference's online store GCs expired data in the
  * background so readers never see it; here the online store is an
  * immutable-snapshot temp view, so expiry is a DataFrame transform
  * applied on write (GC-on-insert) — the same observable behavior.
  * At scale this is one bounded window + one semi-join per insert; a
  * production deployment pushes TTL to the table format's compaction
  * (Delta/Iceberg retention) instead.
  */
object Ttl {

  final case class TtlSpec(kind: String, absMs: Long, lat: Long) {
    /** Whether the expiry predicate can ever fire. */
    def hasBound: Boolean = kind match {
      case "absolute"  => absMs > 0
      case "latest"    => lat > 0
      case "absandlat" => absMs > 0 && lat > 0
      case "absorlat"  => absMs > 0 || lat > 0
      case _           => false
    }
  }

  private val timeRe = "^(\\d+)(s|m|min|h|d)$".r
  private val kinds = Set("absolute", "latest", "absandlat", "absorlat")

  private def timeMs(s: String): Long = s.toLowerCase match {
    case timeRe(n, u) =>
      val unit = u match {
        case "s" => 1000L
        case "m" | "min" => 60000L
        case "h" => 3600000L
        case "d" => 86400000L
      }
      n.toLong * unit
    case other => throw new IllegalArgumentException(
      s"TTL time value '$other' must be an integer with a unit (s/m/h/d)")
  }

  private def countOf(s: String): Long =
    if (s.nonEmpty && s.forall(_.isDigit)) s.toLong
    else throw new IllegalArgumentException(
      s"TTL latest value '$s' must be a bare integer (no unit)")

  // the reference's configurable maxima (CREATE_TABLE_STATEMENT.md:
  // latest up to 1000; absolute up to 15768000m)
  private val maxAbsMs = 15768000L * 60000L
  private val maxLat = 1000L

  /** Parse + validate a TTL value as written in an INDEX(...) clause:
    * `3650d`, `0m`, `(3650m)`, `100`, `(10)`, `(10m,10)`. Kind rules
    * (test_ttl.yaml): absolute takes one time-with-unit; latest takes
    * one bare count <= 1000; absandlat/absorlat take a
    * (time-with-unit, count) 2-tuple in that order. */
  def parse(value: String, kindRaw: Option[String]): TtlSpec = {
    val kind = kindRaw.map(_.trim.toLowerCase).getOrElse("absolute")
    if (!kinds(kind)) throw new IllegalArgumentException(
      s"unknown TTL_TYPE '${kindRaw.getOrElse("")}'")
    val v = value.trim
    val inner = if (v.startsWith("(") && v.endsWith(")"))
      v.substring(1, v.length - 1) else v
    val parts = inner.split(",").map(_.trim).toSeq
    def one(): String = {
      if (parts.length != 1) throw new IllegalArgumentException(
        s"TTL '$value' must be a single value for ttl_type=$kind")
      parts.head
    }
    val spec = kind match {
      case "absolute" => TtlSpec(kind, timeMs(one()), 0)
      case "latest"   => TtlSpec(kind, 0, countOf(one()))
      case _ =>
        if (parts.length != 2) throw new IllegalArgumentException(
          s"TTL '$value' must be a (time, count) 2-tuple for ttl_type=$kind")
        TtlSpec(kind, timeMs(parts(0)), countOf(parts(1)))
    }
    if (spec.absMs > maxAbsMs) throw new IllegalArgumentException(
      s"TTL time exceeds the ${maxAbsMs / 60000L}m maximum")
    if (spec.lat > maxLat) throw new IllegalArgumentException(
      s"TTL latest count exceeds the $maxLat maximum")
    spec
  }

  /** Apply index expiry to a snapshot. `indexes` are
    * (key columns, ts column, spec); a row survives if ANY index
    * retains it (each reference index keeps its own row copies), so an
    * index with no effective bound retains everything. Insertion order
    * breaks ts ties: the later row is "newer". */
  def expire(df: DataFrame,
      indexes: Seq[(Seq[String], String, TtlSpec)],
      nowMs: Long): DataFrame = {
    if (indexes.isEmpty || indexes.exists(!_._3.hasBound)) return df
    val uid = "__ttl_uid"
    val rn = "__ttl_rn"
    val tagged = df.withColumn(uid, monotonically_increasing_id())
    def msCol(c: String): Column =
      if (df.schema.fields.exists(f =>
        f.name.equalsIgnoreCase(c) && f.dataType == TimestampType))
        unix_millis(col(c))
      else col(c).cast("long")
    val kept = indexes.map { case (keys, ts, spec) =>
      // an index may have no ts column ("null" — fz_ddl corpus
      // index1:reqId:null:1:latest): latest ranks by insertion order
      // alone and time-based expiry cannot fire
      val hasTs = ts.nonEmpty && !ts.equalsIgnoreCase("null")
      val ord = (if (hasTs) Seq(col(ts).desc) else Seq.empty) :+
        col(uid).desc
      val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      val withRn = if (spec.lat > 0)
        tagged.withColumn(rn, row_number().over(w)) else tagged
      val condLat: Column =
        if (spec.lat > 0) col(rn) > lit(spec.lat) else lit(false)
      val condAbs: Column =
        if (hasTs && spec.absMs > 0) msCol(ts) < lit(nowMs - spec.absMs)
        else lit(false)
      val expired = spec.kind match {
        case "absolute"  => condAbs
        case "latest"    => condLat
        case "absandlat" => condAbs && condLat
        case "absorlat"  => condAbs || condLat
      }
      // null ts never expires (null comparisons must not drop the row)
      withRn.filter(!coalesce(expired, lit(false))).select(col(uid))
    }.reduce(_ union _).distinct()
    tagged.join(kept, Seq(uid), "left_semi").drop(uid)
  }
}
