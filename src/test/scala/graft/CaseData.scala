package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.cases.CaseInput

/** Shared reference-corpus data building: column-decl parsing and cell
  * coercion for the yaml cases' `columns`/`rows` blocks, used by
  * [[YamlCaseRunnerSpec]] and [[TrainServeConsistencySpec]]. */
object CaseData {

  def typOpt(t: String): Option[DataType] = t.toLowerCase match {
    case "int" | "int32" | "i32"      => Some(IntegerType)
    case "smallint" | "int16" | "i16" => Some(ShortType)
    case "bigint" | "int64" | "i64" | "long" => Some(LongType)
    case "float"                      => Some(FloatType)
    case "double"                     => Some(DoubleType)
    case "string" | "varchar"         => Some(StringType)
    case "timestamp"                  => Some(TimestampType)
    case "date"                       => Some(DateType)
    case "bool" | "boolean"           => Some(BooleanType)
    case _                            => None
  }
  def typ(t: String): DataType = typOpt(t).getOrElse(
    throw new IllegalArgumentException(s"unsupported column type '$t'"))

  /** "name type[ NOT NULL]" → tokens with the nullability suffix
    * stripped (ddl corpus decls like "id int not null"). */
  def declParts(cdef: String): Array[String] =
    cdef.trim.replaceAll("(?i)\\s+not\\s+null\\s*$", "").split("[:\\s]+")

  def tsToMs(s: String): Long =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  /** TIMESTAMP wall-clock literals are pinned to the reference's GMT+8
    * (date_and_time_types.md:10-14). */
  def tsToMs8(s: String): Long =
    java.time.LocalDateTime.parse(s.trim.replace(' ', 'T'))
      .toInstant(java.time.ZoneOffset.ofHours(8)).toEpochMilli

  def num(v: Any): Number = v match {
    case n: Number => n
    case s: String => java.lang.Double.valueOf(s.trim) // data-block cell
  }

  /** "{currentTime}" / "{currentTime}-600001" rows (data_expiration,
    * test_create_index): wall-clock-relative epoch ms, resolved at
    * build time like the reference harness does. */
  def currentTimeMs(s: String): Option[Long] = {
    val t = s.trim
    if (!t.startsWith("{currentTime}")) None
    else {
      val off = t.stripPrefix("{currentTime}").replace(" ", "")
      Some(System.currentTimeMillis() + (if (off.isEmpty) 0L else off.toLong))
    }
  }

  def coerce(v: Any, t: DataType): Any =
    if (v == null) null
    else t match {
      case IntegerType => num(v).intValue
      case ShortType   => num(v).shortValue
      case LongType    => v match {
        case n: Number                         => n.longValue
        case s: String if currentTimeMs(s).isDefined => currentTimeMs(s).get
        case s: String if s.trim.forall(c => c.isDigit || c == '-') =>
          s.trim.toLong
        case s: String                         => tsToMs(s)
      }
      case FloatType   => num(v).floatValue
      case DoubleType  => num(v).doubleValue
      case StringType  => v.toString
      case DateType    => // corpus writes unpadded dates ("2021-1-1")
        java.sql.Date.valueOf(java.time.LocalDate.parse(v.toString,
          java.time.format.DateTimeFormatter.ofPattern("y-M-d")))
      case BooleanType => v match {
        case b: Boolean => b
        case n: Number  => n.longValue != 0 // bool written as 0/1
        case s: String  => s.toBoolean
      }
      case TimestampType => v match {
        case n: Number => new java.sql.Timestamp(n.longValue)
        case s: String if currentTimeMs(s).isDefined =>
          new java.sql.Timestamp(currentTimeMs(s).get)
        case s: String if s.trim.forall(c => c.isDigit || c == '-') =>
          new java.sql.Timestamp(s.trim.toLong)
        case s: String => new java.sql.Timestamp(tsToMs8(s))
      }
    }

  /** Input strings reach the reference through its INSERT literal path,
    * which unescapes backslash sequences once (test_like.yaml id 8:
    * input '\\\%a_b' arrives as '\%a_b'). Expected rows are compared
    * directly and are NOT unescaped. */
  def unescapeIn(s: String): String = {
    val sb = new StringBuilder; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case x   => sb.append(x)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Build a DataFrame from a columns/rows input block. */
  def buildDf(spark: SparkSession, in: CaseInput): DataFrame = {
    val schema = StructType(in.columns.map { cdef =>
      val parts = declParts(cdef) // "c1 int" or "c1:int"
      StructField(parts(0), typ(parts.last))
    })
    val data = Seq.fill(in.repeat)(in.rows).flatten.map(r =>
      Row(r.zip(schema.fields).map { case (v, f) =>
        coerce(v, f.dataType) match {
          case s: String => unescapeIn(s)
          case x         => x
        }
      }: _*))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, math.max(1, math.min(4, data.size))),
      schema)
  }
}
