package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `Tables.load` must normalize `events.ts` identically for every parquet
  * timestamp encoding a data generator might pick — INT64 TIMESTAMP(NANOS)
  * (read back as a nanos long under legacy.parquet.nanosAsLong),
  * timestamp[us] (TIMESTAMP_NTZ), and TIMESTAMP_MILLIS (TimestampType) —
  * so a driver-side re-encode of the testdata is a non-event.
  * Reference analog: DataSourceUtil.scala autoLoad source-type
  * normalization (java/openmldb-batch). */
class TablesLoadSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // epoch-ms values incl. a sub-ms-precision micro tail and a pre-epoch
  // value: floor semantics (DuckDB epoch_ms) must hold, not truncation.
  private val msAndMicroTail: Seq[(Long, Long)] = Seq(
    (0L, 0L),                       // epoch
    (1700000000123L, 456L),         // recent, with micro tail
    (1700000000999L, 999L),         // just below the next ms
    (9214646400000L, 0L),           // far future (year 2262-safe for ns)
    (-86400000L, 0L)                // pre-epoch day: floor, not truncate
  )

  private def writeDir(): String = {
    val d = Files.createTempDirectory("graft_tables_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def baseRows(i: Int, tsAny: Any): Row =
    Row(i.toLong, i.toLong % 3, "click", i.toDouble, tsAny)

  /** Write events.parquet with ts as a nanos long (what a TIMESTAMP(NANOS)
    * parquet file reads back as under nanosAsLong). */
  private def writeNanosLong(): String = {
    val dir = writeDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("ts", LongType)))
    val data = msAndMicroTail.zipWithIndex.map { case ((ms, us), i) =>
      baseRows(i, ms * 1000000L + us * 1000L)
    }
    spark.createDataFrame(data.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Write events.parquet with ts as timestamp[us] without timezone
    * (TIMESTAMP_NTZ — the encoding the driver's generator emits). */
  private def writeMicrosNtz(): String = {
    val dir = writeDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("ts", TimestampNTZType)))
    val data = msAndMicroTail.zipWithIndex.map { case ((ms, us), i) =>
      baseRows(i, java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(ms, 1000L),
        (Math.floorMod(ms, 1000L) * 1000000L + us * 1000L).toInt,
        java.time.ZoneOffset.UTC))
    }
    spark.createDataFrame(data.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Write events.parquet as TIMESTAMP_MILLIS (TimestampType; micro tail
    * unrepresentable, so only whole-ms values go through this encoding). */
  private def writeMillisTz(): String = {
    val dir = writeDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("ts", TimestampType)))
    val data = msAndMicroTail.zipWithIndex.map { case ((ms, _), i) =>
      baseRows(i, new java.sql.Timestamp(ms))
    }
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try spark.createDataFrame(data.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally prev.foreach(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    dir
  }

  /** Write events.parquet with ts as ISO-8601 strings (a CSV-ish
    * re-encode; whole-ms values only — string parsing keeps micros but
    * the fixture's micro tails are exercised by the finer encodings). */
  private def writeStrings(): String = {
    val dir = writeDir()
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("ts", StringType)))
    val data = msAndMicroTail.zipWithIndex.map { case ((ms, _), i) =>
      baseRows(i, java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString)
    }
    spark.createDataFrame(data.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadNorm(dir: String): Map[Long, (Long, Long)] =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts_ms"), col("ts_ns"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("ts_ms identical across nanos-long / timestamp[us] / timestamp[ms] encodings") {
    val fromNanos  = loadNorm(writeNanosLong())
    val fromMicros = loadNorm(writeMicrosNtz())
    val fromMillis = loadNorm(writeMillisTz())
    val fromString = loadNorm(writeStrings())

    val expectedMs = msAndMicroTail.zipWithIndex.map { case ((ms, _), i) =>
      i.toLong -> ms
    }.toMap
    for ((id, ms) <- expectedMs) {
      assert(fromNanos(id)._1 == ms, s"nanos path ts_ms for event $id")
      assert(fromMicros(id)._1 == ms, s"micros-NTZ path ts_ms for event $id")
      assert(fromMillis(id)._1 == ms, s"millis path ts_ms for event $id")
      assert(fromString(id)._1 == ms, s"string path ts_ms for event $id")
    }
    // ts_ns carries the full sub-ms precision on the fine encodings
    for (((ms, us), i) <- msAndMicroTail.zipWithIndex) {
      val ns = ms * 1000000L + us * 1000L
      assert(fromNanos(i.toLong)._2 == ns, s"nanos path ts_ns for event $i")
      assert(fromMicros(i.toLong)._2 == ns, s"micros path ts_ns for event $i")
    }
  }

  test("ts column is rebuilt as TimestampType at ms precision in all paths") {
    Seq(writeNanosLong(), writeMicrosNtz(), writeMillisTz()).foreach { dir =>
      val df = Tables.load(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType)
      val byId = df.select(col("event_id"), unix_millis(col("ts")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (((ms, _), i) <- msAndMicroTail.zipWithIndex)
        assert(byId(i.toLong) == ms, s"rebuilt ts for event $i in $dir")
    }
  }

  test("PlainBaseline pb_events derives the same ts_ms for long and timestamp encodings") {
    Seq(writeNanosLong(), writeMicrosNtz()).foreach { dir =>
      // registerViews needs the TPC-H views too; only exercise the events path
      val ev = spark.read.parquet(s"$dir/events.parquet")
      val tsCols = ev.schema("ts").dataType match {
        case LongType => Seq(
          "CAST((ts - pmod(ts, 1000000)) / 1000000 AS LONG) AS ts_ms")
        case _ => Seq(
          "CAST((unix_micros(CAST(ts AS TIMESTAMP)) - pmod(unix_micros(CAST(ts AS TIMESTAMP)), 1000)) / 1000 AS LONG) AS ts_ms")
      }
      val byId = ev.selectExpr(Seq("event_id") ++ tsCols: _*)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (((ms, _), i) <- msAndMicroTail.zipWithIndex)
        assert(byId(i.toLong) == ms, s"pb_events ts_ms for event $i in $dir")
    }
  }
}
