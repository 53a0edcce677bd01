package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table catalog over the driver-generated parquet dirs
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * The `events` table's `ts` column arrives in whatever parquet encoding
  * the data generator chose — INT64 TIMESTAMP(NANOS) (read back as a
  * nanos long under `spark.sql.legacy.parquet.nanosAsLong=true`),
  * timestamp[us]/[ms] (read back as TimestampType or TimestampNTZType) —
  * so [[load]] sniffs the read-back dtype and normalizes, mirroring the
  * reference loader's source-type normalization (reference:
  * java/openmldb-batch/.../utils/DataSourceUtil.scala autoLoad;
  * docs/en/openmldb_sql/dml/LOAD_DATA_STATEMENT.md:53-61). Every
  * encoding is exposed the same way: a millisecond-epoch long (`ts_ms`,
  * the engine's canonical window order key, matching the reference's
  * int64-ms timestamp model — hybridse/src/proto/fe_type.proto and
  * docs/en/openmldb_sql/data_types/date_and_time_types.md:10-14), a
  * nanosecond long (`ts_ns`, tie-precision order key), and a proper
  * TimestampType `ts` rebuilt from `ts_ms`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One DataFrame handle per (session, path): `spark.read.parquet`
  // re-lists files and re-reads footers on every call, and every
  // consumer re-analyzes the fresh plan — a real cost when queries are
  // re-planned per serving batch. The test parquet dirs are immutable,
  // and a production catalog would hand out stable table handles the
  // same way.
  private val loaded = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Exact floor-division of a long column by a positive constant:
    * `pmod` makes the numerator an exact multiple, so the double-typed
    * Divide is lossless (a bare `floor(x / d)` can be off by one near
    * unit boundaries once x exceeds 2^53) and pre-epoch (negative)
    * values floor instead of truncating — matching DuckDB `epoch_ms()`,
    * the oracle's semantics. */
  private def floorDiv(x: Column, d: Long): Column =
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")

  /** Normalize `events.ts` to (ts_ms long, ts_ns long, ts timestamp)
    * regardless of the parquet encoding it was read back as. */
  private[graft] def normalizeEvents(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, TimestampNTZType, TimestampType}
    val tsMs = df.schema("ts").dataType match {
      case LongType => // INT64 TIMESTAMP(NANOS) via legacy.parquet.nanosAsLong
        floorDiv(col("ts"), 1000000L)
      case TimestampType | TimestampNTZType | StringType =>
        // NTZ and ISO strings cast to TimestampType under the UTC
        // session timezone (the reference's loader parses string
        // timestamps the same way — DataSourceUtil autoLoad)
        floorDiv(unix_micros(col("ts").cast(TimestampType)), 1000L)
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported source type $other")
    }
    val tsNs = df.schema("ts").dataType match {
      case LongType => col("ts")
      case _        => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
    }
    df.withColumn("ts_ms", tsMs)
      .withColumn("ts_ns", tsNs)
      .withColumn("ts", timestamp_millis(col("ts_ms")))
  }

  /** Read one table; normalizes `events.ts` (any encoding → ms long + timestamp). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (loaded.size > 128) loaded.clear() // stopped-session handles
    loaded.computeIfAbsent((spark, dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") normalizeEvents(df) else df
    })
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** Session defaults shared by Bench / Verify / tests. */
object GraftSession {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the engine's dialect is non-ANSI: failable casts → NULL,
      // x % 0 → NULL, integral overflow wraps (reference
      // test_arithmetic.yaml; docs/en/openmldb_sql)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // TransposeWindow swaps adjacent Window ops when the upper's
      // partition keys are a subset of the lower's — exactly the
      // strict-tie decomposition's (tie over (k, ts)) + (range over (k))
      // pair. Transposed, the pair needs TWO sorts; in authored order
      // the tie stage's (k, ts, uid) sort is a superset of the range
      // stage's (k, ts) requirement and the plan runs ONE sort
      // (measured 1.8x -> ~1.2x of plain on q_sql_window at sf0.1).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.TransposeWindow")
      .config("spark.ui.enabled", "false")

  /** Apply graft-required confs to an externally-created session (the
    * driver may build its own SparkSession before calling entry/queries). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.TransposeWindow")
    // legacy.parquet.nanosAsLong is a static-ish read conf but settable
    // per-session; needed for the events table.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark
  }
}
