package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table catalog over the driver-generated parquet dirs
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * The `events` table stores its `ts` column as parquet INT64
  * TIMESTAMP(NANOS) which Spark cannot read natively; we require
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set by [[GraftSession]])
  * and expose both a millisecond long (`ts_ms`) and a proper
  * TimestampType (`ts`) view. Millisecond-epoch longs are the engine's
  * canonical window order key, mirroring the reference's int64-ms
  * timestamp model (reference: hybridse/src/proto/fe_type.proto and
  * docs/en/openmldb_sql/data_types/date_and_time_types.md:10-14).
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

  /** Read one table; normalizes `events.ts` (ns long → ms long + timestamp). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (loaded.size > 128) loaded.clear() // stopped-session handles
    loaded.computeIfAbsent((spark, dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") {
        // floorDiv matches DuckDB epoch_ms() truncation for the oracle.
        val tsMs = floor(col("ts") / lit(1000000L)).cast("long")
        df.withColumn("ts_ms", tsMs)
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_millis(tsMs))
      } else df
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
      .config("spark.ui.enabled", "false")

  /** Apply graft-required confs to an externally-created session (the
    * driver may build its own SparkSession before calling entry/queries). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // legacy.parquet.nanosAsLong is a static-ish read conf but settable
    // per-session; needed for the events table.
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    spark
  }
}
