package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** `LOAD DATA INFILE` / `SELECT ... INTO OUTFILE` equivalents
  * (docs/en/openmldb_sql/dml/LOAD_DATA_STATEMENT.md:53-61,
  * dql/SELECT_INTO_STATEMENT.md; reference Spark lowering
  * nodes/LoadDataPlan.scala:40-135, nodes/SelectIntoPlan.scala).
  *
  * Option names follow the reference dialect and map onto Spark
  * DataFrameReader/Writer options; formats csv/parquet (hive/iceberg
  * URIs are native `spark.read.table` territory). Reads return plain
  * DataFrames — scans parallelize by file split, so a 100 TB LOAD is
  * just a distributed scan + write.
  */
object Sources {

  /** delimiter/header/quote/null_value → Spark reader/writer options. */
  private def mapOptions(options: Map[String, String]): Map[String, String] =
    options.flatMap {
      case ("delimiter", v)  => Seq("sep" -> v)
      case ("header", v)     => Seq("header" -> v)
      case ("quote", v)      => Seq("quote" -> v)
      case ("null_value", v) => Seq("nullValue" -> v)
      case ("format", _)     => Nil // handled by caller
      case ("mode", _)       => Nil
      case (k, v)            => Seq(k -> v)
    }

  /** LOAD DATA INFILE: read csv/parquet with dialect options; an
    * explicit schema skips inference (the reference validates against
    * the declared table schema — DataSourceUtil.autoLoad). */
  def loadData(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty,
      schema: Option[StructType] = None): DataFrame = {
    val fmt = options.getOrElse("format", "csv")
    var r = spark.read.format(fmt).options(mapOptions(options))
    if (fmt == "csv" && !options.contains("header")) r = r.option("header", "true")
    schema.foreach(s => r = r.schema(s))
    if (schema.isEmpty && fmt == "csv") r = r.option("inferSchema", "true")
    r.load(path)
  }

  /** SELECT INTO OUTFILE: write csv/parquet; mode ∈
    * error_if_exists|overwrite|append (SELECT_INTO_STATEMENT.md). */
  def selectInto(df: DataFrame, path: String,
      options: Map[String, String] = Map.empty): Unit = {
    val fmt = options.getOrElse("format", "csv")
    val mode = options.getOrElse("mode", "error_if_exists") match {
      case "overwrite"       => "overwrite"
      case "append"          => "append"
      case _                 => "errorifexists"
    }
    var w = df.write.format(fmt).mode(mode).options(mapOptions(options))
    if (fmt == "csv" && !options.contains("header")) w = w.option("header", "true")
    w.save(path)
  }
}
