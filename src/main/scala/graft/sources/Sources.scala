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

  /** The reference validates option keys and boolean/mode values and
    * errors on anything unknown (test_out_in.yaml ids 12/13/38).
    * Values arrive with their SQL quoting intact: boolean options given
    * a quoted string are type errors (header='true', id 13). */
  private val knownKeys = Set("delimiter", "header", "quote", "null_value",
    "format", "mode", "deep_copy", "load_mode", "thread", "coalesce",
    "writer_type", "put_if_absent")
  private def quoted(v: String): Boolean =
    v.length >= 2 && (v.head == '\'' || v.head == '"')
  private def strip(v: String): String = if (quoted(v)) v.tail.init else v
  private def validate(options: Map[String, String]): Unit = {
    options.keys.find(!knownKeys(_)).foreach(k =>
      throw new IllegalArgumentException(s"unknown option '$k'"))
    Seq("header", "deep_copy", "put_if_absent").foreach(k =>
      options.get(k).foreach { v =>
      if (quoted(v) || !Set("true", "false")(v.toLowerCase))
        throw new IllegalArgumentException(s"invalid $k value $v (bool)")
    })
    options.get("mode").map(strip).foreach { v =>
      if (!Set("error_if_exists", "errorifexists", "overwrite", "append")(
          v.toLowerCase))
        throw new IllegalArgumentException(s"invalid mode value '$v'")
    }
    // file loads take csv|parquet only (DataSourceUtil.autoFileLoad:186
    // `require(format.equals("csv") || format.equals("parquet"))`;
    // test_select_into_load_data.yaml id 28 format='txt' must fail
    // before any read). Catalog URIs (hive://…) never carry format.
    options.get("format").map(strip).foreach { v =>
      if (!Set("csv", "parquet")(v.toLowerCase))
        throw new IllegalArgumentException(s"unsupported format '$v'")
    }
  }

  /** delimiter/header/quote/null_value → Spark reader/writer options.
    * The reference's CSV is UNQUOTED by default (SELECT_INTO quote
    * defaults to none) — so a delimiter occurring in the data breaks
    * the roundtrip, exactly like the reference (test_out_in.yaml id
    * 34); pass quote explicitly to enable quoting. */
  private def mapOptions(options: Map[String, String]): Map[String, String] = {
    val mapped = options.flatMap {
      case ("delimiter", v)  => Seq("sep" -> strip(v))
      case ("header", v)     => Seq("header" -> strip(v))
      case ("quote", v)      => Seq("quote" -> strip(v))
      case ("null_value", v) => Seq("nullValue" -> strip(v))
      case ("format", _)     => Nil // handled by caller
      case ("mode", _)       => Nil
      case ("deep_copy", _) | ("load_mode", _) | ("thread", _) |
           ("coalesce", _) | ("writer_type", _) |
           ("put_if_absent", _) => Nil
      case (k, v)            => Seq(k -> strip(v))
    }
    if (mapped.contains("quote")) mapped
    else mapped + ("quote" -> "\u0000")
  }

  /** A `hive://` / `iceberg://` URI names a CATALOG TABLE, not a file
    * path — the format option is ignored and the read/write goes
    * through the session catalog (reference
    * utils/HybridseUtil.scala:218-239 parseOptions;
    * dml/LOAD_DATA_STATEMENT.md:53-61). Spark speaks both natively, so
    * the "source" is just `spark.read.table` / `saveAsTable`. */
  private def tableUri(path: String): Option[String] = {
    val low = path.toLowerCase
    Seq("hive://", "iceberg://").collectFirst {
      case p if low.startsWith(p) => path.substring(p.length)
    }
  }

  /** LOAD DATA INFILE: read csv/parquet with dialect options; an
    * explicit schema skips inference (the reference validates against
    * the declared table schema — DataSourceUtil.autoLoad).
    *
    * `flavor` selects among the reference's csv load paths:
    *  - "local": the standalone CLI's client-side loader — unparseable
    *    values and header mismatches are load errors
    *    (function/out_in/test_out_in.yaml ids 22/24/25);
    *  - "cluster": the cluster Spark load, online and offline alike
    *    (DataSourceUtil.autoFileLoad:186-215) — a plain permissive
    *    Spark csv read against the declared schema: unparseable values
    *    become NULL, header=true consumes the first line of EVERY
    *    part file whether or not it is a real header, and each
    *    timestamp column's format (int64 epoch-ms vs wall-clock
    *    string) is keyed ON ITS FIRST non-null value for the whole
    *    column, like parseLongTsCols
    *    (test_select_into_load_data.yaml ids 9-2/24-2/25-2/34-2 pin
    *    exactly these outcomes; the 9-1 [6 rows] vs 9-2 [5 rows]
    *    split comes from the EXPORT side — see [[selectInto]]). */
  def loadData(spark: SparkSession, path: String,
      options: Map[String, String] = Map.empty,
      schema: Option[StructType] = None,
      flavor: String = "local"): DataFrame = {
    validate(options)
    tableUri(path).foreach { t =>
      // catalog reads scale like any table scan — partition pruning
      // and pushdown come from the catalog, not this layer
      return spark.read.table(t)
    }
    val fmt = strip(options.getOrElse("format", "csv"))
    schema match {
      case Some(s) if fmt == "csv" && flavor != "local" =>
        // cluster-edition csv: permissive read with the timestamp
        // columns taken as strings first, then converted — int64
        // epoch-ms or wall-clock strings, per-value (the reference
        // keys the choice on the first row, parseLongTsCols; a
        // per-value dual parse agrees on every non-mixed file and a
        // mixed file is upstream-undefined). Unparseable values are
        // data-level NULLs, never job failures.
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.{StringType, TimestampType}
        val tsCols = s.fields.filter(_.dataType == TimestampType)
          .map(_.name).toSeq
        val parseSchema = StructType(s.fields.map(f =>
          if (tsCols.contains(f.name)) f.copy(dataType = StringType) else f))
        val header =
          options.get("header").forall(_.equalsIgnoreCase("true"))
        var r = spark.read
          .options(mapOptions(options) - "quote" - "header")
          // cluster default quote is `"` (LOAD_DATA_STATEMENT.md quote
          // row), unlike the local loader's none
          .options(options.get("quote").map(q => "quote" -> strip(q)).toMap)
          .schema(parseSchema).option("mode", "PERMISSIVE")
        val df0 = r.option("header", header.toString).csv(path)
        // one format per ts column per load, keyed on its first
        // non-null value (parseLongTsCols): an int64 column parses
        // digits only, a wall-clock column parses strings only —
        // values of the other shape are NULL, which is how a header
        // line read as data NULLs the whole column (id 25-2)
        val firstTs: Map[String, String] =
          if (tsCols.isEmpty) Map.empty
          else df0.select(tsCols.map(c =>
              first(col(c), ignoreNulls = true).as(c)): _*)
            .collect().headOption
            .map(row => tsCols.flatMap(c => Option(row.getAs[String](c))
              .map(c -> _)).toMap)
            .getOrElse(Map.empty)
        val df1 = tsCols.foldLeft(df0) { (d, n) =>
          val isLong = firstTs.get(n).forall(_.matches("^-?[0-9]+$"))
          // wall-clock timestamp strings are CST wall time — the
          // reference corpus is authored against an Asia/Shanghai
          // server (timestamp_date.csv's expected epochs embed +08:00)
          d.withColumn(n,
            if (isLong)
              when(col(n).rlike("^-?[0-9]+$"),
                timestamp_millis(col(n).cast("long")))
            else
              to_utc_timestamp(try_to_timestamp(col(n)), "Asia/Shanghai"))
        }
        // cluster mode reads empty fields as NULL regardless of
        // null_value (LOAD_DATA_STATEMENT.md "CSV Source Data Format"
        // note 2)
        val df2 = s.fields.filter(_.dataType == StringType)
          .map(_.name).foldLeft(df1) { (d, n) =>
            d.withColumn(n, when(col(n) === "", lit(null)).otherwise(col(n)))
          }
        df2.select(s.fieldNames.map(col).toIndexedSeq: _*)
      case Some(s) if fmt == "csv" =>
        // strict load against the declared table schema. An appended
        // directory may mix header-ful and headerless part files
        // (test_out_in.yaml ids 9/10), so read as text, require the
        // header row somewhere when header=true (id 24), drop every
        // header occurrence, and FAILFAST-parse the rest (ids 22/25).
        val delim = strip(options.getOrElse("delimiter", ","))
        val header =
          options.get("header").forall(_.equalsIgnoreCase("true"))
        val lines = spark.read.textFile(path)
        val headerLine = s.fieldNames.mkString(delim)
        if (header && lines.filter(_ == headerLine).isEmpty)
          throw new IllegalArgumentException(
            "header=true but no header row matches the table columns")
        val data = if (header) lines.filter(_ != headerLine) else lines
        // timestamp columns arrive as int64 epoch ms (the reference's
        // csv export format) or as wall-clock strings — parse as
        // string, convert, and treat an unparseable non-null value as
        // a load error (FAILFAST semantics, test_out_in.yaml id 22)
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.{StringType, TimestampType}
        val tsCols = s.fields.filter(_.dataType == TimestampType)
          .map(_.name).toSeq
        val parseSchema = StructType(s.fields.map(f =>
          if (tsCols.contains(f.name)) f.copy(dataType = StringType) else f))
        val df0 = spark.read
          .options(mapOptions(options) - "header")
          .schema(parseSchema).option("mode", "FAILFAST")
          .csv(data)
        val df1 = tsCols.foldLeft(df0) { (d, n) =>
          d.withColumn(s"__raw_$n", col(n))
            .withColumn(n,
              when(col(n).rlike("^-?[0-9]+$"),
                timestamp_millis(col(n).cast("long")))
                .otherwise(try_to_timestamp(col(n))))
        }
        // FAILFAST surfaces on the first action — force it here so
        // LOAD DATA itself reports the error, not a later query
        df1.foreach(_ => ())
        tsCols.foreach { n =>
          if (df1.filter(col(s"__raw_$n").isNotNull && col(n).isNull)
              .limit(1).count() > 0)
            throw new IllegalArgumentException(
              s"cannot parse timestamp column '$n' from csv")
        }
        df1.select(s.fieldNames.map(col).toIndexedSeq: _*)
      case _ =>
        var r = spark.read.format(fmt).options(mapOptions(options))
        if (fmt == "csv" && !options.contains("header"))
          r = r.option("header", "true")
        schema.foreach(s => r = r.schema(s))
        if (schema.isEmpty && fmt == "csv") r = r.option("inferSchema", "true")
        r.load(path)
    }
  }

  /** SELECT INTO OUTFILE: write csv/parquet; mode ∈
    * error_if_exists|overwrite|append (SELECT_INTO_STATEMENT.md).
    * The reference's CSV default is UNQUOTED (quote = none), so the
    * csv path renders lines manually — a delimiter inside the data
    * corrupts the file exactly like the reference (test_out_in.yaml
    * id 34). An explicit quote option restores Spark's quoted writer. */
  /** `clientFile = true` renders the ONLINE export: the reference CLI
    * streams rows into ONE file client-side, so mode='append' adds
    * LINES to the same file (with a fresh header line per write when
    * header=true — test_select_into_load_data.yaml id 11-1's `cat`
    * carries two header lines), where the offline Spark export's
    * append lands a NEW part file per write (ids 9-1 vs 9-2: the
    * online roundtrip keeps 6 rows, the offline one loses a row to
    * per-file header consumption). Applies to local/file:// csv text
    * exports only; other schemes and formats write through Spark. */
  def selectInto(df: DataFrame, path: String,
      options: Map[String, String] = Map.empty,
      requireParent: Boolean = true,
      clientFile: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    validate(options)
    val fmt = strip(options.getOrElse("format", "csv"))
    val mode = strip(options.getOrElse("mode", "error_if_exists")) match {
      case "overwrite"       => "overwrite"
      case "append"          => "append"
      case _                 => "errorifexists"
    }
    tableUri(path).foreach { t =>
      df.write.mode(mode).saveAsTable(t)
      return
    }
    // the ONLINE export requires the output FOLDER to exist (the CLI
    // writes a single client-side file — test_out_in.yaml id 21
    // 路径文件夹不存在 expects failure); the cluster OFFLINE export is a
    // Spark job writing a directory, which mkdir -p's its target
    // (test_select_into_load_data.yaml id 21-2 expects success on the
    // same missing folder). Checked through the Hadoop FS of the
    // target URI, so hdfs:///s3:// paths resolve against the right
    // filesystem.
    if (requireParent) {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      val parent = p.getParent
      if (parent != null && !fs.exists(parent))
        throw new IllegalArgumentException(
          s"output path folder does not exist: $parent")
    }
    val explicitQuote = options.get("quote").map(strip).exists(_.nonEmpty)
    if (fmt == "csv" && !explicitQuote) {
      val delim = strip(options.getOrElse("delimiter", ","))
      val nullV = strip(options.getOrElse("null_value", ""))
      val header = options.get("header").map(strip).forall(_.toBoolean)
      val spark = df.sparkSession
      import spark.implicits._
      // reference csv rendering (test_out_in.yaml id 11/17/18 `cat`
      // expectations): float/double print %f with 6 decimals,
      // timestamps print their int64 epoch-ms value
      val rendered = df.schema.fields.map { f =>
        val c = f.dataType match {
          case org.apache.spark.sql.types.FloatType |
               org.apache.spark.sql.types.DoubleType =>
            format_string("%.6f", col(f.name))
          case org.apache.spark.sql.types.TimestampType =>
            unix_millis(col(f.name)).cast("string")
          case _ => col(f.name).cast("string")
        }
        coalesce(c, lit(nullV))
      }
      val lines = df.select(concat_ws(delim, rendered: _*).as("value"))
      val localPath = if (path.startsWith("file://")) Some(path.drop(7))
        else if (!path.contains("://")) Some(path) else None
      localPath.filter(_ => clientFile) match {
        case Some(lp) =>
          // CLI-style single-file export: header per write, appended
          // lines land in the SAME file
          val f = new java.io.File(lp)
          if (mode == "errorifexists" && f.exists())
            throw new IllegalArgumentException(s"output file exists: $lp")
          // overwrite replaces whatever sits at the path — including a
          // directory left by an earlier Spark-job export to it
          if (mode == "overwrite" && f.exists())
            org.apache.commons.io.FileUtils.deleteQuietly(f)
          if (f.isDirectory)
            throw new IllegalArgumentException(
              s"cannot append a single-file export onto a directory: $lp")
          val w = new java.io.PrintWriter(new java.io.BufferedWriter(
            new java.io.FileWriter(f, mode == "append")))
          try {
            if (header) w.println(df.schema.fieldNames.mkString(delim))
            val it = lines.toLocalIterator()
            while (it.hasNext) w.println(it.next().getString(0))
          } finally w.close()
        case None =>
          // one part per export batch, like the reference's practical
          // output (each offline export job writes one batch;
          // SELECT_INTO_STATEMENT.md exposes `coalesce` for explicit
          // control — coalesce=0 keeps the plan's distributed
          // partitioning for at-scale exports). The append-mode
          // header-eating roundtrip (ids 9-2/10-2) is only
          // well-defined when each append lands exactly one part file.
          val nParts = options.get("coalesce").map(strip).map(_.toInt)
            .getOrElse(1)
          val body0 = if (nParts > 0) lines.coalesce(nParts) else lines
          // the header must lead PART 0's lines — a `union` of a
          // header relation with the data keeps no partition-order
          // guarantee through the optimizer (observed reordered under
          // a windowed source), so prepend inside the partition
          val out =
            if (!header) body0
            else {
              val hdr = df.schema.fieldNames.mkString(delim)
              val rdd0 = body0.as[String](
                org.apache.spark.sql.Encoders.STRING).rdd
              val rdd =
                if (rdd0.getNumPartitions == 0)
                  spark.sparkContext.parallelize(Seq(hdr), 1)
                else rdd0.mapPartitionsWithIndex((i, it) =>
                  if (i == 0) Iterator(hdr) ++ it else it)
              spark.createDataset(rdd)(
                org.apache.spark.sql.Encoders.STRING).toDF("value")
            }
          out.write.mode(mode).text(path)
      }
    } else {
      var w = df.write.format(fmt).mode(mode).options(mapOptions(options))
      if (fmt == "csv" && !options.contains("header"))
        w = w.option("header", "true")
      w.save(path)
    }
  }
}
