package graft

import org.apache.spark.sql.functions._
import graft.sql.GraftSql

/** Dual-store semantics of the cluster edition: every table owns an
  * online view plus OFFLINE table info (hard-copy parquet Data path +
  * soft-linked Symbolic paths), routed by `execute_mode`
  * (reference: LOAD_DATA_STATEMENT.md "Offline Import Rules",
  * openmldb-batch LoadDataPlan.scala:86-196, InsertPlan.scala:55-95,
  * OpenmldbSession.scala:295-335; the corpus authority is
  * integration_test/out_in/test_select_into_load_data.yaml, run
  * verbatim in YamlCaseRunnerSpec — this spec pins the engine-level
  * contracts directly). */
class OfflineStoreSpec extends SparkSpec {
  import spark.implicits._

  private def st(s: String) = GraftSql.statement(spark, s)
  private def rows(sql: String): Seq[Seq[Any]] =
    GraftSql.sql(spark, sql).collect().toSeq.map(_.toSeq)

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_off").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftSql.resetCatalogState(spark)
  }

  test("offline reads are empty without offline info; online unchanged") {
    GraftSql.resetCatalogState(spark)
    st("CREATE TABLE off1 (k bigint, s string)")
    st("INSERT INTO off1 VALUES (1, 'a'), (2, 'b')")
    assert(rows("SELECT k FROM off1").size == 2)
    st("SET @@execute_mode = 'offline'")
    // no offline info: empty frame with the table schema, like the
    // reference's batch session registering an empty df
    val off = GraftSql.sql(spark, "SELECT k, s FROM off1")
    assert(off.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(off.count() == 0)
    st("SET @@execute_mode = 'online'")
    assert(rows("SELECT k FROM off1").size == 2)
  }

  test("offline INSERT lands in the offline store only; online twin " +
      "stays put (test_execute_mode.yaml id 5)") {
    GraftSql.resetCatalogState(spark)
    st("CREATE TABLE off2 (k bigint, s string)")
    st("INSERT INTO off2 VALUES (1, 'online')")
    st("SET @@execute_mode = 'offline'")
    st("INSERT INTO off2 VALUES (2, 'offline')")
    assert(rows("SELECT k, s FROM off2") == Seq(Seq(2L, "offline")))
    st("SET @@execute_mode = 'online'")
    assert(rows("SELECT k, s FROM off2") == Seq(Seq(1L, "online")))
  }

  test("online import requires deep_copy and mode=append (LoadDataPlan:69)") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("off3_src")
    st(s"SELECT k, s FROM off3_src INTO OUTFILE '$dir/out' " +
      "OPTIONS (mode='overwrite')")
    st("CREATE TABLE off3 (k bigint, s string)")
    // default mode (error_if_exists) and overwrite are offline-only
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off3")
    }
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off3 OPTIONS (mode='overwrite')")
    }
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off3 " +
        "OPTIONS (mode='append', deep_copy=false)")
    }
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off3 OPTIONS (mode='append')")
    assert(rows("SELECT k FROM off3") == Seq(Seq(1L)))
  }

  test("deep-copy offline import: errorifexists/append/overwrite over " +
      "the hard Data path") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    Seq((1L, "x"), (2L, "y")).toDF("k", "s")
      .createOrReplaceTempView("off4_src")
    st(s"SELECT k, s FROM off4_src INTO OUTFILE '$dir/out' " +
      "OPTIONS (mode='overwrite')")
    st("CREATE TABLE off4 (k bigint, s string)")
    st("SET @@execute_mode = 'offline'")
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off4") // default errorifexists
    assert(rows("SELECT k FROM off4").size == 2)
    // second default-mode load: offline info exists
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off4")
    }
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off4 OPTIONS (mode='append')")
    assert(rows("SELECT k FROM off4").size == 4)
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off4 OPTIONS (mode='overwrite')")
    assert(rows("SELECT k FROM off4").size == 2)
    val info = GraftSql.offlineTableInfo(spark, "off4").get
    assert(info._1.nonEmpty && info._2.isEmpty && info._3 == "parquet")
    st("SET @@execute_mode = 'online'")
  }

  test("soft-copy offline import: symbolic path registry and its " +
      "constraints (ids 45/46/48/59/60)") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("off5_src")
    st(s"SELECT k, s FROM off5_src INTO OUTFILE '$dir/out' " +
      "OPTIONS (mode='overwrite')")
    st("CREATE TABLE off5 (k bigint, s string)")
    st("SET @@execute_mode = 'offline'")
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off5 OPTIONS (deep_copy=false)")
    val info = GraftSql.offlineTableInfo(spark, "off5").get
    assert(info._1.isEmpty && info._2 == Seq(s"$dir/out") && info._3 == "csv")
    // the soft link is read at query time
    assert(rows("SELECT k FROM off5") == Seq(Seq(1L)))
    // re-linking the same path fails in every mode (ids 45/46/48)
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off5 OPTIONS (deep_copy=false)")
    }
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off5 " +
        "OPTIONS (deep_copy=false, mode='append')")
    }
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off5 " +
        "OPTIONS (deep_copy=false, mode='overwrite')")
    }
    // soft-copied tables reject offline INSERT (InsertPlan:61)
    intercept[IllegalArgumentException] {
      st("INSERT INTO off5 VALUES (9, 'z')")
    }
    // deep overwrite replaces the soft link with a hard store (id 60)
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off5 " +
      "OPTIONS (deep_copy=true, mode='overwrite')")
    val info2 = GraftSql.offlineTableInfo(spark, "off5").get
    assert(info2._1.nonEmpty && info2._2.isEmpty)
    // ... and a soft link cannot replace a hard store (id 59)
    intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off5 " +
        "OPTIONS (deep_copy=false, mode='overwrite')")
    }
    st("SET @@execute_mode = 'online'")
  }

  test("cluster csv load is permissive: type mismatches NULL, int64 " +
      "ts column keyed on its first value (doc-correct twin of the " +
      "upstream-buggy select_into_load 34-2/56/57)") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.csv"),
      ("k,s,t\n" +
        "1,aa,1590738989000\n" +
        "oops,b,2.2\n" + // k unparseable, ts non-numeric -> NULLs
        "3,cc,1590738991000\n").getBytes)
    st("CREATE TABLE off6 (k bigint, s string, t timestamp)")
    st("SET @@execute_mode = 'offline'")
    st(s"LOAD DATA INFILE '$dir/in.csv' INTO TABLE off6")
    val got = GraftSql.sql(spark,
        "SELECT k, s, unix_millis(t) AS ms FROM off6")
      .collect().map(r => (Option(r.get(0)), r.getString(1),
        Option(r.get(2)))).sortBy(_._2)
    assert(got.toSeq == Seq(
      (Some(1L), "aa", Some(1590738989000L)),
      (None, "b", None),
      (Some(3L), "cc", Some(1590738991000L))))
    st("SET @@execute_mode = 'online'")
  }

  test("online cluster load rejects NULL in an index ts column " +
      "(ids 25-1/34-1)") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "in.csv"),
      ("k,s,t\n1,aa,1590738989000\n2,b,\n").getBytes)
    st("CREATE TABLE off7 (k bigint, s string, t timestamp, " +
      "index(key=(s), ts=t))")
    val e = intercept[IllegalArgumentException] {
      st(s"LOAD DATA INFILE '$dir/in.csv' INTO TABLE off7 " +
        "OPTIONS (mode='append')")
    }
    assert(e.getMessage.contains("ts column"))
  }

  test("DROP TABLE clears offline info — errorifexists reload works " +
      "after drop+recreate (id 37-2)") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("off8_src")
    st(s"SELECT k, s FROM off8_src INTO OUTFILE '$dir/out' " +
      "OPTIONS (mode='overwrite')")
    st("CREATE TABLE off8 (k bigint, s string)")
    st("SET @@execute_mode = 'offline'")
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off8 OPTIONS (mode='error_if_exists')")
    st("DROP TABLE off8")
    assert(GraftSql.offlineTableInfo(spark, "off8").isEmpty)
    st("CREATE TABLE off8 (k bigint, s string)")
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off8 OPTIONS (mode='error_if_exists')")
    assert(rows("SELECT k FROM off8") == Seq(Seq(1L)))
    st("SET @@execute_mode = 'online'")
  }

  test("ALTER TABLE ADD/DROP offline_path edits the live offline info " +
      "and SHOW TABLE STATUS reflects it (ALTER_STATEMENT.md)") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    Seq((7L, "q")).toDF("k", "s").write.mode("overwrite")
      .parquet(s"$dir/sym")
    st("CREATE TABLE offa (k bigint, s string)")
    st(s"ALTER TABLE offa ADD offline_path '$dir/sym'")
    val info = GraftSql.offlineTableInfo(spark, "offa").get
    assert(info._2 == Seq(s"$dir/sym") && info._3 == "parquet")
    // the added path is readable offline right away
    st("SET @@execute_mode = 'offline'")
    assert(rows("SELECT k, s FROM offa") == Seq(Seq(7L, "q")))
    st("SET @@execute_mode = 'online'")
    val status = GraftSql.statement(spark, "SHOW TABLE STATUS").get
      .filter(col("Table_name") === "offa").collect().head
    assert(status.getAs[String]("Offline_symbolic_paths") == s"$dir/sym")
    assert(status.getAs[String]("Offline_format") == "parquet")
    st(s"ALTER TABLE offa DROP offline_path '$dir/sym'")
    assert(GraftSql.offlineTableInfo(spark, "offa")
      .forall(_._2.isEmpty))
    st("SET @@execute_mode = 'offline'")
    assert(GraftSql.sql(spark, "SELECT k FROM offa").count() == 0)
    st("SET @@execute_mode = 'online'")
  }

  test("INSERT OR IGNORE skips existing rows online and is rejected " +
      "offline (INSERT_STATEMENT.md:18-19)") {
    GraftSql.resetCatalogState(spark)
    st("CREATE TABLE offb (k bigint, s string)")
    st("INSERT INTO offb VALUES (1, 'a'), (2, NULL)")
    // duplicate full rows (null-safely) are ignored; new rows land
    st("INSERT OR IGNORE INTO offb VALUES (1, 'a'), (2, NULL), (3, 'c')")
    assert(GraftSql.sql(spark, "SELECT k FROM offb").count() == 3)
    // the bare-IGNORE spelling parses too (INSERT [[OR] IGNORE])
    st("INSERT IGNORE INTO offb VALUES (3, 'c')")
    assert(GraftSql.sql(spark, "SELECT k FROM offb").count() == 3)
    st("SET @@execute_mode = 'offline'")
    val e = intercept[IllegalArgumentException] {
      st("INSERT OR IGNORE INTO offb VALUES (4, 'd')")
    }
    assert(e.getMessage.contains("only supports INSERT"))
    st("SET @@execute_mode = 'online'")
  }

  test("LOAD DATA put_if_absent dedups a retried online import " +
      "(LOAD_DATA_STATEMENT.md put_if_absent)") {
    GraftSql.resetCatalogState(spark)
    val dir = freshDir()
    Seq((1L, "x"), (2L, "y")).toDF("k", "s")
      .createOrReplaceTempView("offc_src")
    st(s"SELECT k, s FROM offc_src INTO OUTFILE '$dir/out' " +
      "OPTIONS (mode='overwrite')")
    st("CREATE TABLE offc (k bigint, s string)")
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE offc " +
      "OPTIONS (mode='append', put_if_absent=true)")
    // the retry is a no-op instead of doubling the table
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE offc " +
      "OPTIONS (mode='append', put_if_absent=true)")
    assert(GraftSql.sql(spark, "SELECT k FROM offc").count() == 2)
  }

  test("standalone edition keeps the v040 single-store semantics") {
    GraftSql.resetCatalogState(spark)
    GraftSql.setLoadEdition(spark, "standalone")
    val dir = freshDir()
    Seq((1L, "x")).toDF("k", "s").createOrReplaceTempView("off9_src")
    st(s"SELECT k, s FROM off9_src INTO OUTFILE '$dir/out' " +
      "OPTIONS (mode='overwrite')")
    st("CREATE TABLE off9 (k bigint, s string)")
    // no mode option needed; loads into the (single) online store
    st(s"LOAD DATA INFILE '$dir/out' INTO TABLE off9")
    assert(rows("SELECT k FROM off9") == Seq(Seq(1L)))
    // offline execute_mode does not reroute reads in this edition
    st("SET @@execute_mode = 'offline'")
    assert(rows("SELECT k FROM off9") == Seq(Seq(1L)))
    GraftSql.resetCatalogState(spark)
  }
}
