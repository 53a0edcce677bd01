package graft

import org.apache.spark.sql.functions._
import graft.functions.{FarmHash, GraftScalars => F}

class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("truncate is toward-zero and type-preserving") {
    val out = Seq((3.7, -3.7, 5)).toDF("a", "b", "c")
      .select(F.truncate(col("a")), F.truncate(col("b")), F.truncate(col("c")))
      .collect()(0)
    assert(out.getDouble(0) == 3.0)
    assert(out.getDouble(1) == -3.0)
    assert(out.getInt(2) == 5)
  }

  test("like_match with custom escape chars") {
    assert(F.rewriteLikeEscape("a#%b", '#') == "a\\%b")
    assert(F.rewriteLikeEscape("a\\b", '#') == "a\\\\b")
    val df = Seq(Tuple1("100%"), Tuple1("100x")).toDF("s")
    val hits = df.filter(F.like_match(col("s"), "100#%", '#')).collect()
    assert(hits.length == 1 && hits(0).getString(0) == "100%")
  }

  test("strcmp returns -1/0/1 and null on null input") {
    val out = Seq(("a", "b")).toDF("x", "y").select(
      F.strcmp(col("x"), col("y")), F.strcmp(col("y"), col("x")),
      F.strcmp(col("x"), col("x")), F.strcmp(lit(null).cast("string"), col("x")))
      .collect()(0)
    assert(out.getInt(0) == -1 && out.getInt(1) == 1 && out.getInt(2) == 0)
    assert(out.isNullAt(3))
  }

  test("earth_distance haversine matches known value and null bounds") {
    // Beijing -> Shanghai ≈ 1067 km
    val out = Seq((39.9042, 116.4074, 31.2304, 121.4737)).toDF("a", "b", "c", "d")
      .select(F.earth_distance(col("a"), col("b"), col("c"), col("d")),
        F.earth_distance(lit(91.0), col("b"), col("c"), col("d")))
      .collect()(0)
    assert(math.abs(out.getDouble(0) - 1067.0) < 5.0)
    assert(out.isNullAt(1))
  }

  test("fz split family") {
    val df = Seq(Tuple1("a:1,b:2,c")).toDF("s")
    val out = df.select(
      array_join(F.fz_split(col("s"), ","), "|"),
      array_join(F.fz_split_by_key(col("s"), ",", ":"), "|"),
      array_join(F.fz_split_by_value(col("s"), ",", ":"), "|"))
      .collect()(0)
    assert(out.getString(0) == "a:1|b:2|c")
    assert(out.getString(1) == "a|b") // 'c' has no kv delim
    assert(out.getString(2) == "1|2")
  }

  test("list_except_by_key and by_value") {
    val df = Seq(Tuple1("a:1,b:2,c:0")).toDF("s")
    val list = F.fz_split(col("s"), ",")
    val out = df.select(
      array_join(F.fz_list_except_by_key(list, lit("a,c")), " "),
      array_join(F.fz_list_except_by_value(list, lit("0,1")), " "))
      .collect()(0)
    assert(out.getString(0) == "b:2") // reference doc example
    assert(out.getString(1) == "b:2")
  }

  test("SQL-registered hash64 equals DataFrame hash64") {
    F.registerAll(spark)
    val df = Seq(Tuple1("hello"), Tuple1("world")).toDF("s")
    df.createOrReplaceTempView("t_hash")
    val a = spark.sql("SELECT hash64(s) FROM t_hash").collect().map(_.getLong(0))
    val b = df.select(F.hash64(col("s"))).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)
  }

  test("FarmHash Fingerprint64 matches the reference corpus vectors") {
    // feature_signature_query.yaml ids 22/23 pin these bit-exact
    assert(FarmHash.ofInt(3) == 2681491882390849628L)
    assert(FarmHash.ofLong(3L) == 7262150054277104024L)
    assert(FarmHash.ofLong(1L) == 5925585971146611297L)
    assert(FarmHash.ofLong(4L) == 3255232038643208583L)
    // gcformat bucket case (id 1): unsigned mod over the fingerprint
    assert(java.lang.Long.remainderUnsigned(
      FarmHash.ofInt(3), 1000L) == 628L)
    assert(java.lang.Long.remainderUnsigned(
      FarmHash.ofInt(-1), 5L) == 1L)
    // exercise every length class of the algorithm (0-16/17-32/33-64/65+)
    assert(FarmHash.ofString("") == FarmHash.hash64(Array.emptyByteArray))
    Seq(1, 9, 20, 40, 70, 200, 1000).foreach { n =>
      val h = FarmHash.ofString("x" * n)
      assert(h != 0L) // smoke: total function over all paths
    }
  }
}
