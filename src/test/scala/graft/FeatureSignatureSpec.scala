package graft

import org.apache.spark.sql.functions._
import graft.functions.{FeatureSignature => FS}

class FeatureSignatureSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1.5, true, 7L), (2.5, false, 8L)
  ).toDF("price", "label", "cat")

  test("csv format: one comma slot per signature, in order") {
    val out = df.select(FS.csvFormat(
      FS.continuous(col("price")), FS.binary_label(col("label")),
      FS.multiclass_label(col("cat")))).collect().map(_.getString(0))
    assert(out(0) == "1.500000,1,7")
    assert(out(1) == "2.500000,0,8")
  }

  test("csv format leaves empty slot for null values") {
    val out = Seq((java.lang.Double.valueOf(1.0), "x"))
      .toDF("a", "s")
      .select(FS.csvFormat(FS.continuous(col("a")),
        FS.continuous(lit(null).cast("double")), FS.continuous(lit(3.0))))
      .collect()(0).getString(0)
    assert(out == "1.000000,,3.000000")
  }

  test("libsvm format: label first, slot:value features") {
    val out = df.select(FS.libsvmFormat(
      FS.continuous(col("price")), FS.binary_label(col("label")),
      FS.continuous(col("cat")))).collect().map(_.getString(0))
    assert(out(0) == "1 1:1.500000 2:7.000000")
    assert(out(1) == "0 1:2.500000 2:8.000000")
  }

  test("libsvm bucketed discrete: (slot+hash%bucket):1, slot advances") {
    val out = df.select(FS.libsvmFormat(
      FS.discrete(col("cat"), 10L), FS.continuous(col("price"))))
      .collect()(0).getString(0)
    // slot starts at 1; discrete occupies buckets 1..10; continuous is slot 11
    val parts = out.split(" ")
    assert(parts.length == 2)
    val dslot = parts(0).split(":")(0).toLong
    assert(dslot >= 1L && dslot <= 10L && parts(0).endsWith(":1"))
    assert(parts(1) == "11:1.500000")
  }

  test("gcformat: label index| slot:hash(slot):value") {
    val h1 = FS.hashLongConst(1L)
    val out = df.select(FS.gcformat(
      FS.continuous(col("price")), FS.binary_label(col("label")),
      FS.gcformat_index(col("cat")))).collect().map(_.getString(0))
    assert(out(0) == s"1 7| 1:$h1:1.500000")
    assert(out(1) == s"0 8| 1:$h1:2.500000")
  }

  test("discrete hashes typed byte encodings, matching the SQL front-end") {
    import graft.functions.FarmHash
    // long column: 8 LE value bytes, not the string "7"
    val hl = df.select(FS.libsvmFormat(FS.discrete(col("cat"))))
      .collect()(0).getString(0)
    assert(hl == s"${FarmHash.ofLong(7L)}:1")
    // double column: NOT FarmHash.ofString("1.5")
    val hd = df.select(FS.libsvmFormat(FS.discrete(col("price"))))
      .collect()(0).getString(0)
    assert(hd == s"${FarmHash.ofDouble(1.5)}:1")
    // string columns keep the string-byte encoding
    val hs = Seq(Tuple1("abc")).toDF("s")
      .select(FS.libsvmFormat(FS.discrete(col("s"))))
      .collect()(0).getString(0)
    assert(hs == s"${FarmHash.ofString("abc")}:1")
  }

  test("gcformat without index uses a single-space separator") {
    val h1 = FS.hashLongConst(1L)
    val out = df.select(FS.gcformat(FS.continuous(col("price"))))
      .collect()(0).getString(0)
    assert(out == s" | 1:$h1:1.500000")
  }
}
