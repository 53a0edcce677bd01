package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

/** Invariants of the concat-and-chunk sequence packer: spans tile each
  * document exactly, packs fill to the budget except each shard's
  * last, and the layout is a pure function of the corpus. */
class PackingSpec extends SparkSpec {

  private def docs(counts: Seq[Long]) = {
    import spark.implicits._
    counts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "tk")
  }

  test("spans tile every document exactly, in order") {
    val d = docs(Seq(100L, 200L, 300L, 50L, 256L))
    val out = Packing.packSequences(d, col("doc_id"), col("tk"),
      budget = 256L, shards = 1).cache()
    // per doc: span lengths sum to the token count and doc_off tiles
    // [0, tk) without gaps
    val perDoc = out.groupBy("doc_id")
      .agg(sum("span_len").as("s"), min("doc_off").as("mn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val tk = Map(0L -> 100L, 1L -> 200L, 2L -> 300L, 3L -> 50L, 4L -> 256L)
    perDoc.foreach { case (id, s, mn) =>
      assert(s == tk(id), s"doc $id covered $s of ${tk(id)}")
      assert(mn == 0L)
    }
    // contiguity: each span starts where the previous one ended
    val spans = out.orderBy("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(5)))
    spans.groupBy(_._1).foreach { case (_, ss) =>
      ss.sortBy(_._2).foldLeft(0L) { case (at, (_, off, len)) =>
        assert(off == at); at + len
      }
    }
  }

  test("packs fill to the budget except the shard tail") {
    val d = docs(Seq.tabulate(40)(i => (i % 7 + 1) * 37L))
    val out = Packing.packSequences(d, col("doc_id"), col("tk"),
      budget = 256L, shards = 1).cache()
    val packs = out.groupBy("shard", "pack_id")
      .agg(sum("span_len").as("s")).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    val last = packs.map(_._1).max
    packs.foreach { case (p, s) =>
      if (p < last) assert(s == 256L, s"pack $p holds $s")
      else assert(s <= 256L)
    }
    // pack_off stays inside the budget
    assert(out.where(col("pack_off") < 0 ||
      col("pack_off") + col("span_len") > 256).isEmpty)
  }

  test("zero-token documents are dropped; sharding is deterministic") {
    val d = docs(Seq(10L, 0L, 20L))
    val out = Packing.packSequences(d, col("doc_id"), col("tk"),
      budget = 16L, shards = 4, salt = "t")
    assert(out.where(col("doc_id") === 1L).isEmpty)
    val a = out.collect().map(_.toSeq).toSet
    val b = Packing.packSequences(d.repartition(7), col("doc_id"),
      col("tk"), budget = 16L, shards = 4, salt = "t")
      .collect().map(_.toSeq).toSet
    assert(a == b, "layout must not depend on physical partitioning")
  }

  test("a document larger than the budget splits across packs") {
    val d = docs(Seq(600L))
    val out = Packing.packSequences(d, col("doc_id"), col("tk"),
      budget = 256L, shards = 1).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((0L, 0L, 0L, 256L), (1L, 256L, 0L, 256L),
      (2L, 512L, 0L, 88L)))
  }
  test("packTexts reassembles the exact token stream per pack") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c d e"), (1L, "f g h"), (2L, "i j k l m n o p")
    ).toDF("doc_id", "text")
    val out = Packing.packTexts(docs, col("doc_id"), col("text"),
        budget = 6L, shards = 1)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // shard stream: a b c d e | f g h | i j k l m n o p  (16 tokens)
    // packs of 6: [a b c d e f] [g h i j k l] [m n o p]
    assert(out.toSeq == Seq(
      (0L, "a b c d e f", 6L),
      (1L, "g h i j k l", 6L),
      (2L, "m n o p", 4L)))
  }
  test("shuffled packing permutes stream order, keeps tiling + determinism") {
    val d = docs(Seq.tabulate(30)(i => (i % 5 + 1) * 10L))
    val plain = Packing.packSequences(d, col("doc_id"), col("tk"),
      budget = 64L, shards = 1).collect().map(_.toSeq).toSet
    val shuf = Packing.packSequences(d, col("doc_id"), col("tk"),
      budget = 64L, shards = 1, shuffled = true).cache()
    val shufSet = shuf.collect().map(_.toSeq).toSet
    assert(shufSet != plain, "shuffled order must differ from id order")
    // every doc still fully tiled
    val per = shuf.groupBy("doc_id").agg(sum("span_len").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L until 30L).foreach(id => assert(per(id) == (id % 5 + 1) * 10L))
    // pure function of the corpus
    val again = Packing.packSequences(d.repartition(5), col("doc_id"),
        col("tk"), budget = 64L, shards = 1, shuffled = true)
      .collect().map(_.toSeq).toSet
    assert(again == shufSet)
  }

  test("writeShards: one ordered file per shard; manifest matches the " +
      "source; layout is input-partitioning-independent") {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString + "/rel"
    val docs = (0L until 200L)
      .map(i => (i, s"doc $i body " + ("w " * (i % 7).toInt)))
      .toDF("doc_id", "text")
      .withColumn("toks", graft.operators.TextOps.tokenCount(col("text")))
    Packing.writeShards(docs, col("doc_id"), shards = 8,
      salt = "s14", outDir = out)
    // exactly one data file per shard directory
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(dirs.length == 8)
    dirs.foreach { sd =>
      val parts = sd.listFiles().filter(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${sd.getName}: ${parts.length} files")
      // in-shard order is the content-addressed coordinate: reading
      // the single file back preserves it
      val ids = spark.read.parquet(parts.head.getPath)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      val want = ids.sortBy(i =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(i + ":o:s14"))
      assert(ids == want, s"${sd.getName} not in coordinate order")
    }
    // manifest of the written shards == manifest of the source corpus
    val back = Packing.shardManifest(spark.read.parquet(out),
      col("shard"), col("doc_id"), col("text"), col("toks"))
      .collect().map(_.toSeq).toSet
    val src = Packing.shardManifest(
      docs.withColumn("shard",
        Packing.shardOf(col("doc_id"), 8, "s14")),
      col("shard"), col("doc_id"), col("text"), col("toks"))
      .collect().map(_.toSeq).toSet
    assert(back == src)
    // re-writing from a differently-partitioned input produces the
    // same shard contents (retry/cluster-size independence)
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_shards2").toString + "/rel"
    Packing.writeShards(docs.repartition(13), col("doc_id"), shards = 8,
      salt = "s14", outDir = out2)
    val again = Packing.shardManifest(spark.read.parquet(out2),
      col("shard"), col("doc_id"), col("text"), col("toks"))
      .collect().map(_.toSeq).toSet
    assert(again == back)
  }
}