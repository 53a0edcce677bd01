package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Packing, TextOps}
import graft.streaming.StreamingPacking
import graft.streaming.StreamingPacking.{Doc, Span}

/** The streaming packer must agree with the batch layout on in-order
  * feeds, and its per-shard offset state must carry across
  * micro-batches. */
class StreamingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("batch parity: in-order feed reproduces packSequences exactly") {
    val dir = "/root/testdata/sf0.001"
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = Packing.packSequences(base, col("doc_id"),
        TextOps.tokenCount(col("text")), budget = 256L, shards = 4,
        salt = "sp")
      .collect().map(_.toSeq).toSet
    val stream = StreamingPacking.packStream(
        base.select(col("doc_id"),
            Packing.shardOf(col("doc_id"), 4, "sp").as("shard"),
            TextOps.tokenCount(col("text")).cast("long").as("tk"))
          .as[Doc].coalesce(1).sortWithinPartitions("doc_id"),
        budget = 256L)
      .toDF().collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("offset state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingPacking.packStream(mem.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("sp_out")
      .outputMode("append").start()
    try {
      mem.addData(Doc(1L, 0L, 6L))
      q.processAllAvailable()
      // second batch: the shard stream continues at offset 6
      mem.addData(Doc(2L, 0L, 8L))
      q.processAllAvailable()
      val rows = spark.table("sp_out").as[Span].collect().sortBy(_.doc_id)
      assert(rows.toSeq == Seq(
        Span(1L, 0L, 0L, 0L, 0L, 6L),
        Span(2L, 0L, 0L, 0L, 6L, 4L),  // fills pack 0 to its 10
        Span(2L, 0L, 1L, 4L, 0L, 4L))) // spills into pack 1
    } finally q.stop()
  }

  test("intra-batch disorder repairs to batch parity (doc_id sort)") {
    implicit val sqlCtx = spark.sqlContext
    // docs shuffled WITHIN one micro-batch: layout must equal the
    // in-order feed's — the packer sorts each batch's group by doc_id
    val docs = Seq(Doc(3L, 0L, 4L), Doc(1L, 0L, 6L), Doc(2L, 0L, 8L),
      Doc(5L, 1L, 7L), Doc(4L, 1L, 5L))
    val mem = MemoryStream[Doc]
    val q = StreamingPacking.packStream(mem.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("sp_shuf")
      .outputMode("append").start()
    val inOrder = StreamingPacking.packStream(
      docs.sortBy(_.doc_id).toDS().coalesce(1)
        .sortWithinPartitions("doc_id"), budget = 10L)
      .collect().toSet
    try {
      mem.addData(docs: _*) // one batch, shuffled arrival
      q.processAllAvailable()
      val rows = spark.table("sp_shuf").as[Span].collect().toSet
      assert(rows == inOrder)
    } finally q.stop()
  }

  test("cross-batch disorder follows arrival semantics: divergent " +
      "layout, invariants hold (documented fallback)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingPacking.packStream(mem.toDS(), budget = 10L)
      .writeStream.format("memory").queryName("sp_ooo")
      .outputMode("append").start()
    try {
      // doc 2 arrives a micro-batch BEFORE doc 1
      mem.addData(Doc(2L, 0L, 8L))
      q.processAllAvailable()
      mem.addData(Doc(1L, 0L, 6L))
      q.processAllAvailable()
      val rows = spark.table("sp_ooo").as[Span].collect().toSeq
      // arrival order owns the stream: doc 2 occupies [0, 8), doc 1
      // appends at 8 — NOT the batch layout (which would place doc 1
      // first); this is the pinned divergence
      assert(rows.sortBy(r => (r.pack_id, r.pack_off)) == Seq(
        Span(2L, 0L, 0L, 0L, 0L, 8L),
        Span(1L, 0L, 0L, 0L, 8L, 2L),
        Span(1L, 0L, 1L, 2L, 0L, 4L)))
      // invariants: spans tile each doc's tokens; offsets stay in-budget
      val byDoc = rows.groupBy(_.doc_id)
      assert(byDoc(1L).map(_.span_len).sum == 6L)
      assert(byDoc(2L).map(_.span_len).sum == 8L)
      assert(rows.forall(r => r.pack_off >= 0 && r.pack_off < 10 &&
        r.span_len > 0 && r.pack_off + r.span_len <= 10))
    } finally q.stop()
  }

  test("zero-token documents emit nothing and advance nothing") {
    val docs = Seq(Doc(1L, 0L, 0L), Doc(2L, 0L, 5L)).toDS()
      .coalesce(1).sortWithinPartitions("doc_id")
    val out = StreamingPacking.packStream(docs, budget = 10L)
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == Seq(Span(2L, 0L, 0L, 0L, 0L, 5L)))
  }
}
