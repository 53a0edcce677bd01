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

  test("zero-token documents emit nothing and advance nothing") {
    val docs = Seq(Doc(1L, 0L, 0L), Doc(2L, 0L, 5L)).toDS()
      .coalesce(1).sortWithinPartitions("doc_id")
    val out = StreamingPacking.packStream(docs, budget = 10L)
      .collect().sortBy(_.doc_id)
    assert(out.toSeq == Seq(Span(2L, 0L, 0L, 0L, 0L, 5L)))
  }
}
