package graft

import java.nio.file.Files

import graft.streaming.StreamingPacking
import graft.streaming.StreamingPacking.{Doc, Span}

/** The packer's per-shard offset state is exactly what a crash would
  * corrupt: a restart that lost it would re-pack post-restart docs
  * from offset 0, overlapping the pre-restart spans. This spec stops a
  * checkpointed query mid-feed, restarts it from the same checkpoint,
  * and asserts the combined span layout equals the uninterrupted run's
  * (the batch invocation of the same operator over the full feed).
  * File sources are replayable, so this exercises the real recovery
  * path (offset log + state store), like StreamingRecoverySpec does
  * for dedup. */
class StreamingPackingRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("per-shard pack offsets survive a checkpointed restart") {
    val budget = 10L
    val root = Files.createTempDirectory("graft_pack_rec").toFile
    root.deleteOnExit()
    val srcDir = s"${root.getAbsolutePath}/src"
    val ckpt = s"${root.getAbsolutePath}/ckpt"
    new java.io.File(srcDir).mkdirs()

    def writeBatch(docs: Seq[Doc]): Unit =
      docs.toDS().coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(collector: scala.collection.mutable.Buffer[Span]): Unit = {
      val src = spark.readStream
        .schema("doc_id LONG, shard LONG, tk LONG")
        .parquet(srcDir).as[Doc]
      val q = StreamingPacking.packStream(src, budget)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Span], _: Long) =>
          collector.synchronized { collector ++= batch.collect() }
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }

    // two shards, spans crossing pack boundaries on both (budget 10);
    // doc_ids increase across batches so the feed is in order and the
    // uninterrupted batch layout is the ground truth
    val feed1 = Seq(Doc(1, 0, 4), Doc(2, 1, 7), Doc(3, 0, 8), Doc(4, 1, 6))
    val feed2 = Seq(Doc(5, 0, 3), Doc(6, 1, 9), Doc(7, 0, 12), Doc(8, 1, 1))

    writeBatch(feed1)
    val out1 = scala.collection.mutable.Buffer[Span]()
    runOnce(out1)

    writeBatch(feed2)
    val out2 = scala.collection.mutable.Buffer[Span]()
    runOnce(out2) // restarted from ckpt: must resume at shard offsets 12/13

    // ground truth: one batch invocation over the whole feed (each
    // shard group processed in a single call with fresh state)
    val full = StreamingPacking.packStream((feed1 ++ feed2).toDS(), budget)
      .collect().toSet
    val streamed = (out1 ++ out2).toSet
    assert(streamed == full,
      s"restart layout diverged:\n streamed=$streamed\n full=$full")
    // and the restart really did continue mid-pack rather than
    // restarting offsets: doc 5 (shard 0) starts at stream offset 12,
    // i.e. inside pack 1 at pack_off 2
    val d5 = out2.filter(_.doc_id == 5L)
    assert(d5.map(s => (s.pack_id, s.pack_off)) == Seq((1L, 2L)),
      s"doc 5 spans $d5 — shard offset state not recovered")
  }
}
