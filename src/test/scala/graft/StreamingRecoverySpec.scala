package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc

/** Production resilience of the stateful streaming operators: the
  * flatMapGroupsWithState dedup state must survive a query STOP and a
  * checkpointed RESTART — a duplicate of a document first seen before
  * the restart stays suppressed after it. File sources are replayable,
  * so this exercises the real recovery path (offset log + state store),
  * not a MemoryStream approximation. */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("firstSeen dedup state survives a checkpointed restart") {
    val root = Files.createTempDirectory("graft_stream_rec").toFile
    root.deleteOnExit()
    val srcDir = s"${root.getAbsolutePath}/src"
    val ckpt = s"${root.getAbsolutePath}/ckpt"
    new java.io.File(srcDir).mkdirs()

    def writeBatch(name: String, docs: Seq[Doc]): Unit =
      docs.toDS().coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(collector: scala.collection.mutable.Buffer[Doc]): Unit = {
      val src = spark.readStream
        .schema("doc_id LONG, text STRING")
        .parquet(srcDir).as[Doc]
      val q = StreamingDedup.firstSeen(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Doc], _: Long) =>
          collector.synchronized { collector ++= batch.collect() }
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
    }

    // run 1: 'alpha' (id 1) wins over its same-batch duplicate (id 3)
    writeBatch("f1", Seq(Doc(1, "alpha"), Doc(2, "beta"), Doc(3, "alpha")))
    val out1 = scala.collection.mutable.Buffer[Doc]()
    runOnce(out1)
    assert(out1.map(_.doc_id).sorted == Seq(1L, 2L),
      s"first run emitted ${out1.toList}")

    // run 2 from the SAME checkpoint: duplicates of pre-restart content
    // must stay suppressed by the RECOVERED state; only 'gamma' is new
    writeBatch("f2", Seq(Doc(4, "beta"), Doc(5, "gamma"), Doc(6, "alpha")))
    val out2 = scala.collection.mutable.Buffer[Doc]()
    runOnce(out2)
    assert(out2.map(d => (d.doc_id, d.text)) == Seq((5L, "gamma")),
      s"restart emitted ${out2.toList} — state not recovered")
  }
}
