package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.WindowOps
import graft.streaming.RequestStream
import graft.streaming.RequestStream._

class RequestStreamSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    Event("u1", 10L, 1.0), Event("u1", 20L, 2.0), Event("u1", 30L, 3.0),
    Event("u1", 200L, 4.0), Event("u2", 15L, 10.0))

  test("batch deploy computes point-in-time frames per event") {
    val out = deploy(events.toDS(), precedingMs = 25L)
      .collect().map(f => (f.key, f.tsMs) -> (f.sum, f.cnt)).toMap
    assert(out(("u1", 10L)) == (1.0, 1L))
    assert(out(("u1", 20L)) == (3.0, 2L))
    assert(out(("u1", 30L)) == (6.0, 3L))   // [5,30]
    assert(out(("u1", 200L)) == (4.0, 1L))  // old rows out of frame
    assert(out(("u2", 15L)) == (10.0, 1L))
  }

  test("TTL latest-count bounds the buffer") {
    val out = deploy(events.toDS(), precedingMs = 1000L,
      ttl = LatestCount(2))
      .collect().map(f => (f.key, f.tsMs) -> f.cnt).toMap
    assert(out(("u1", 200L)) == 2L) // buffer held only the 2 newest
  }

  test("TTL abs-or-lat evicts on either limit") {
    val out = deploy(events.toDS(), precedingMs = 1000L,
      ttl = AbsOrLat(ms = 15L, n = 10))
      .collect().map(f => (f.key, f.tsMs) -> f.cnt).toMap
    assert(out(("u1", 30L)) == 2L) // ts=10 older than 30-15
  }

  test("long-window deploy equals plain deploy on sum/cnt") {
    val rng = new scala.util.Random(11)
    val many = (1 to 400).map { i =>
      Event(if (i % 2 == 0) "a" else "b", rng.nextInt(5000).toLong,
        rng.nextInt(50).toDouble)
    }
    // time-TTL must retain at least the frame span for partial/raw parity
    val ttl = AbsoluteTime(10000L)
    val plain = deploy(many.toDS(), precedingMs = 1000L, ttl = ttl)
      .collect().map(f => (f.key, f.tsMs, f.sum, f.cnt)).sortBy(t => (t._1, t._2, t._3))
    val lw = deployLongWindow(many.toDS(), precedingMs = 1000L,
        bucketMs = 100L, ttl = ttl)
      .collect().map(f => (f.key, f.tsMs, f.sum, f.cnt)).sortBy(t => (t._1, t._2, t._3))
    assert(plain.length == lw.length)
    plain.zip(lw).foreach { case (p, l) =>
      assert(p._1 == l._1 && p._2 == l._2 && p._4 == l._4, s"$p vs $l")
      assert(math.abs(p._3 - l._3) < 1e-6, s"$p vs $l")
    }
  }

  test("streaming (MemoryStream) agrees with the batch frame semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = deploy(mem.toDS(), precedingMs = 25L)
      .writeStream.format("memory").queryName("rs_out")
      .outputMode("append").start()
    mem.addData(events.take(3): _*)   // first micro-batch
    q.processAllAvailable()
    mem.addData(events.drop(3): _*)   // second micro-batch (state carries)
    q.processAllAvailable()
    val streamed = spark.table("rs_out")
      .select("key", "tsMs", "sum", "cnt")
      .as[(String, Long, Double, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    q.stop()

    // batch equivalent via the frameArray path (train/serve consistency)
    val df = events.toDF()
    val arr = WindowOps.frameArray(col("value"), col("tsMs"), col("tsMs"),
      Seq(col("key")), 25L)
    val batch = df.select(col("key"), col("tsMs"),
        WindowOps.aggSum(arr).as("s"), WindowOps.aggCount(arr).as("c"))
      .as[(String, Long, Double, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap

    assert(streamed == batch)
  }
}
