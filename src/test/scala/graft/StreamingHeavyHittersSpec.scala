package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{GraftAggregates => A}

/** The Misra–Gries sketch as a STREAMING aggregation: the Aggregator
  * buffer is the streaming state, each micro-batch merges its partial
  * sketch into it — the mergeable-summaries guarantee is exactly what
  * makes the same aggregate correct over an unbounded stream (hot-key /
  * hot-domain detection on ingest). No new operator code: the batch
  * Aggregator IS the streaming one. */
class StreamingHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[String]], cap: Int,
      byKey: Boolean = false): Map[(String, String), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)] // (group, token)
    val df = mem.toDF().toDF("grp", "tok")
    val agg =
      if (byKey) df.groupBy("grp").agg(A.heavy_hitters(col("tok"), cap).as("m"))
      else df.groupBy().agg(A.heavy_hitters(col("tok"), cap).as("m"))
    val qname = s"hh_${if (byKey) "g" else "all"}_${System.nanoTime()}"
    val q = agg.writeStream.format("memory").queryName(qname)
      .outputMode("complete").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map(t => (s"g${t.length % 2}", t)): _*)
        q.processAllAvailable()
      }
      val out = spark.table(qname)
      val rows =
        if (byKey) out.select(col("grp"), explode(col("m")))
        else out.select(lit("all").as("grp"), explode(col("m")))
      rows.as[(String, String, Long)].collect()
        .map { case (g, t, c) => (g, t) -> c }.toMap
    } finally q.stop()
  }

  test("guarantee holds across micro-batch merges") {
    val b1 = Seq.fill(400)("hot") ++ (1 to 300).map(i => s"c${i % 90}")
    val b2 = Seq.fill(250)("warm") ++ (1 to 200).map(i => s"d${i % 80}")
    val b3 = Seq.fill(150)("hot") ++ (1 to 100).map(i => s"e${i % 50}")
    val all = b1 ++ b2 ++ b3
    val cap = 12
    val m = runStream(Seq(b1, b2, b3), cap)
      .map { case ((_, t), c) => t -> c }
    assert(m.size <= cap)
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = all.size.toDouble / (cap + 1)
    exact.foreach { case (t, c) =>
      if (c > slack) assert(m.contains(t), s"missing hot item $t ($c)")
    }
    m.foreach { case (t, est) =>
      val c = exact(t)
      assert(est <= c && c - est <= slack, s"$t est=$est true=$c")
    }
    assert(m.contains("hot") && m.contains("warm"))
  }

  test("grouped streaming sketches keep per-key state") {
    val b1 = Seq.fill(60)("aa") ++ Seq.fill(40)("b")
    val b2 = Seq.fill(30)("aa") ++ Seq.fill(50)("b")
    val m = runStream(Seq(b1, b2), cap = 4, byKey = true)
    // "aa".length % 2 == 0 -> g0; "b" -> g1: exact per-group counts
    // (distinct-per-group is under the cap, so no decrements)
    assert(m(("g0", "aa")) == 90L)
    assert(m(("g1", "b")) == 90L)
  }
}
