package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc

/** Streaming exact dedup agrees with the batch operator
  * (train/serve consistency for the dedup decision). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): Seq[Doc] = {
    val texts = Seq("alpha beta", "gamma", "alpha beta", "delta epsilon",
      "gamma", "zeta", "alpha beta", "eta theta", "zeta", "iota")
    texts.zipWithIndex.map { case (t, i) => Doc(i.toLong, t) }
  }

  test("firstSeen (batch Dataset) keeps exactly the batch keep_ids") {
    val docs = corpus()
    // single sorted partition pins arrival order to doc_id order —
    // "first seen" is then exactly the batch groupBy's min(doc_id)
    val kept = StreamingDedup.firstSeen(
        docs.toDS().coalesce(1).sortWithinPartitions("doc_id"))
      .collect().map(_.doc_id).sorted
    val batchKeep = Dedup.exact(docs.toDF(), "doc_id", "text")
      .select("keep_id").as[Long].collect().sorted
    assert(kept.sameElements(batchKeep))
  }

  test("firstSeen over MemoryStream dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus()
    // duplicates arrive only in LATER micro-batches than their first
    // occurrence, so first-seen is deterministic regardless of the
    // within-batch group iterator order
    val batch1 = docs.filter(d => Seq(0L, 1L, 3L, 5L).contains(d.doc_id))
    val batch2 = docs.filter(d => Seq(2L, 4L, 7L, 8L).contains(d.doc_id))
    val batch3 = docs.filter(d => Seq(6L, 9L).contains(d.doc_id))
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.firstSeen(mem.toDS())
      .writeStream.format("memory").queryName("sd_out")
      .outputMode("append").start()
    Seq(batch1, batch2, batch3).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    val kept = spark.table("sd_out").as[Doc].collect().map(_.doc_id).sorted
    q.stop()
    val batchKeep = Dedup.exact(docs.toDF(), "doc_id", "text")
      .select("keep_id").as[Long].collect().sorted
    assert(kept.sameElements(batchKeep))
  }

  test("lshFirstSeen (streaming) agrees with the batch verdicts") {
    // near-dup corpus: docs 2 and 4 shingle-overlap doc 0 heavily
    val docs = Seq(
      Doc(0L, "the quick brown fox jumps over the lazy dog"),
      Doc(1L, "entirely different words compose this document body"),
      Doc(2L, "the quick brown fox jumps over the lazy cat"),
      Doc(3L, "short"),
      Doc(4L, "quick brown fox jumps over the lazy dog today"),
      Doc(5L, ""))
    val batch = Dedup.lshFirstSeen(docs.toDF(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(batch(0) == false && batch(1) == false && batch(3) == false)
    assert(batch(5) == false) // empty doc: no shingles, no verdict
    assert(batch(2) || batch(4), "expected at least one near-dup hit")

    // streaming, one doc per micro-batch in doc_id order, then reduce
    // bucket verdicts per doc at the sink — must equal batch exactly
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.lshFirstSeen(mem.toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("lsh_seen")
      .outputMode("append").start()
    docs.foreach { d => mem.addData(d); q.processAllAvailable() }
    val streamed = spark.table("lsh_seen")
      .groupBy("doc_id").agg(min("matched_id").as("matched_id"))
      .collect()
      .map(r => (r.getLong(0), !r.isNullAt(1))).toMap
    q.stop()
    docs.filter(_.text.nonEmpty).foreach { d =>
      assert(streamed(d.doc_id) == batch(d.doc_id),
        s"doc ${d.doc_id}: stream ${streamed(d.doc_id)} vs " +
          s"batch ${batch(d.doc_id)}")
    }
    assert(!streamed.contains(5L), "empty doc should emit no buckets")
  }

  test("streaming hot-bucket cap: dormant after the cap, under-cap " +
      "buckets keep batch parity (arrival semantics pinned)") {
    implicit val sqlCtx = spark.sqlContext
    // 6 identical docs — every band bucket fills with all of them —
    // plus an unrelated pair that matches through small buckets
    val boiler = (0L until 6L).map(i => Doc(i, "common template body text"))
    val pair = Seq(Doc(10L, "unique alpha beta gamma delta"),
      Doc(11L, "unique alpha beta gamma delta"))
    val docs = boiler ++ pair
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.lshFirstSeen(mem.toDF(), "doc_id", "text",
        maxBucketSize = 3)
      .writeStream.format("memory").queryName("lsh_cap")
      .outputMode("append").start()
    try {
      docs.foreach { d => mem.addData(d); q.processAllAvailable() }
      val verdicts = spark.table("lsh_cap")
        .groupBy("doc_id").agg(min("matched_id").as("matched_id"))
        .collect().map(r => (r.getLong(0), !r.isNullAt(1))).toMap
      // arrivals before the cap matched (docs 1, 2 against owner 0);
      // arrivals after the bucket went dormant did not (docs 3..5) —
      // the divergence from the batch cap, which drops the whole
      // bucket retroactively, is exactly these pre-cap verdicts
      assert(verdicts(1L) && verdicts(2L), s"pre-cap arrivals: $verdicts")
      assert(!verdicts(3L) && !verdicts(4L) && !verdicts(5L),
        s"post-cap arrivals must be dormant: $verdicts")
      // the small-bucket pair is untouched by the cap — batch parity
      assert(!verdicts(10L) && verdicts(11L), s"small bucket: $verdicts")
      val batchCapped = Dedup.lshFirstSeen(docs.toDF(), "doc_id", "text",
          maxBucketSize = 3)
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(!batchCapped(1L) && !batchCapped(2L),
        "batch cap drops the hot bucket retroactively (documented)")
      assert(batchCapped(11L) && !batchCapped(10L))
    } finally q.stop()
  }

  test("stateTtl re-arms on dormant-bucket arrivals (no immortal " +
      "state) and an idle capped bucket ages out — the TTL trade") {
    implicit val sqlCtx = spark.sqlContext
    // cap=2: doc 0 claims (seen=1), doc 1 matches and caps (seen=2),
    // doc 2's DORMANT arrival must RE-ARM the 6 s TTL — GroupState
    // clears a timeout not re-set during an invocation, so the pre-fix
    // code (which skipped the call on dormant arrivals) made capped-
    // bucket state immortal. After traffic stops the bucket must age
    // out: doc 3 re-claims the expired bucket and doc 4 matches doc 3.
    // Under the pre-fix leak the state never expires, doc 4 stays
    // dormant, and the final assertion fails (verified vs the revert).
    val mem = MemoryStream[Doc]
    // ProcessingTimeTimeout makes shouldRunAnotherBatch always-true, so
    // with no-data micro-batches enabled the engine busy-loops and
    // processAllAvailable never observes noNewData — disable them so
    // timeouts fire only when a data batch runs (deterministic here:
    // the unrelated-key batch below is that batch)
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noDataKey)
    spark.conf.set(noDataKey, "false")
    val q = StreamingDedup.lshFirstSeen(mem.toDF(), "doc_id", "text",
        stateTtl = Some("6 seconds"), maxBucketSize = 2)
      .writeStream.format("memory").queryName("lsh_ttl")
      .outputMode("append").start()
    try {
      val hot = "common template body text"
      mem.addData(Doc(0L, hot)); q.processAllAvailable() // claims (1/2)
      mem.addData(Doc(1L, hot)); q.processAllAvailable() // matches, caps
      Thread.sleep(1000)
      mem.addData(Doc(2L, hot)); q.processAllAvailable() // dormant, re-arms
      // idle well past the re-armed expiry; the unrelated-key batch is
      // the data batch whose run fires the timeout and drops the state
      Thread.sleep(8000)
      mem.addData(Doc(100L, "unrelated other content"))
      q.processAllAvailable()
      mem.addData(Doc(3L, hot)); q.processAllAvailable() // re-claims
      mem.addData(Doc(4L, hot)); q.processAllAvailable() // matches doc 3
      val verdicts = spark.table("lsh_ttl")
        .groupBy("doc_id").agg(min("matched_id").as("matched_id"))
        .collect().map(r =>
          (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(verdicts(1L).contains(0L), s"pre-cap match: $verdicts")
      assert(verdicts(2L).isEmpty,
        s"dormant arrival must not match: $verdicts")
      assert(verdicts(3L).isEmpty,
        s"doc 3 re-claims the aged-out bucket: $verdicts")
      assert(verdicts(4L).contains(3L),
        "idle capped bucket must age out and re-open (pre-fix leak " +
          s"keeps it dormant forever): $verdicts")
    } finally {
      q.stop()
      spark.conf.set(noDataKey, prevNoData)
    }
  }

  test("withinWatermark drops duplicates inside the lateness bound") {
    implicit val sqlCtx = spark.sqlContext
    case class Ev(doc_id: Long, text: String, ts: java.sql.Timestamp)
    val mem = MemoryStream[(Long, String, Long)]
    val stream = mem.toDS()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_millis(col("_3")).as("ts"))
    val q = StreamingDedup.withinWatermark(stream, "text", "ts", "10 seconds")
      .writeStream.format("memory").queryName("sd_wm")
      .outputMode("append").start()
    // duplicates arrive in later micro-batches (within one batch the
    // surviving row of a dup group is iterator-order-dependent)
    mem.addData((0L, "aa", 1000L), (1L, "bb", 2000L))
    q.processAllAvailable()
    mem.addData((2L, "aa", 3000L), (3L, "aa", 4000L), (4L, "cc", 5000L))
    q.processAllAvailable()
    val kept = spark.table("sd_wm").select("doc_id").as[Long]
      .collect().sorted
    q.stop()
    // aa keeps only its first arrival within the watermark; bb/cc unique
    assert(kept.sameElements(Array(0L, 1L, 4L)))
  }

  test("streaming decontamination verdicts equal the batch operator's") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val probes = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val want = Dedup.decontaminateBloom(train, probes, "doc_id", "text",
        n = 3)
      .select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toMap

    // probe filter built ONCE; the corpus arrives in three batches
    val pf = Dedup.probeFilter(probes, "text", n = 3)
    val rows = train.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).map { case (i, t) => Doc(i, t) }
    val got = scala.collection.mutable.Map.empty[Long, Boolean]
    val mem = MemoryStream[Doc]
    val q = StreamingDedup.decontaminate(mem.toDF(), pf,
      "doc_id", "text") { (out, _) =>
      out.select("doc_id", "contaminated").collect()
        .foreach(r => got.synchronized {
          got(r.getLong(0)) = r.getBoolean(1)
        })
    }
    rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
      mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
    }
    q.stop()
    assert(got.toMap == want)
    assert(want.values.count(identity) > 0) // the corpus really overlaps
  }
}
