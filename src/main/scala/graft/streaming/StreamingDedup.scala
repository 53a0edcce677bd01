package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the online half of
  * [[graft.operators.Dedup.exact]] for a continuously-ingested corpus
  * (the reference's online tables receive the same INSERT stream its
  * batch snapshots are built from; a training-data pipeline needs the
  * streaming dedup decision to agree with the batch one).
  *
  * Two formulations, both keyed by the 64-bit content hash so state
  * shards across executors on the same shuffle Spark already plans:
  *
  *  - [[withinWatermark]]: Spark-native `dropDuplicatesWithinWatermark`
  *    — bounded state (hashes older than the watermark are dropped),
  *    the right default at 100 TB/day ingest where a duplicate beyond
  *    the lateness bound is acceptable.
  *  - [[firstSeen]]: `flatMapGroupsWithState` keeping one boolean per
  *    distinct hash with an optional processing-time TTL — exact
  *    first-seen-wins for as long as the state is retained; state =
  *    O(distinct hashes alive), the same bound the batch groupBy pays
  *    per shuffle partition.
  *
  * Train/serve parity (asserted in StreamingDedupSpec): feeding the
  * batch corpus through either operator keeps exactly the rows whose
  * doc_id == the batch `Dedup.exact` keep_id, provided ingestion
  * order is doc_id order (ties in a batch groupBy keep min id;
  * streaming keeps the first arrival).
  */
object StreamingDedup {

  /** Content hash used by both operators — xxhash64 over the exact
    * text, matching the batch operator's grouping granularity. */
  def contentHash(textCol: String): org.apache.spark.sql.Column =
    xxhash64(col(textCol))

  /** Native bounded-state dedup: keeps the first row per content hash
    * among rows within the watermark lateness of each other.
    * `eventTimeCol` must be a TimestampType column. */
  def withinWatermark(docs: DataFrame, textCol: String,
      eventTimeCol: String, lateness: String): DataFrame =
    docs.withColumn("__content_hash", contentHash(textCol))
      .withWatermark(eventTimeCol, lateness)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")

  case class Doc(doc_id: Long, text: String)

  case class BucketRow(doc_id: Long, band: Int, bh: String)
  case class BucketMatch(doc_id: Long, matched_id: Option[Long])

  /** Bucket state: the first-arrived claimant plus the arrivals seen —
    * two longs per live (band, bucket). */
  case class BucketState(owner: Long, seen: Long)

  /** Streaming incremental LSH near-dup — the online half of
    * [[graft.operators.Dedup.lshFirstSeen]]: state is two longs per
    * live (band, bucket) — the first-arrived claimant and the arrival
    * count — sharded on the bucket key Spark already shuffles on.
    * Emits one verdict per input bucket row; the per-document
    * reduction (is_dup = any match, matched_id = min) is a trivial
    * groupBy at the consumer (or sink side), keeping this operator
    * single-stateful-stage. Within a micro-batch rows claim in doc_id
    * order, so an in-order feed reproduces the batch verdicts exactly
    * (StreamingDedupSpec); under out-of-order arrival the FIRST
    * ARRIVAL owns the bucket — arrival semantics, like [[firstSeen]].
    * `stateTtl` bounds state by processing-time expiry.
    *
    * `maxBucketSize` is the streaming face of the batch operator's
    * hot-bucket cap, under arrival semantics: once a bucket has seen
    * `maxBucketSize` docs it goes DORMANT — later arrivals neither
    * match through it nor claim it. Verdicts already emitted stand
    * (append mode cannot retract), so it diverges from the batch cap
    * exactly where arrival order must: the batch form drops an
    * over-cap bucket retroactively, the stream stops it going forward.
    * Buckets that never exceed the cap agree with batch exactly —
    * both halves pinned in StreamingDedupSpec.
    *
    * `stateTtl` is a SLIDING processing-time TTL re-armed on every
    * arrival — including arrivals at a dormant (capped) bucket, which
    * would otherwise CLEAR the timeout (GroupState drops an unset
    * timeout on each invocation) and leak the hottest buckets' state
    * forever. The cap holds while traffic continues; a bucket idle
    * past the TTL ages out and may be re-claimed by later arrivals —
    * the documented TTL/recall trade, pinned in StreamingDedupSpec. */
  def lshFirstSeen(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 4, rowsPerBand: Int = 3,
      stateTtl: Option[String] = None,
      maxBucketSize: Int = 0): Dataset[BucketMatch] = {
    implicit val rowEnc = Encoders.product[BucketRow]
    implicit val outEnc = Encoders.product[BucketMatch]
    implicit val stEnc = Encoders.product[BucketState]
    implicit val strEnc = Encoders.STRING
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    graft.operators.Dedup.lshBuckets(docs, idCol, textCol,
        bands, rowsPerBand)
      .as[BucketRow]
      .groupByKey(r => r.band + "|" + r.bh)
      .flatMapGroupsWithState[BucketState, BucketMatch](
        OutputMode.Append(), timeout) { (_, rows, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          var st: Option[BucketState] = state.getOption
          val out = rows.toVector.sortBy(_.doc_id).map { r =>
            val dormant = maxBucketSize > 0 &&
              st.exists(_.seen >= maxBucketSize)
            val verdict = st match {
              case _ if dormant => BucketMatch(r.doc_id, None)
              case Some(s) if s.owner != r.doc_id =>
                BucketMatch(r.doc_id, Some(s.owner))
              case Some(_) => BucketMatch(r.doc_id, None)
              case None => BucketMatch(r.doc_id, None)
            }
            if (!dormant) {
              st = Some(st.map(s => s.copy(seen = s.seen + 1))
                .getOrElse(BucketState(r.doc_id, 1L)))
              state.update(st.get)
            }
            // the TTL is SLIDING and must be re-armed on EVERY
            // invocation — GroupState clears a previously-set timeout
            // whenever the function runs for a key without setting a
            // new one, so skipping this on dormant arrivals would make
            // a capped bucket's state immortal once traffic hits it
            // (an unbounded state leak on exactly the hottest keys).
            // Re-arming on dormant arrivals keeps the cap in force
            // while traffic continues; only a genuinely idle bucket
            // ages out (and may be re-claimed — the documented TTL
            // trade). State exists on every path here — dormancy
            // requires existing state, and the non-dormant branch
            // just updated it.
            stateTtl.foreach(state.setTimeoutDuration)
            verdict
          }
          out.iterator
        }
      }
  }

  /** Exact first-seen-wins dedup: emits a document only when its
    * content hash has not been seen before. `stateTtl` (e.g. "2 hours")
    * bounds state by processing-time expiry; None retains state for
    * the query lifetime (exact, unbounded). */
  def firstSeen(docs: Dataset[Doc],
      stateTtl: Option[String] = None): Dataset[Doc] = {
    implicit val docEnc = Encoders.product[Doc]
    implicit val longEnc = Encoders.scalaLong
    implicit val boolEnc = Encoders.scalaBoolean
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .groupByKey(d => graft.functions.FarmHash.hash64(
        d.text.getBytes("UTF-8")))
      .flatMapGroupsWithState[Boolean, Doc](
        OutputMode.Append(), timeout) { (_, rows, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) Iterator.empty
        else {
          state.update(true)
          stateTtl.foreach(state.setTimeoutDuration)
          // several same-hash rows may land in one micro-batch: keep
          // only the first (batch Datasets deliver all rows at once)
          rows.take(1)
        }
      }
  }

  /** Streaming decontamination — the online half of
    * [[graft.operators.Dedup.decontaminateBloom]]. A verdict depends
    * only on the document itself and the STATIC probe set, so the
    * operator is STATELESS across micro-batches: the probe filter is
    * built ONCE ([[graft.operators.Dedup.probeFilter]] — its two
    * driver actions happen before the stream starts, never per batch)
    * and each micro-batch runs the identical batch pipeline via
    * foreachBatch — the standard stream-static pattern when the
    * static side needs driver-side preparation. Restart-safe with no
    * checkpoint state beyond the source offsets. */
  def decontaminate(stream: DataFrame,
      pf: graft.operators.Dedup.ProbeFilter,
      idCol: String, textCol: String)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(graft.operators.Dedup.decontaminateWith(
          pf, batch, idCol, textCol), id)
      }.start()
}
