package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online request mode as Structured Streaming: each arriving event is
  * a request row; the answer is the window feature vector over that
  * key's history frame ending at the request — the reference's
  * `DEPLOY` + RequestUnion semantics (runner.cc:1984-2123,
  * deployment_manage/DEPLOY_STATEMENT.md).
  *
  * State = per-key ts-descending buffer with TTL eviction mirroring the
  * reference's index TTL kinds (hybridse fe_type.proto:35-41):
  * absolute-time, latest-count, both (evict only when BOTH exceeded),
  * either (evict when EITHER exceeded).
  *
  * Train/serve consistency: the frame is {buffered rows of the key with
  * ts in [reqTs - precedingMs, reqTs]} plus the request row, capped to
  * the `maxSize` newest — exactly [[graft.operators.WindowOps.frameArray]]
  * with `instanceNotInWindow` semantics, so batch training features and
  * streaming serving features agree row-for-row (asserted in
  * RequestStreamSpec).
  *
  * Scale: state is partitioned by key across executors by the
  * groupByKey shuffle; per-key state is bounded by TTL, so total state
  * = Σ min(ttlCount, rows-in-ttl-window) per key — the same bound the
  * reference's MemTable TTL eviction guarantees.
  */
object RequestStream {

  case class Event(key: String, tsMs: Long, value: Double)

  case class FeatureRow(key: String, tsMs: Long, sum: Double, cnt: Long,
      avg: Double, mn: Double, mx: Double, distinct_cnt: Long)

  /** TTL kinds: fe_type.proto TTLType (kAbsoluteTime, kLatestTime,
    * kAbsAndLat, kAbsOrLat). */
  sealed trait Ttl extends Serializable
  final case class AbsoluteTime(ms: Long) extends Ttl
  final case class LatestCount(n: Int) extends Ttl
  final case class AbsAndLat(ms: Long, n: Int) extends Ttl
  final case class AbsOrLat(ms: Long, n: Int) extends Ttl

  case class Buffer(items: List[(Long, Double)]) // ts desc

  private def evict(items: List[(Long, Double)], ttl: Ttl, nowMs: Long): List[(Long, Double)] =
    ttl match {
      case AbsoluteTime(ms) => items.filter(_._1 >= nowMs - ms)
      case LatestCount(n)   => items.take(n)
      case AbsAndLat(ms, n) => // evict only rows violating BOTH limits
        items.zipWithIndex.filter { case ((ts, _), i) =>
          ts >= nowMs - ms || i < n }.map(_._1)
      case AbsOrLat(ms, n)  => // evict rows violating EITHER limit
        items.zipWithIndex.filter { case ((ts, _), i) =>
          ts >= nowMs - ms && i < n }.map(_._1)
    }

  /** Compute the feature row for one request against the (already
    * updated) buffer. Frame = rows with ts in [reqTs-precedingMs,
    * reqTs], newest-first, capped to maxSize. */
  private def features(key: String, reqTs: Long, buf: List[(Long, Double)],
      precedingMs: Long, maxSize: Int): FeatureRow = {
    var frame = buf.filter(t => t._1 >= reqTs - precedingMs && t._1 <= reqTs)
    if (maxSize > 0) frame = frame.take(maxSize)
    val vs = frame.map(_._2)
    val cnt = vs.length.toLong
    val sum = vs.sum
    FeatureRow(key, reqTs, sum, cnt,
      if (cnt > 0) sum / cnt else Double.NaN,
      if (vs.nonEmpty) vs.min else Double.NaN,
      if (vs.nonEmpty) vs.max else Double.NaN,
      vs.distinct.length.toLong)
  }

  implicit private val bufEnc: Encoder[Buffer] = Encoders.product[Buffer]
  implicit private val outEnc: Encoder[FeatureRow] = Encoders.product[FeatureRow]
  implicit private val strEnc: Encoder[String] = Encoders.STRING

  // ---------------------------------------------------------------
  // Long-window serving (RequestAggUnion, runner.cc:1504 — the
  // pre-agg-backed request path)
  // ---------------------------------------------------------------

  case class LwBuffer(items: List[(Long, Double)],
      partials: Map[Long, (Double, Long)])

  implicit private val lwEnc: Encoder[LwBuffer] = Encoders.product[LwBuffer]

  /** Long-window deploy: same outputs as [[deploy]] (sum/cnt only are
    * exact; avg derives), but each request is answered from
    * incrementally-maintained per-bucket partials plus raw head/tail
    * edge scans — O(rows-per-bucket + buckets-per-frame) per request
    * instead of O(rows-in-frame). Mirrors the reference's
    * RequestAggUnionRunner, which merges pre-agg table buckets with raw
    * index rows at the frame edges. */
  def deployLongWindow(events: Dataset[Event], precedingMs: Long,
      bucketMs: Long, ttl: Ttl): Dataset[FeatureRow] = {
    require(precedingMs >= bucketMs)
    events.groupByKey(_.key)
      .flatMapGroupsWithState[LwBuffer, FeatureRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[LwBuffer]) =>
          var buf = state.getOption.getOrElse(LwBuffer(Nil, Map.empty))
          val out = List.newBuilder[FeatureRow]
          rows.toList.sortBy(e => (e.tsMs, e.value)).foreach { e =>
            val (newer, older) = buf.items.span(_._1 > e.tsMs)
            val items = newer ::: ((e.tsMs, e.value) :: older)
            val b = math.floorDiv(e.tsMs, bucketMs)
            val (ps, pc) = buf.partials.getOrElse(b, (0.0, 0L))
            var partials = buf.partials.updated(b, (ps + e.value, pc + 1))
            val newest = items.head._1
            val kept = evict(items, ttl, newest)
            // partials for buckets with no surviving raw rows are dead
            // for every future frame (raw retention >= frame span)
            val liveBuckets = kept.map(t => math.floorDiv(t._1, bucketMs)).toSet
            partials = partials.filter { case (bk, _) => liveBuckets(bk) }
            buf = LwBuffer(kept, partials)

            // answer from partials + edges
            val reqTs = e.tsMs
            val hb = math.floorDiv(reqTs, bucketMs)
            val lb = math.floorDiv(reqTs - precedingMs, bucketMs)
            val tail = buf.items.filter(t =>
              math.floorDiv(t._1, bucketMs) == hb && t._1 <= reqTs)
            val head = if (lb < hb) buf.items.filter(t =>
              math.floorDiv(t._1, bucketMs) == lb && t._1 >= reqTs - precedingMs)
            else Nil
            // .toSeq first: collecting pairs straight off a Map would
            // rebuild a Map and collapse buckets with equal partial sums
            val full = buf.partials.toSeq.collect {
              case (bk, p) if bk > lb && bk < hb => p }
            val sum = tail.map(_._2).sum + head.map(_._2).sum +
              full.map(_._1).sum
            val cnt = tail.length.toLong + head.length.toLong +
              full.map(_._2).sum
            out += FeatureRow(key, reqTs, sum, cnt,
              if (cnt > 0) sum / cnt else Double.NaN,
              Double.NaN, Double.NaN, 0L) // min/max/distinct not pre-aggable here
          }
          state.update(buf)
          out.result().iterator
      }
  }

  /** Deploy: events in → one feature row per event out (append mode).
    * Works identically on a streaming or batch Dataset[Event]. */
  def deploy(events: Dataset[Event], precedingMs: Long,
      maxSize: Int = 0, ttl: Ttl = AbsoluteTime(Long.MaxValue / 4)): Dataset[FeatureRow] = {
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Buffer, FeatureRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Event], state: GroupState[Buffer]) =>
          var buf = state.getOption.map(_.items).getOrElse(Nil)
          val out = List.newBuilder[FeatureRow]
          // process micro-batch rows in event-time order (a batch may
          // arrive unordered; the reference seeks the index per request)
          rows.toList.sortBy(e => (e.tsMs, e.value)).foreach { e =>
            // insert into the ts-desc buffer
            val (newer, older) = buf.span(_._1 > e.tsMs)
            buf = newer ::: ((e.tsMs, e.value) :: older)
            val newest = buf.head._1
            buf = evict(buf, ttl, newest)
            out += features(key, e.tsMs, buf, precedingMs, maxSize)
          }
          state.update(Buffer(buf))
          out.result().iterator
      }
  }
}
