package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming pack assembly — the online half of
  * [[graft.operators.Packing.packSequences]] for a continuously
  * ingested corpus: documents are appended to their shard's token
  * stream as they arrive, spans are emitted immediately, and the only
  * state per shard is the stream offset (ONE long — state does not
  * grow with the corpus, which is what lets a pack run ride an
  * unbounded ingest at 100 TB/day).
  *
  * Keyed by the same content-addressed shard as the batch operator,
  * so the shuffle Spark already plans shards the state across
  * executors. Pack ids are assigned in ARRIVAL order within a shard,
  * with one repair: rows WITHIN a micro-batch append in doc_id order
  * (the group iterator's order is partition-arrival order — not even
  * stable across retries — so the sort is also what makes re-executed
  * tasks emit identical spans). Consequently:
  *
  *  - a feed that is in order, or disordered only WITHIN micro-batch
  *    boundaries, reproduces the batch layout exactly;
  *  - disorder ACROSS micro-batches follows arrival semantics — a
  *    doc arriving a batch late appends at the then-current offset.
  *    The layout diverges from the batch twin's but keeps every
  *    packing invariant (contiguous shard stream, spans tile each
  *    doc, pack boundaries at the budget) — same arrival-semantics
  *    contract as [[StreamingDedup.lshFirstSeen]] and the row-count
  *    long-window fallback. Both halves pinned in
  *    StreamingPackingSpec; in-order parity is also the q_stream_pack
  *    oracle row, which replays the batch twin's SQL.
  */
object StreamingPacking {

  /** One document entering the packer: pre-sharded, pre-costed. */
  case class Doc(doc_id: Long, shard: Long, tk: Long)

  /** One emitted span — same schema as the batch operator's output. */
  case class Span(doc_id: Long, shard: Long, pack_id: Long,
      doc_off: Long, pack_off: Long, span_len: Long)

  /** Assign pack spans to a (possibly streaming) feed of documents.
    * Zero-token documents occupy no stream space and emit nothing.
    * In batch mode each shard's group is processed in one invocation;
    * on a stream, state carries the shard offset across batches. */
  def packStream(docs: Dataset[Doc], budget: Long): Dataset[Span] = {
    require(budget > 0, "budget must be positive")
    implicit val spanEnc = Encoders.product[Span]
    implicit val longEnc = Encoders.scalaLong
    docs.groupByKey(_.shard)
      .flatMapGroupsWithState[Long, Span](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, it: Iterator[Doc], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Span]
          // within-batch doc_id order: determinism under retries and
          // batch parity for intra-batch disorder (see class doc)
          it.toVector.sortBy(_.doc_id).foreach { d =>
            if (d.tk > 0) {
              val st = off
              val en = off + d.tk
              var p = st / budget
              val pLast = (en - 1) / budget
              while (p <= pLast) {
                val ps = math.max(st, p * budget)
                val pe = math.min(en, (p + 1) * budget)
                out += Span(d.doc_id, shard, p, ps - st, ps - p * budget,
                  pe - ps)
                p += 1
              }
              off = en
            }
          }
          state.update(off)
          out.result().iterator
      }
  }
}
