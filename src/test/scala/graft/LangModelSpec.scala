package graft

import org.apache.spark.sql.functions._
import graft.operators.LangModel

/** Hand-computed add-one bigram LM values (the corpus-scale behavior is
  * DuckDB-oracle gated via q_perplexity). */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a b"),
    (2L, "a a"),
    (3L, "c"),
    (4L, "")
  ).toDF("doc_id", "text")

  test("vocabulary ranks by frequency with token tie-break") {
    // counts: a:4, b:2, c:1 → top-2 = {a, b}
    val v = LangModel.vocabulary(docs, col("text"), 2)
      .as[String].collect().toSet
    assert(v == Set("a", "b"))
  }

  test("perplexity matches hand-computed add-one bigram values") {
    // vocab {a,b}, V = 3; train bigrams: (a,b)x2, (b,a), (a,a)
    // c2: (a,b)=2 (b,a)=1 (a,a)=1; c1: a=3, b=1
    // doc1: ln(3/6), ln(2/4), ln(3/6) → avg = ln(0.5), ppl = 2
    // doc2: ln(2/6) → avg = ln(1/3), ppl = 3
    // docs 3/4: no bigrams → 0, null, null
    val out = LangModel.perplexity(docs, col("doc_id"), col("text"), 2)
      .orderBy("doc_id")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out.map(r => (r._1, r._2)) ==
      Seq((1L, 3L), (2L, 1L), (3L, 0L), (4L, 0L)))
    assert(out(0)._3.get == math.rint(math.log(0.5) * 1e6) / 1e6 ||
      math.abs(out(0)._3.get - math.log(0.5)) < 1e-6)
    assert(out(0)._4.get == 2.0)
    assert(math.abs(out(1)._3.get - math.log(1.0 / 3)) < 1e-6)
    assert(out(1)._4.get == 3.0)
    assert(out(2)._3.isEmpty && out(2)._4.isEmpty)
    assert(out(3)._3.isEmpty && out(3)._4.isEmpty)
  }

  test("bigram-table broadcast is size-gated: both paths score equal") {
    val hinted = LangModel.perplexity(docs, col("doc_id"), col("text"), 2)
    val gatedOff = LangModel.perplexity(docs, col("doc_id"), col("text"), 2,
      broadcastBudgetBytes = 0L)
    assert(hinted.collect().map(_.toString).sorted.toSeq ==
      gatedOff.collect().map(_.toString).sorted.toSeq)
  }

  test("external model: scoring corpus differs from training corpus") {
    val train = Seq((0L, "a b a b a")).toDF("doc_id", "text")
    // vocab {a,b}; train bigrams (a,b)x2 (b,a)x2 → c1: a=2, b=2; V=3
    // score "b c": (b, <unk>) → c2=0, c1(b)=2 → ln(1/5)
    val score = Seq((9L, "b c")).toDF("doc_id", "text")
    val out = LangModel.perplexity(score, col("doc_id"), col("text"), 2,
        model = train)
      .as[(Long, Long, Option[Double], Option[Double])].collect().head
    assert(out._2 == 1L)
    assert(math.abs(out._3.get - math.log(0.2)) < 1e-6)
  }
}

/** Span-level dedup hand values (corpus behavior gated via
  * q_dedup_span). */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Dedup

  test("duplicated spans are removed, first occurrence kept") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d"),   // both spans are the first occurrence
      (2L, 2L, 1L, "x y"),       // "a b" lost to doc 1 span 0
      (3L, 1L, 0L, ""),          // its only span lost to doc 1 span 1
      (4L, 0L, 0L, "")))         // empty document has no spans
  }

  test("a trailing partial span dedups like any other") {
    val docs = Seq((1L, "p q r"), (2L, "z z r")).toDF("doc_id", "text")
    // spans of 2: doc1 ["p q", "r"], doc2 ["z z", "r"] — the partial
    // "r" is duplicated; doc 1 (lower ord) keeps it
    val out = Dedup.spanDedup(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L, "p q r"), (2L, 2L, 1L, "z z")))
  }

  test("non-numeric id column: first occurrence still kept") {
    // the former doc_id*1e6+span_idx encoding cast a string id to null,
    // dropping EVERY occurrence of a duplicated span; the struct-min
    // ordinal keeps first-by-(id, span_idx) for any orderable id type
    val docs = Seq(("docA", "a b c d"), ("docB", "a b x y"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      ("docA", 2L, 2L, "a b c d"),
      ("docB", 2L, 1L, "x y")))
  }

  test("large ids that would overflow the arithmetic encoding") {
    val big = Long.MaxValue / 10 // doc_id * 1e6 would overflow
    val docs = Seq((big, "a b c d"), (big + 1, "a b x y"))
      .toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (big, 2L, 2L, "a b c d"),
      (big + 1, 2L, 1L, "x y")))
  }
}
