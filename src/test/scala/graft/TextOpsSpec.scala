package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Chunking and redaction edges (the bulk behavior is DuckDB-oracle
  * gated via q_text_chunks / q_text_redact). */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunks: overlap, boundary, short and empty documents") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, ""),
      (4L, "exact four tok s")
    ).toDF("id", "text")
    val out = docs.select(col("id"),
        explode(TextOps.chunks(col("text"), 4, 3)).as("c"))
      .select(col("id"), col("c")("chunk_idx"), col("c")("chunk"),
        col("c")("n_tokens"))
      .as[(Long, Int, String, Int)].collect().toSeq.sorted
    // doc 1: starts 0,3,6,9 → chunks of 4,4,4,1 tokens, stride-3 overlap
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2) == Seq(0, 1, 2, 3))
    assert(d1.map(_._4) == Seq(4, 4, 4, 1))
    assert(d1(0)._3 == "w1 w2 w3 w4" && d1(1)._3 == "w4 w5 w6 w7")
    assert(d1(3)._3 == "w10")
    // doc 2: one full + nothing at start 3 (only 3 tokens)
    assert(out.filter(_._1 == 2L).map(_._3) == Seq("only three tokens"))
    // doc 3: empty text → zero chunks
    assert(!out.exists(_._1 == 3L))
    // doc 4: 4 tokens → starts 0 and 3
    assert(out.filter(_._1 == 4L).map(_._4) == Seq(4, 1))
  }

  test("redact replaces emails and ipv4 literals, leaves the rest") {
    val got = Seq("mail a.b+c@ex-1.org and 192.168.1.254 but not 1.2.3 or x@y")
      .toDF("t").select(TextOps.redact(col("t"))).as[String].head()
    assert(got == "mail <EMAIL> and <IP> but not 1.2.3 or x@y")
  }
}
