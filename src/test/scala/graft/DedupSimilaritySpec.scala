package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup
    (4L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L) // docs 1+2 collapse, keep min id
    assert(out.values.sum == 4L)
  }

  test("jaccard pairs find the near-dup above threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH pairs exact duplicates with estimate 1.0") {
    val out = Dedup.minhashLshPairs(docs, "doc_id", "text", 1, 4, 4, 0.9)
      .select("id1", "id2", "est_jaccard").as[(Long, Long, Double)].collect()
    val exact = out.find(r => r._1 == 1L && r._2 == 2L)
    assert(exact.exists(_._3 == 1.0))
  }

  test("simhash: identical texts agree, different texts differ") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(4L))
    // near-dup differs in few bits
    val hd = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(hd < 16, s"hamming distance $hd too large for near-dup")
  }

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(1.0f, 0.0f, 0.0f)) // exact copy of 1 — always shares its bucket
  ).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by similarity") {
    val out = Similarity.bruteForceTopK(
      vecs.filter(col("vec_id") === 1L), vecs, "vec_id", "embedding", 2)
      .orderBy(col("rnk")).select("vec_id").as[Long].collect()
    assert(out.head == 5L || out.head == 2L) // exact copy or near copy first
    assert(out.toSet.subsetOf(Set(2L, 5L)))
  }

  test("IVF top-k with nprobe = nlist equals brute force") {
    val rng = new scala.util.Random(13)
    val corpus = (1L to 60L).map(i =>
      (i, Array.fill(8)(rng.nextFloat()))).toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") <= 3)
    val bf = Similarity.bruteForceTopK(qs, corpus, "vec_id", "embedding", 5)
      .select("qid", "rnk", "vec_id").as[(Long, Int, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(qs, corpus, "vec_id", "embedding", 5,
        nlist = 4, nprobe = 4, iters = 2)
      .select("qid", "rnk", "vec_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf == bf)
  }

  test("IVF with fewer probes still finds each query's own cluster") {
    val rng = new scala.util.Random(17)
    val corpus = (1L to 60L).map(i =>
      (i, Array.fill(8)(rng.nextFloat()))).toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") <= 3)
    val out = Similarity.ivfTopK(qs, corpus, "vec_id", "embedding", 3,
      nlist = 4, nprobe = 2, iters = 2)
    // 3 queries × up to 3 neighbors, all ranked 1..3
    val rows = out.select("qid", "rnk").as[(Long, Int)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 <= 3))
    assert(rows.map(_._1).toSet == Set(1L, 2L, 3L))
  }

  test("embedding near-dup finds identical vectors via LSH buckets") {
    // identical vectors always collide in every sign-LSH bucket; a merely
    // close pair can straddle a hyperplane, so only (1,5) is guaranteed
    val out = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", 0.99, planes = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 5L)))
  }
}
