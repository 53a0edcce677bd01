package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measurement harness for the approximate operators' quality floors:
  * prints raw recall / MAE / separation numbers per parameterization so
  * the oracle-gated thresholds in SparkEntry are set from data, not
  * guesses. Run: `runMain graft.tools.QualityProbe <sfDir>`. */
object QualityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def T(n: String) = Tables.load(spark, dir, n)

    if (args.lift(1).contains("minhash-cost")) {
      // wall-time + candidate-volume per parameterization (the banded
      // join's output size is THE cost driver at scale)
      val docs0 = T("documents")
      println(s"[probe] n_docs=${docs0.count()}")
      for ((b, r) <- Seq((4, 4), (5, 4), (8, 4), (8, 3), (8, 4))) {
        val t0 = System.nanoTime()
        val out = Dedup.minhashLshPairs(docs0, "doc_id", "text",
          shingleN = 1, bands = b, rowsPerBand = r, threshold = 0.25)
        val n = out.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[probe] minhash-cost bands=$b rows=$r pairs=$n sec=$sec%.1f")
      }
      spark.stop(); return
    }

    val docs = T("documents")
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", 0.6)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] n_true_pairs=${truth.count()}")

    for ((b, r) <- Seq((4, 4), (5, 4), (6, 4), (8, 4), (8, 3))) {
      val cand = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 1, bands = b, rowsPerBand = r, threshold = 0.25)
      val row = truth.join(cand, Seq("id1", "id2"), "left").agg(
        avg(when(col("est_jaccard").isNotNull, 1.0).otherwise(0.0)).as("recall"),
        avg(when(col("est_jaccard").isNotNull,
          abs(col("est_jaccard") - col("jaccard")))).as("mae")).head
      println(f"[probe] minhash bands=$b rows=$r recall=${row.getDouble(0)}%.4f mae=${row.getDouble(1)}%.4f")
    }

    locally {
      val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      val toks = docs.select(col("doc_id"),
        array_sort(Dedup.tokens(col("text"))).as("t"))
      // hamming similarity vs TRUE jaccard over a deterministic sample
      // of ALL pair kinds (every 97th pair), bucketed by jaccard
      val pairSample = toks.as("a").join(toks.as("b"),
          col("a.doc_id") < col("b.doc_id") &&
          pmod(col("a.doc_id") * 1000 + col("b.doc_id"), lit(97)) === 0)
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
          (size(array_intersect(col("a.t"), col("b.t"))).cast("double") /
           size(array_union(col("a.t"), col("b.t")))).as("j"))
      val withHs = pairSample
        .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
        .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
        .select(col("j"), ((lit(64) - bit_count(col("sh1").bitwiseXOR(col("sh2"))))
          .cast("double") / 64.0).as("hs"))
      withHs.groupBy(floor(col("j") * 5).as("jb"))
        .agg(count(lit(1)).as("n"), avg("hs").as("h"), avg("j").as("jm"))
        .orderBy("jb").collect().foreach(r =>
          println(f"[probe] simhash jbucket=${r.getLong(0)} n=${r.getLong(1)} j=${r.getDouble(3)}%.3f hs=${r.getDouble(2)}%.4f"))
      val c = withHs.agg(corr(col("hs"), col("j"))).head.getDouble(0)
      println(f"[probe] simhash corr(hs,j)=$c%.4f")
    }

    val e = T("embeddings")
    val qs = e.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(qs, e, "vec_id", "embedding", 3)
      .select(col("qid"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    exact.count()
    for ((p, t) <- Seq((3, 8), (3, 12), (3, 16), (2, 8))) {
      val approx = Similarity.lshTopK(qs, e, "vec_id", "embedding",
        k = 3, planes = p, tables = t).select(col("qid"), col("vec_id"))
      val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val perQ = (0L until 10L).map(q => hits.getOrElse(q, 0L))
      println(s"[probe] lsh planes=$p tables=$t hits=${perQ.mkString(",")} total=${perQ.sum}/30")
    }
    // embedding norms: if already unit-norm, L2 k-means is spherical
    val nrm2 = aggregate(transform(col("embedding"),
      x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)
    val nr = e.agg(min(sqrt(nrm2)), max(sqrt(nrm2))).head
    println(f"[probe] embedding norms min=${nr.getDouble(0)}%.4f max=${nr.getDouble(1)}%.4f")

    // aggregate recall@3 over 50 queries (per-qid variance averages out)
    val qs50 = e.filter(col("vec_id") < 50)
    val exact50 = Similarity.bruteForceTopK(qs50, e, "vec_id", "embedding", 3)
      .select(col("qid"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = exact50.count()
    for ((nl, np, it) <- Seq((8, 2, 2), (8, 2, 5), (8, 3, 5), (8, 4, 5), (4, 2, 5))) {
      val approx = Similarity.ivfTopK(qs50, e, "vec_id", "embedding",
        k = 3, nlist = nl, nprobe = np, iters = it).select(col("qid"), col("vec_id"))
      val nHit = exact50.join(approx, Seq("qid", "vec_id"), "left_semi").count()
      println(f"[probe] ivf50 nlist=$nl nprobe=$np iters=$it recall=${nHit.toDouble / nExact}%.4f")
    }
    for ((p, t) <- Seq((3, 12), (3, 16))) {
      val approx = Similarity.lshTopK(qs50, e, "vec_id", "embedding",
        k = 3, planes = p, tables = t).select(col("qid"), col("vec_id"))
      val nHit = exact50.join(approx, Seq("qid", "vec_id"), "left_semi").count()
      println(f"[probe] lsh50 planes=$p tables=$t recall=${nHit.toDouble / nExact}%.4f")
    }
    spark.stop()
  }
}
