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

  test("minhash hot-bucket cap bounds candidates, spares non-hot bands") {
    // 30 boilerplate docs share every shingle (one giant bucket per
    // band); two other docs pair only through small buckets
    val boiler = (10L until 40L).map(i => (i, "common template text body"))
    val rest = Seq((1L, "unique alpha beta gamma delta"),
      (2L, "unique alpha beta gamma delta"))
    val d2 = (boiler ++ rest).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(d2, "doc_id", "text", 1, 4, 4, 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 30 * 29 / 2 + 1) // full clique + the pair
    val capped = Dedup.minhashLshPairs(d2, "doc_id", "text", 1, 4, 4, 0.9,
      maxBucketSize = 5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // the 30-doc buckets are skipped everywhere; the small-bucket pair
    // survives untouched
    assert(capped == Set((1L, 2L)))
    // a cap at the clique size changes nothing
    val wide = Dedup.minhashLshPairs(d2, "doc_id", "text", 1, 4, 4, 0.9,
      maxBucketSize = 30)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(wide == uncapped)
  }

  test("lshFirstSeen hot-bucket cap skips boilerplate buckets, keeps " +
      "small-bucket matches (q_dedup_lshseen_capped semantics)") {
    // 30 boilerplate docs form one giant bucket per band; docs 1 and 2
    // match each other only through small buckets
    val boiler = (10L until 40L).map(i => (i, "common template text body"))
    val rest = Seq((1L, "unique alpha beta gamma delta"),
      (2L, "unique alpha beta gamma delta"))
    val d2 = (boiler ++ rest).toDF("doc_id", "text")
    def dups(maxBucket: Int): Map[Long, Option[Long]] =
      Dedup.lshFirstSeen(d2, "doc_id", "text", bands = 4, rowsPerBand = 4,
          shingleN = 1, maxBucketSize = maxBucket)
        .where(col("is_dup"))
        .select("doc_id", "matched_id")
        .as[(Long, Option[Long])].collect().toMap
    val uncapped = dups(0)
    // uncapped: all boilerplate docs after the first match doc 10
    assert(uncapped.keySet == (11L until 40L).toSet + 2L)
    assert(uncapped(2L).contains(1L))
    // capped at 5: the 30-doc buckets are skipped — boilerplate docs
    // report no dup (the documented recall trade); the small-bucket
    // match survives
    // regression: the capped path must unpersist the bucket cache it
    // built (materializeAndFree must receive the CACHED frame, not the
    // capped derivative — unpersist matches by plan equality). Guarded
    // on a clean cache so other suites' live caches can't false-fail.
    val cacheWasEmpty = spark.sharedState.cacheManager.isEmpty
    val capped = dups(5)
    assert(capped == Map(2L -> Some(1L)))
    if (cacheWasEmpty)
      assert(spark.sharedState.cacheManager.isEmpty,
        "capped lshFirstSeen leaked its shingle/signature cache")
    // a cap at the cluster size changes nothing
    assert(dups(30) == uncapped)
  }

  test("decontaminate flags exactly the n-gram-overlapping train docs") {
    val probes = Seq(
      (100L, "secret benchmark question about spark engines"),
      (101L, "short probe")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a doc with the benchmark question about spark inside"), // shares "question about spark"
      (2L, "completely unrelated training content here"),
      (3L, "another clean document nothing shared"),
      (4L, "short probe")                                           // whole-text gram (< n words)
    ).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, probes, "doc_id", "text", n = 3)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false, 4L -> true))
    // the non-broadcast path agrees
    val out2 = Dedup.decontaminate(train, probes, "doc_id", "text", n = 3,
      broadcastProbes = false)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out2 == out)
    // the Bloom-prefiltered path is verdict-identical (false positives
    // die in the exact verify) — also at a deliberately terrible fpp,
    // which only widens the candidate set
    val out3 = Dedup.decontaminateBloom(train, probes, "doc_id", "text",
        n = 3)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out3 == out)
    val out4 = Dedup.decontaminateBloom(train, probes, "doc_id", "text",
        n = 3, fpp = 0.5)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(out4 == out)
  }

  test("decontaminateBloom agrees with exact on the documents corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val probes = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val exact = Dedup.decontaminate(train, probes, "doc_id", "text", n = 3)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    val bloom = Dedup.decontaminateBloom(train, probes, "doc_id", "text",
        n = 3)
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toMap
    assert(bloom == exact)
    assert(exact.values.count(identity) > 0) // the corpus really overlaps
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

  // ------------------------------------------------------------------
  // Falsifiability: measured recall / error bounds on the real corpus.
  // A no-op implementation fails every one of these — they compare the
  // approximate operators against exact baselines computed in-test.
  // ------------------------------------------------------------------

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def exactPairs(threshold: Double): Set[(Long, Long)] = {
    val v = emb.select(col("vec_id"),
      Similarity.toDoubleVec(col("embedding")).as("e"))
    v.as("a").join(v.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        Similarity.cosine(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
  }

  test("embeddingNearDup: precision 1.0 and recall >= 0.85 vs the exact pair set") {
    val got = Dedup
      .embeddingNearDup(emb, "vec_id", "embedding", 0.3, planes = 2, tables = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val truth = exactPairs(0.3)
    assert(truth.nonEmpty, "vacuous: no true pairs at this threshold")
    assert(got.subsetOf(truth),
      s"false positives: ${(got -- truth).take(5)}")
    val recall = got.size.toDouble / truth.size
    info(f"embeddingNearDup recall=$recall%.3f (${got.size}/${truth.size})")
    assert(recall >= 0.85, f"recall $recall%.3f below bound")
  }

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }

  test("LSH top-k recall@10 vs brute force on the real corpus") {
    val qs = emb.filter(col("vec_id") < 20)
    val bf = topkMap(Similarity.bruteForceTopK(qs, emb, "vec_id", "embedding", 10))
    val lsh = topkMap(Similarity.lshTopK(qs, emb, "vec_id", "embedding", 10,
      planes = 3, tables = 8))
    val recalls = bf.map { case (q, truth) =>
      lsh.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size }
    val mean = recalls.sum / recalls.size
    info(f"LSH mean recall@10 = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.7, f"mean recall $mean%.3f below bound")
  }

  test("IVF top-k recall@10 with nprobe=4/16 on the real corpus") {
    val qs = emb.filter(col("vec_id") < 20)
    val bf = topkMap(Similarity.bruteForceTopK(qs, emb, "vec_id", "embedding", 10))
    val ivf = topkMap(Similarity.ivfTopK(qs, emb, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 4, iters = 3))
    val recalls = bf.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size }
    val mean = recalls.sum / recalls.size
    info(f"IVF mean recall@10 = $mean%.3f over ${recalls.size} queries")
    assert(mean >= 0.5, f"mean recall $mean%.3f below bound")
  }

  test("minhash estimate tracks true jaccard within k=64 error bounds") {
    val k = 64
    val sh = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"),
        array_sort(Dedup.shingleHashes(col("text"), 3)).as("sh"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 3), k).as("sig"))
      .persist()
    val matches = (1 to k).map(i =>
      when(element_at(col("a.sig"), i) === element_at(col("b.sig"), i), 1)
        .otherwise(0)).reduce(_ + _)
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("true_j"),
        (matches.cast("double") / k).as("est_j"))
      .as[(Double, Double)].collect()
    assert(pairs.length > 1000)
    val errs = pairs.map { case (t, e) => math.abs(t - e) }
    val mae = errs.sum / errs.length
    info(f"minhash mae=$mae%.4f max=${errs.max}%.3f over ${pairs.length} pairs")
    assert(mae <= 0.02, f"mean abs error $mae%.4f above bound")
    assert(errs.max <= 0.2, f"max abs error ${errs.max}%.3f above bound")
    sh.unpersist()
  }

  test("connected components: hand graph") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (3L, 1L))
      .toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components: chain graph converges in O(log n) rounds") {
    import spark.implicits._
    // a 300-node chain has diameter 300 — plain min-label propagation
    // would need 300 rounds; star contraction must finish inside the
    // 50-round cap or this throws/misassigns
    val pairs = (0L until 299L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs, "id1", "id2")
      .as[(Long, Long)].collect()
    assert(got.length == 300)
    assert(got.forall(_._2 == 0L))
  }

  test("connected components match brute-force transitive closure") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val got = Dedup.connectedComponents(
      edges.toDF("id1", "id2"), "id1", "id2")
      .as[(Long, Long)].collect().toMap
    // driver-side union-find as the oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val inGraph = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = inGraph.map(x => x ->
      inGraph.filter(y => find(y.toInt) == find(x.toInt)).min).toMap
    assert(got == want)
  }

  test("keepBest keeps highest score per component, lowest id on ties") {
    import spark.implicits._
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("doc_id", "component")
    val scores = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 7L), (5L, 7L),
      (6L, 0L)).toDF("doc_id", "score")
    val got = Dedup.keepBest(comps, scores)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // comp 1: 2 and 3 tie at 30 → lowest id 2; comp 4: tie at 7 → 4;
    // singleton keeps itself
    assert(got == Seq((1L, 2L, 3L), (4L, 4L, 2L), (6L, 6L, 1L)))
  }
  test("quantizeInt8: floor rule, clamping, zero vectors; recall holds") {
    import spark.implicits._
    import graft.operators.Similarity
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getFloat(1), r.getSeq[Byte](2))).toMap
    // scale = 1/127; codes = floor(x/scale + 0.5) in IEEE doubles —
    // note -0.5/(1.0/127) lands just BELOW -63.5, so its code is -64
    // (the same value any IEEE engine, incl. the DuckDB gate, computes)
    assert(math.abs(q(1L)._1 - 1.0f / 127) < 1e-9)
    assert(q(1L)._2 == Seq[Byte](127, -64, 32))
    // all-zero vector: scale 0, zero code (no division by zero)
    assert(q(2L)._1 == 0.0f && q(2L)._2 == Seq[Byte](0, 0, 0))
    // dequantized ranking agrees with full precision on separated data
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f)), (11L, Seq(0.9f, 0.1f, 0.0f)),
      (12L, Seq(0.0f, 1.0f, 0.0f)), (13L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") === 10L)
    val top = Similarity.quantTopK(qs, corpus, "vec_id", "embedding", 2)
      .orderBy(col("rnk")).collect().map(_.getLong(1))
    assert(top.toSeq == Seq(11L, 12L).take(2) ||
      top.head == 11L, s"got ${top.toSeq}")
  }
}