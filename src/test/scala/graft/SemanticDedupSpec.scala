package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** SemDeDup-style semantic dedup (Dedup.semanticDedup): one keeper per
  * semantic-dup group, keep-farthest-from-centroid rule, within-cluster
  * pair enumeration only. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private val axes = Some(Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0),
    Seq(0.0, 0.0, 1.0)))

  // two tight direction groups + one isolated vector
  private def corpus: DataFrame = Seq(
    (1L, Seq(1.00f, 0.00f, 0.0f)),
    (2L, Seq(0.99f, 0.01f, 0.0f)),
    (3L, Seq(0.98f, 0.03f, 0.0f)),
    (4L, Seq(0.00f, 1.00f, 0.0f)),
    (5L, Seq(0.01f, 0.99f, 0.0f)),
    (6L, Seq(0.00f, 0.00f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("one keeper per dup group; singletons keep themselves") {
    val res = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes).cache()
    assert(res.count() == 6)
    // every component has exactly one keep=true
    val perComp = res.groupBy("component")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
      .collect()
    assert(perComp.forall(_.getLong(1) == 1L), perComp.mkString(","))
    // ids 1-3 near-dup (cos > 0.999), 4-5 near-dup, 6 isolated —
    // provided k-means separated the three directions
    val comps = res.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(comps(1L) == comps(2L) && comps(2L) == comps(3L))
    assert(comps(4L) == comps(5L))
    assert(comps(6L) == 6L)
    res.unpersist()
  }

  test("no two kept docs in one cluster remain above the threshold") {
    val res = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes)
    val kept = res.filter(col("keep"))
      .select(col("doc_id"), col("cluster"))
    val vecs = corpus.select(col("vec_id").as("doc_id"),
      Similarity.toDoubleVec(col("embedding")).as("v"))
    val keptV = kept.join(vecs, "doc_id")
    val viol = keptV.as("a").join(keptV.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(Similarity.cosine(col("a.v"), col("b.v")) >= 0.999)
    assert(viol.count() == 0)
  }

  test("keep rule: the member farthest from its centroid survives") {
    val res = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes)
    // group {1,2,3}: centroid ≈ their mean; id 3 (0.98, 0.03) is the
    // farthest member of the x-direction cluster, so it is the keeper
    val keepIds = res.filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val g1Keep = Set(1L, 2L, 3L).intersect(keepIds)
    assert(g1Keep.size == 1)
    // replicate the rule: squared-L2 distance to the CLUSTER centroid
    // (the pinned x axis here) — the kept member maximizes it
    val vs = Map(1L -> Seq(1.00, 0.00, 0.0), 2L -> Seq(0.99, 0.01, 0.0),
      3L -> Seq(0.98, 0.03, 0.0))
    val ctr = Seq(1.0, 0.0, 0.0)
    def d2(v: Seq[Double]) = v.zip(ctr).map { case (a, b) => (a - b) * (a - b) }.sum
    val want = vs.maxBy { case (id, v) => (d2(v), -id) }._1
    assert(g1Keep.head == want && want == 3L)
  }

  test("deterministic across runs") {
    def run() = Dedup.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("mega-cluster cap skips over-cap clusters; small clusters still dedup") {
    // 40 near-identical x-direction vectors (one mega cluster) + the
    // 2-member y-direction group + the isolated z vector
    val mega = (1L to 40L).map(i => (i, Seq(1.0f, i.toFloat * 1e-4f, 0.0f)))
    val rest = Seq((100L, Seq(0.00f, 1.00f, 0.0f)),
      (101L, Seq(0.01f, 0.99f, 0.0f)), (200L, Seq(0.0f, 0.0f, 1.0f)))
    val df = (mega ++ rest).toDF("vec_id", "embedding")
    val capped = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes,
      maxClusterSize = 16)
    // the 40-member cluster skipped pair enumeration: every member kept
    assert(capped.filter(col("doc_id") <= 40L && col("keep")).count() == 40)
    // the under-cap y cluster still dedups to one keeper
    assert(capped.filter(col("doc_id").isin(100L, 101L) && col("keep"))
      .count() == 1)
    // uncapped removes all but one of the mega cluster
    val uncapped = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes)
    assert(uncapped.filter(col("doc_id") <= 40L && col("keep")).count() == 1)
  }

  test("multi-probe recovers a near-dup pair split across clusters") {
    // two near-identical vectors on either side of the x/y decision
    // boundary: each is nearest to a DIFFERENT axis centroid, so
    // single-probe never enumerates the pair; probe-2 puts both in
    // each other's second-nearest bucket
    val df = Seq(
      (1L, Seq(1.00f, 0.99f, 0.0f)), // nearest x axis... barely
      (2L, Seq(0.99f, 1.00f, 0.0f)), // nearest y axis
      (3L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val single = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes)
    // split pair: both kept under single-probe
    assert(single.filter(col("doc_id").isin(1L, 2L) && col("keep"))
      .count() == 2)
    val probed = Dedup.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, nlist = 3, iters = 5, centroidsIn = axes,
      nprobe = 2)
    assert(probed.filter(col("doc_id").isin(1L, 2L) && col("keep"))
      .count() == 1)
    // output contract unchanged: one row per doc, one keeper per group
    assert(probed.count() == 3 &&
      probed.filter(col("doc_id") === 3L && col("keep")).count() == 1)
  }

  test("probe metric matches assignment metric: nprobe=2 removals are a " +
      "superset of nprobe=1 on NON-unit-norm vectors") {
    // magnitudes vary wildly: a normalized-space probe ranking would
    // disagree with the raw-space assignment and could miss the
    // primary cluster entirely (the regression this test pins)
    val rnd = new scala.util.Random(7)
    val df = (1L to 60L).map { i =>
      val axis = (i % 3).toInt
      val base = Array.fill(3)(rnd.nextFloat() * 0.02f)
      base(axis) = 1f
      val mag = (if (i % 2 == 0) 0.05f else 40f) * (1 + (i % 7) * 0.1f)
      (i, base.toSeq.map(_ * mag))
    }.toDF("vec_id", "embedding")
    def removed(np: Int) = Dedup.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.99, nlist = 3, iters = 5, nprobe = np)
      .filter(!col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val r1 = removed(1); val r2 = removed(2)
    // multi-probe may only find MORE near-dup pairs, never fewer
    assert(r1.subsetOf(r2), s"nprobe=1 removed ${r1.size}, " +
      s"nprobe=2 removed ${r2.size}; lost: ${r1 -- r2}")
    assert(r1.nonEmpty)
  }

  test("coverage gate on the sf0.001 embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val res = Dedup.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.3, nlist = 4, iters = 5)
    val kept = res.filter(col("keep")).select(col("doc_id"))
    val vecs = e.select(col("vec_id"),
      Similarity.toDoubleVec(col("embedding")).as("v"))
    val truth = vecs.as("a")
      .join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= 0.3)
    val nTrue = truth.count()
    val bothKept = truth
      .join(kept.withColumnRenamed("doc_id", "id1"), Seq("id1"), "left_semi")
      .join(kept.withColumnRenamed("doc_id", "id2"), Seq("id2"), "left_semi")
      .count()
    val coverage =
      if (nTrue == 0) 1.0 else (nTrue - bothKept).toDouble / nTrue
    info(s"semantic dedup coverage @sf0.001 nlist=4: $coverage ($nTrue true pairs)")
    assert(coverage >= 0.5, s"coverage $coverage")
  }
}
