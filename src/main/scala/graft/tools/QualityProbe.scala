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

    if (args.lift(1).contains("minhash-stages")) {
      // stage-by-stage wall time of the bench parameterization — which
      // link of sig → band → candidate-distinct → sig-attach+score is
      // THE cost at this SF
      val docs0 = T("documents")
      val n = docs0.count()
      def timed[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[probe] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        r
      }
      val (bands, rowsPerBand) = (8, 3)
      val k = bands * rowsPerBand
      println(s"[probe] n_docs=$n bands=$bands rows=$rowsPerBand")
      val sig = docs0.select(col("doc_id"),
        Dedup.minhashSignature(
          Dedup.shingleHashes(col("text"), 1), k).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("sig")(sig.count())
      val banded = sig.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
              lit(rowsPerBand))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      timed("banded")(banded.count())
      val rawJoin = banded.as("a").join(banded.as("b"),
          col("a.bh") === col("b.bh") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      val nRaw = timed("raw_band_matches")(rawJoin.count())
      println(s"[probe] raw_band_matches=$nRaw")
      val cand = rawJoin
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("__nb"))
        .select(col("id1"), col("id2"))
      val nCand = timed("cand_distinct")(cand.count())
      println(s"[probe] cand_distinct=$nCand")
      val matches = (1 to k).map(i =>
        when(element_at(col("sig1"), i) === element_at(col("sig2"), i), 1)
          .otherwise(0)).reduce(_ + _)
      val scored = cand
        .join(sig.select(col("doc_id").as("id1"), col("sig").as("sig1")), "id1")
        .join(sig.select(col("doc_id").as("id2"), col("sig").as("sig2")), "id2")
        .select(col("id1"), col("id2"),
          (matches.cast("double") / k).as("est_jaccard"))
      timed("scored_count")(scored.count())
      timed("scored_checkpoint")(scored.localCheckpoint(true))
      timed("full_pipeline")(Dedup.minhashLshPairs(docs0, "doc_id", "text",
        shingleN = 1, bands = bands, rowsPerBand = rowsPerBand,
        threshold = 0.25).count())
      spark.stop(); return
    }

    if (args.lift(1).contains("minhash-noop")) {
      // exactly what the bench harness times: fresh plan, noop sink
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        Dedup.minhashLshPairs(T("documents"), "doc_id", "text",
          shingleN = 1, bands = 8, rowsPerBand = 3, threshold = 0.25)
          .write.format("noop").mode("overwrite").save()
        println(f"[probe] minhash-noop run$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      spark.stop(); return
    }

    if (args.lift(1).contains("minhash-bucketenum")) {
      // v6: bucket-aggregate FIRST (40k-row shuffle), enumerate pairs
      // in-projection with a local min-band first-match check — no
      // 31M-row pair shuffle at all
      val docs0 = T("documents")
      def timed[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[probe] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        r
      }
      val (bands, rowsPerBand) = (8, 3)
      val k = bands * rowsPerBand
      val sig = docs0.select(col("doc_id"),
        Dedup.minhashSignature(
          Dedup.shingleHashes(col("text"), 1), k).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sig.count()
      val sigB = sig.select(col("doc_id"),
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
            lit(rowsPerBand)))).as("bhs"))
      val buckets = sigB
        .select(col("doc_id"), col("bhs"),
          posexplode(col("bhs")).as(Seq("band", "bh")))
        .groupBy(col("band"), col("bh"))
        .agg(collect_list(struct(col("doc_id"), col("bhs"))).as("ms"))
        .filter(size(col("ms")) > 1)
      timed("buckets")(buckets.count())
      val pairs = buckets.select(col("band"), explode(
        flatten(transform(col("ms"), x =>
          transform(
            filter(col("ms"), y =>
              x("doc_id") < y("doc_id") &&
              !exists(zip_with(slice(x("bhs"), lit(1), col("band")),
                slice(y("bhs"), lit(1), col("band")), (a, b) => a === b),
                p => p)),
            y => struct(x("doc_id").as("id1"), y("doc_id").as("id2")))))
        ).as("p"))
        .select(col("p")("id1").as("id1"), col("p")("id2").as("id2"))
      val n = timed("pairs_enumerated")(pairs.count())
      println(s"[probe] pairs=$n")
      val matches = size(filter(
        zip_with(col("sig1"), col("sig2"), (x, y) => x === y), b => b))
      timed("scored_filtered")(pairs
        .join(broadcast(sig.select(col("doc_id").as("id1"), col("sig").as("sig1"))), "id1")
        .join(broadcast(sig.select(col("doc_id").as("id2"), col("sig").as("sig2"))), "id2")
        .select(col("id1"), col("id2"),
          (matches.cast("double") / k).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.25)
        .count())
      spark.stop(); return
    }

    if (args.lift(1).contains("minhash-bisect")) {
      val docs0 = T("documents")
      def noop(label: String)(df: DataFrame): Unit = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      val (bands, rowsPerBand) = (8, 3)
      val k = bands * rowsPerBand
      val sig = docs0.select(col("doc_id"),
        Dedup.minhashSignature(
          Dedup.shingleHashes(col("text"), 1), k).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sig.count()
      val banded = sig.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
              lit(rowsPerBand))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      val rawJoin = banded.as("a").join(banded.as("b"),
          col("a.bh") === col("b.bh") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      noop("noop_rawjoin")(rawJoin)
      val cand = rawJoin
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("__nb"))
        .select(col("id1"), col("id2"))
      noop("noop_cand")(cand)
      val matches = (1 to k).map(i =>
        when(element_at(col("sig1"), i) === element_at(col("sig2"), i), 1)
          .otherwise(0)).reduce(_ + _)
      def scored = cand
        .join(broadcast(sig.select(col("doc_id").as("id1"), col("sig").as("sig1"))), "id1")
        .join(broadcast(sig.select(col("doc_id").as("id2"), col("sig").as("sig2"))), "id2")
        .select(col("id1"), col("id2"),
          (matches.cast("double") / k).as("est_jaccard"))
      noop("noop_scored_noguard_nofilter")(scored)
      val intThresh = math.ceil(0.25 * k).toInt
      def scoredInt = cand
        .join(broadcast(sig.select(col("doc_id").as("id1"), col("sig").as("sig1"))), "id1")
        .join(broadcast(sig.select(col("doc_id").as("id2"), col("sig").as("sig2"))), "id2")
        .select(col("id1"), col("id2"), matches.as("__m"))
        .filter(col("__m") >= intThresh && monotonically_increasing_id() >= 0)
        .select(col("id1"), col("id2"),
          (col("__m").cast("double") / k).as("est_jaccard"))
      noop("noop_int_guard")(scoredInt)
      val zmatches = size(filter(zip_with(col("sig1"), col("sig2"),
        (x, y) => x === y), b => b))
      noop("noop_zipwith_guard")(cand
        .join(broadcast(sig.select(col("doc_id").as("id1"), col("sig").as("sig1"))), "id1")
        .join(broadcast(sig.select(col("doc_id").as("id2"), col("sig").as("sig2"))), "id2")
        .select(col("id1"), col("id2"),
          (zmatches.cast("double") / k).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.25 && monotonically_increasing_id() >= 0))
      println(scored.filter(col("est_jaccard") >= 0.25 &&
          monotonically_increasing_id() >= 0)
        .queryExecution.executedPlan.toString.take(4000))
      spark.stop(); return
    }

    if (args.lift(1).contains("minhash-variants")) {
      // candidate-distinct + score-emit formulation shootout at the
      // bench parameterization
      val docs0 = T("documents")
      def timed[A](label: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[probe] $label sec=${(System.nanoTime() - t0) / 1e9}%.2f")
        r
      }
      val (bands, rowsPerBand) = (8, 3)
      val k = bands * rowsPerBand
      val sig = docs0.select(col("doc_id"),
        Dedup.minhashSignature(
          Dedup.shingleHashes(col("text"), 1), k).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sig.count()
      val banded = sig.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rowsPerBand + 1,
              lit(rowsPerBand))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      val rawJoin = banded.as("a").join(banded.as("b"),
          col("a.bh") === col("b.bh") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      timed("v1_groupBy_count")(rawJoin
        .groupBy(col("id1"), col("id2")).agg(count(lit(1))).count())
      spark.conf.set("spark.sql.shuffle.partitions", "128")
      timed("v1_sp128")(rawJoin
        .groupBy(col("id1"), col("id2")).agg(count(lit(1))).count())
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      timed("v1_sp256")(rawJoin
        .groupBy(col("id1"), col("id2")).agg(count(lit(1))).count())
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      timed("v1_repart")(rawJoin.repartition(128, col("id1"), col("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1))).count())
      timed("v2_distinct")(rawJoin.distinct().count())
      timed("v3_packed_distinct")(rawJoin
        .select((shiftleft(col("id1"), 32) + col("id2")).as("pk"))
        .distinct().count())
      // v4: no mid-pipeline distinct — score every raw match, filter,
      // distinct only survivors
      val matches = (1 to k).map(i =>
        when(element_at(col("sig1"), i) === element_at(col("sig2"), i), 1)
          .otherwise(0)).reduce(_ + _)
      timed("v4_score_raw_then_distinct")(rawJoin
        .join(broadcast(sig.select(col("doc_id").as("id1"), col("sig").as("sig1"))), "id1")
        .join(broadcast(sig.select(col("doc_id").as("id2"), col("sig").as("sig2"))), "id2")
        .select(col("id1"), col("id2"),
          (matches.cast("double") / k).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.25)
        .groupBy(col("id1"), col("id2")).agg(first(col("est_jaccard")))
        .count())
      // v5: distinct then broadcast-attach + nondeterministic-guard
      // filter (no checkpoint)
      timed("v5_no_checkpoint")(rawJoin
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("__nb"))
        .select(col("id1"), col("id2"))
        .join(broadcast(sig.select(col("doc_id").as("id1"), col("sig").as("sig1"))), "id1")
        .join(broadcast(sig.select(col("doc_id").as("id2"), col("sig").as("sig2"))), "id2")
        .select(col("id1"), col("id2"),
          (matches.cast("double") / k).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.25 &&
          monotonically_increasing_id() >= 0)
        .count())
      spark.stop(); return
    }

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
    {
      // int8-quantized brute force: aggregate + per-query-min recall@3
      val approx = Similarity.quantTopK(qs50, e, "vec_id", "embedding", 3)
        .select(col("qid"), col("vec_id"))
      val hits = exact50.join(approx, Seq("qid", "vec_id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("n"))
      val per = hits.agg(min(col("n")), avg(col("n"))).collect().head
      println(f"[probe] quant50 min_per_query=${per.getLong(0)} mean=${per.getDouble(1)}%.3f")
    }
    spark.stop()
  }
}
