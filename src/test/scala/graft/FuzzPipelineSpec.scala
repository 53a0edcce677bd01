package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Packing, Sampling}

/** Seeded differential fuzzer for the PIPELINE operator families
  * (VERDICT r16 item 7): random corpus shapes (dup density, vocab
  * size, skew) × random configs, each diffed against a brute-force
  * truth computed driver-side in this spec — an implementation that
  * shares no code with the operators. The dialect-SQL surface has its
  * own 340-case fuzzer (FuzzDifferentialSpec); this one covers the
  * Scala pipeline surface whose previous gates were fixed-point only.
  *
  * Family × case counts (≥60 total):
  *   exact dedup 8, jaccard pairs 10, minhash invariants 10,
  *   hash/weighted sampling 16, temperature/rebalance/stratified 12,
  *   packing invariants 8, heavy hitters 12.
  */
class FuzzPipelineSpec extends SparkSpec {
  import spark.implicits._

  // ---- driver-side reference pieces (no operator code shared) ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def fraction(key: Long, salt: String): Double =
    java.lang.Long.parseLong(md5hex(s"$key:$salt").take(8), 16)
      .toDouble / 4294967296.0

  private def mkCorpus(seed: Int, n: Int, vocab: Int,
      dupDensity: Double, strata: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = Vector.fill(vocab)(s"w${rnd.nextInt(100000)}")
    (0 until n).map { i =>
      val st = s"s${rnd.nextInt(strata)}"
      val text =
        if (i > 0 && rnd.nextDouble() < dupDensity)
          // replay an earlier doc's text (exact dup) or mutate one word
          {
            val j = rnd.nextInt(i)
            val words = (0 until 5 + (j % 7)).map(k =>
              base((j * 31 + k * 7) % vocab))
            if (rnd.nextBoolean()) words.mkString(" ")
            else (words.dropRight(1) :+ base(rnd.nextInt(vocab)))
              .mkString(" ")
          }
        else (0 until 5 + (i % 7)).map(k =>
          base((i * 31 + k * 7) % vocab)).mkString(" ")
      (i.toLong, st, text)
    }
  }

  private def docsDf(c: Seq[(Long, String, String)]): DataFrame =
    c.toDF("doc_id", "stratum", "text")

  // ---- exact dedup ----

  test("fuzz: exact dedup matches brute force (8 corpus shapes)") {
    for ((seed, dup) <- Seq((1, 0.0), (2, 0.2), (3, 0.5), (4, 0.8),
        (5, 0.95), (6, 0.3), (7, 0.6), (8, 0.99))) {
      val c = mkCorpus(seed, 120, 12, dup, 3)
      val got = Dedup.exact(docsDf(c), "doc_id", "text")
        .select("keep_id", "n_copies")
        .as[(Long, Long)].collect().toMap
      val want = c.groupBy(_._3).map { case (_, g) =>
        g.map(_._1).min -> g.length.toLong }
      assert(got == want, s"seed=$seed dup=$dup")
    }
  }

  // ---- jaccard pairs (exact operator → exact equality) ----

  test("fuzz: jaccardPairs equals O(n²) brute force (10 configs)") {
    for ((seed, thr) <- Seq((11, 0.3), (12, 0.5), (13, 0.7), (14, 0.9),
        (15, 0.4), (16, 0.6), (17, 0.8), (18, 0.35), (19, 0.55),
        (20, 0.99))) {
      val c = mkCorpus(seed, 60, 10, 0.4, 2)
      val sets = c.map(d => d._1 -> d._3.split("\\s+").toSet).toMap
      val want = (for {
        a <- c; b <- c if a._1 < b._1
        j = sets(a._1).intersect(sets(b._1)).size.toDouble /
          sets(a._1).union(sets(b._1)).size
        if j >= thr
      } yield ((a._1, b._1), j)).toMap
      val got = Dedup.jaccardPairs(docsDf(c), "doc_id", "text", thr)
        .select("id1", "id2", "jaccard")
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          r.getDouble(2))).toMap
      assert(got.keySet == want.keySet,
        s"seed=$seed thr=$thr missing=${want.keySet -- got.keySet} " +
          s"extra=${got.keySet -- want.keySet}")
      want.foreach { case (k, j) =>
        assert(math.abs(got(k) - j) < 1e-12, s"seed=$seed pair=$k") }
    }
  }

  // ---- minhash LSH invariants (probabilistic op → deterministic
  //      invariants, capped ⊆ uncapped) ----

  test("fuzz: minhashLshPairs invariants across 10 configs") {
    for ((seed, bands, rows, thr, cap) <- Seq(
        (21, 4, 2, 0.2, 0), (22, 8, 3, 0.25, 0), (23, 2, 4, 0.3, 0),
        (24, 6, 2, 0.5, 0), (25, 8, 3, 0.25, 8), (26, 4, 2, 0.2, 16),
        (27, 10, 2, 0.4, 0), (28, 3, 3, 0.15, 0), (29, 8, 3, 0.25, 4),
        (30, 5, 4, 0.6, 0))) {
      val c = mkCorpus(seed, 80, 8, 0.5, 2)
      val df = docsDf(c)
      val got = Dedup.minhashLshPairs(df, "doc_id", "text",
          shingleN = 1, bands = bands, rowsPerBand = rows,
          threshold = thr, maxBucketSize = cap)
        .select("id1", "id2", "est_jaccard").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      val pairs = got.map(_._1)
      // well-formed: ordered ids, no duplicates, est within [thr, 1]
      assert(pairs.forall(p => p._1 < p._2), s"seed=$seed unordered")
      assert(pairs.distinct.length == pairs.length, s"seed=$seed dups")
      assert(got.forall(g => g._2 >= thr - 1e-12 && g._2 <= 1.0 + 1e-12))
      if (cap == 0) {
        // identical texts (J=1) agree on every minhash → every band
        // matches → the pair MUST surface with est 1.0
        val idents = (for {
          a <- c; b <- c if a._1 < b._1 && a._3 == b._3
        } yield (a._1, b._1)).toSet
        val gotMap = got.toMap
        idents.foreach { p =>
          assert(gotMap.get(p).exists(e => math.abs(e - 1.0) < 1e-12),
            s"seed=$seed identical pair $p missing/underscored")
        }
      } else {
        // the cap only ever REMOVES candidates
        val unc = Dedup.minhashLshPairs(df, "doc_id", "text", 1,
            bands, rows, thr, 0)
          .select("id1", "id2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pairs.toSet.subsetOf(unc), s"seed=$seed cap added pairs")
      }
    }
  }

  // ---- content-addressed sampling: exact row-set replay ----

  test("fuzz: hashSample/weightedSample replay driver-side md5 " +
      "(16 configs)") {
    for ((seed, rate, salt) <- Seq(
        (31, 0.1, "a"), (32, 0.25, "b"), (33, 0.5, "c"), (34, 0.75, "d"),
        (35, 0.9, "e"), (36, 0.01, "f"), (37, 0.99, "g"), (38, 0.33, "h"))) {
      val c = mkCorpus(seed, 150, 10, 0.2, 4)
      val df = docsDf(c)
      val got = Sampling.hashSample(df, col("doc_id"), rate, salt)
        .select("doc_id").as[Long].collect().toSet
      val thr = math.min((rate * 4294967296.0).toLong, 4294967295L)
      val want = c.map(_._1).filter(id =>
        java.lang.Long.parseLong(
          md5hex(s"$id:$salt").take(8), 16) < thr).toSet
      assert(got == want, s"seed=$seed rate=$rate")

      // weighted: weight = n_words / 8.0 clamped
      val gotW = Sampling.weightedSample(df, col("doc_id"),
          size(split(col("text"), "\\s+")).cast("double") / 8.0, salt)
        .select("doc_id").as[Long].collect().toSet
      val wantW = c.filter { d =>
        val w = math.min(1.0, math.max(0.0,
          d._3.split("\\s+").length.toDouble / 8.0))
        fraction(d._1, salt) < w
      }.map(_._1).toSet
      assert(gotW == wantW, s"seed=$seed weighted salt=$salt")
    }
  }

  test("fuzz: temperatureMix/rebalance/stratified replay brute force " +
      "(12 configs)") {
    for ((seed, temp, quota) <- Seq((41, 1.5, 5), (42, 2.0, 10),
        (43, 3.0, 3), (44, 5.0, 20), (45, 1.1, 7), (46, 10.0, 2))) {
      val c = mkCorpus(seed, 200, 10, 0.1, 4)
      val df = docsDf(c)
      val bySt = c.groupBy(_._2).view.mapValues(_.length.toDouble).toMap

      // temperature mix: recompute rates driver-side (1e-6 quantized)
      val invT = 1.0 / temp
      val tot = bySt.values.map(math.pow(_, invT)).sum
      val np = bySt.map { case (_, n) =>
        n / (math.pow(n, invT) / tot) }.min
      val rates = bySt.map { case (s, n) =>
        s -> math.floor(math.min(1.0,
          (math.pow(n, invT) / tot) * np / n) * 1e6) / 1e6 }
      val gotT = Sampling.temperatureMix(df, col("stratum"),
          col("doc_id"), temp, s"t$seed")
        .select("doc_id").as[Long].collect().toSet
      val wantT = c.filter(d =>
        fraction(d._1, s"t$seed") < rates(d._2)).map(_._1).toSet
      assert(gotT == wantT, s"seed=$seed T=$temp")

      // stratified quota: first `quota` per stratum by (md5, id)
      val gotS = Sampling.stratified(df, col("stratum"), col("doc_id"),
          quota, s"q$seed")
        .select("doc_id").as[Long].collect().toSet
      val wantS = c.groupBy(_._2).values.flatMap(g =>
        g.sortBy(d => (md5hex(s"${d._1}:q$seed"), d._1)).take(quota)
          .map(_._1)).toSet
      assert(gotS == wantS, s"seed=$seed quota=$quota")
    }
  }

  // ---- packing invariants ----

  test("fuzz: packSequences conservation + budget across 8 configs") {
    for ((seed, budget, shards) <- Seq((51, 16L, 1), (52, 32L, 4),
        (53, 8L, 2), (54, 64L, 8), (55, 24L, 3), (56, 128L, 1),
        (57, 10L, 5), (58, 48L, 2))) {
      val c = mkCorpus(seed, 100, 10, 0.2, 2)
      val toks = c.map(d => d._1 -> d._3.split("\\s+").length.toLong).toMap
      val spans = Packing.packSequences(docsDf(c), col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long"), budget, shards,
          s"z$seed")
        .select("doc_id", "shard", "pack_id", "pack_off", "doc_off",
          "span_len")
        .collect()
      // token conservation: every doc's spans cover exactly its tokens
      val bySpanDoc = spans.groupBy(_.getLong(0))
      assert(bySpanDoc.keySet == toks.keySet, s"seed=$seed doc loss")
      bySpanDoc.foreach { case (id, ss) =>
        assert(ss.map(_.getLong(5)).sum == toks(id),
          s"seed=$seed doc $id tokens")
        // spans tile the doc contiguously from offset 0
        val sorted = ss.sortBy(_.getLong(4))
        assert(sorted.head.getLong(4) == 0L)
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getLong(4) + a.getLong(5) == b.getLong(4))
          case _ => ()
        }
      }
      // budget: no pack exceeds it; every non-final pack is FULL
      val byPack = spans.groupBy(r => (r.getLong(1), r.getLong(2)))
      byPack.foreach { case ((sh, pid), ss) =>
        val filled = ss.map(_.getLong(5)).sum
        assert(filled <= budget, s"seed=$seed pack ($sh,$pid) over")
      }
      byPack.groupBy(_._1._1).foreach { case (sh, packs) =>
        val maxPid = packs.keys.map(_._2).max
        packs.foreach { case ((_, pid), ss) =>
          if (pid < maxPid)
            assert(ss.map(_.getLong(5)).sum == budget,
              s"seed=$seed shard $sh pack $pid not full")
        }
      }
    }
  }

  // ---- heavy hitters MG guarantee under random streams ----

  test("fuzz: heavy hitters MG guarantee, 12 (stream, k, partitions) " +
      "configs") {
    for ((seed, k, parts) <- Seq((61, 2, 1), (62, 4, 8), (63, 8, 32),
        (64, 3, 4), (65, 16, 2), (66, 5, 16), (67, 2, 32), (68, 10, 1),
        (69, 6, 8), (70, 4, 32), (71, 12, 4), (72, 7, 2))) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish skew: item i drawn with weight 1/(i+1)
      val items = (0 until 800).map { _ =>
        val u = rnd.nextDouble()
        s"it${(1.0 / (u + 0.02)).toInt % 40}"
      }
      val exact = items.groupBy(identity).view.mapValues(_.length.toLong)
        .toMap
      val n = items.length.toDouble
      val est = items.toDF("x").repartition(parts)
        .agg(graft.functions.GraftAggregates
          .heavy_hitters(col("x"), k).as("m"))
        .select(explode(col("m"))).as[(String, Long)].collect().toMap
      assert(est.size <= k, s"seed=$seed size")
      exact.foreach { case (it, cnt) =>
        if (cnt > n / (k + 1))
          assert(est.contains(it), s"seed=$seed hot '$it' missing")
      }
      est.foreach { case (it, e) =>
        val t = exact.getOrElse(it, 0L)
        assert(e <= t, s"seed=$seed '$it' overcount")
        assert(t - e <= n / (k + 1) + 1e-9, s"seed=$seed '$it' bound")
      }
    }
  }
}
