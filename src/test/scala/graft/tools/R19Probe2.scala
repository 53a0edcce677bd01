package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}

/** r19 probe 2: score-first-then-distinct candidates for the minhash
  * pair operator (vs the r18 dedup-then-attach), kmeans vec caching,
  * and the semantic multi-probe score-first variant. */
object R19Probe2 {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(spark: SparkSession, label: String)(mk: => DataFrame): Double = {
    spark.catalog.clearCache()
    materialize(mk) // warm (fresh plan each time — mk is by-name)
    val ts = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime(); materialize(mk); (System.nanoTime() - t0) / 1e9
    }
    println(f"PROBE $label%-32s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def T(n: String) = Tables.load(spark, dir, n)
    val docs = T("documents")
    val k = 24

    def minhashScoreFirst(threshold: Double): DataFrame = {
      val sig = docs.select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 1), k)
          .as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val banded = sig.select(col("doc_id"),
          posexplode(graft.functions.HashOps.minhashBands(col("sig"), 8, 3)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      sig.count()
      def attach(as1: String, as2: String) =
        broadcast(sig.select(col("doc_id").as(as1), col("sig").as(as2)))
      val matches = graft.functions.HashOps.matchCount(
        col("sig1"), col("sig2"))
      banded.as("a").join(banded.as("b"),
          col("a.bh") === col("b.bh") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .join(attach("id1", "sig1"), "id1")
        .join(attach("id2", "sig2"), "id2")
        .select(col("id1"), col("id2"),
          (matches.cast("double") / k).as("est_jaccard"))
        .filter(col("est_jaccard") >= threshold)
        .groupBy(col("id1"), col("id2"))
        .agg(max(col("est_jaccard")).as("est_jaccard"))
    }

    println("SURVIVORS t=0.25: " + minhashScoreFirst(0.25).count())
    time(spark, "minhash_scorefirst_t0.25") { minhashScoreFirst(0.25) }
    time(spark, "minhash_old_t0.25") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 1, 8, 3, 0.25)
    }

    // ---- kmeans with cached vecs ----
    val e = T("embeddings")
    val nlist = math.min(4096, math.max(8, (e.count() / 250).toInt))
    locally {
      val t0 = System.nanoTime()
      Similarity.kmeansCentroids(e, "vec_id", "embedding", nlist, 5)
      println(f"PROBE kmeans_uncached                 once=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    locally {
      val t0 = System.nanoTime()
      val vecs = e.select(col("vec_id").as("id"),
          Similarity.toDoubleVec(col("embedding")).as("e"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var centroids: Seq[Seq[Double]] = vecs
        .orderBy(xxhash64(col("id"))).limit(nlist)
        .select(col("e")).collect().toSeq.map(_.getSeq[Double](0))
      for (_ <- 1 to 5) {
        val assigned = vecs.withColumn("cid",
          Similarity.nearestCentroid(col("e"), centroids))
        val means = assigned
          .select(col("cid"), posexplode(col("e")))
          .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
          .groupBy(col("cid"))
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
          .select(col("cid"), transform(col("ps"), p => p("m")).as("ctr"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
        centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
      }
      vecs.unpersist(false)
      println(f"PROBE kmeans_cached                   once=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
