package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}

/** r19 optimization-round stage probe (scratch; run with
  * `Test/runMain graft.tools.R19Probe [sfDir]`): attributes the
  * remaining wall of the two most expensive bench queries to their
  * stages, and bounds the FrameAggExpr-codegen upside (VERDICT r18
  * item 8) by comparing q_window_maxsize against an identical plan
  * whose six frame aggregates are replaced by size(arr) — the delta IS
  * the total scoring cost, an upper bound on what doGenCode could
  * save. */
object R19Probe {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(spark: SparkSession, label: String)(df: => DataFrame): Double = {
    spark.catalog.clearCache()
    val d = df
    materialize(d) // warm
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); materialize(d); (System.nanoTime() - t0) / 1e9
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

    // ---- q_dedup_minhash stages (bench variant: n=1, 8x3, t=0.25) ----
    val k = 24
    time(spark, "minhash_sig_only") {
      docs.select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 1), k)
          .as("sig"))
    }
    locally {
      val sig = docs.select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 1), k)
          .as("sig")).cache()
      sig.count()
      val banded = sig.select(col("doc_id"),
          posexplode(graft.functions.HashOps.minhashBands(col("sig"), 8, 3)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
      time(spark, "minhash_banded_only") { sig.count(); banded }
      val cand = banded.as("a").join(banded.as("b"),
          col("a.bh") === col("b.bh") && col("a.band") === col("b.band") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      time(spark, "minhash_rawpairs") { sig.count(); cand }
      time(spark, "minhash_cand_dedup") {
        sig.count()
        cand.groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("__nb"))
          .select(col("id1"), col("id2"))
      }
      println("CAND ROWS raw=" + cand.count() + " distinct=" +
        cand.groupBy("id1", "id2").agg(count(lit(1))).count())
      spark.catalog.clearCache()
    }
    time(spark, "minhash_full") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 1, 8, 3, 0.25)
    }

    // ---- q_dedup_semantic stages (bench variant) ----
    val e = T("embeddings")
    val nlist = math.min(4096, math.max(8, (e.count() / 250).toInt))
    val t0 = System.nanoTime()
    val centroids = Similarity.kmeansCentroids(e, "vec_id", "embedding",
      nlist, 5)
    println(f"PROBE semantic_kmeans(5 iters)        once=${(System.nanoTime() - t0) / 1e9}%.3f")
    time(spark, "semantic_assign_only") {
      e.select(col("vec_id").as("doc_id"),
          Similarity.toDoubleVec(col("embedding")).as("v0"))
        .withColumn("__a",
          Similarity.nearestCentroidAssign(col("v0"), centroids))
        .select(col("doc_id"),
          graft.functions.VecOps.normalize(col("v0")).as("v"),
          col("__a")("cluster").as("cluster"),
          col("__a")("cdist").as("cdist"),
          Similarity.nearestCentroids(col("v0"), centroids, 2).as("probes"))
    }
    locally {
      val t1 = System.nanoTime()
      val (edges, assigned) = Dedup.semanticDedupEdges(e, "vec_id",
        "embedding", 0.3, nlist, 5, Some(centroids), 0, 2)
      val n = edges.count()
      println(f"PROBE semantic_edges(count=$n)        once=${(System.nanoTime() - t1) / 1e9}%.3f")
      assigned.unpersist(false)
      spark.catalog.clearCache()
    }
    time(spark, "semantic_full") {
      Dedup.semanticDedup(e, "vec_id", "embedding", 0.3, nlist, 5,
        Some(centroids), 0, 2)
    }
    time(spark, "semantic_full_with_kmeans") {
      Dedup.semanticDedup(e, "vec_id", "embedding", 0.3, nlist, 5,
        None, 0, 2)
    }

    // ---- FrameAgg codegen upside bound (VERDICT r18 #8) ----
    locally {
      import graft.operators.WindowOps
      val arr = WindowOps.frameArray(col("value"), col("ts_ms"),
        col("event_id"), Seq(col("user_id")), 600000L, maxSize = 5,
        strictRowOrder = true, narrowEntry = true)
      val fagg = graft.functions.FrameAgg.agg(col("__arr"), _: String, None)
      val ev = T("events")
      time(spark, "maxsize_full") {
        ev.withColumn("__arr", arr).select(
          col("event_id"),
          round(fagg("sum_double"), 3).as("m_sum"),
          fagg("count").as("m_cnt"),
          fagg("min").as("m_min"),
          fagg("max").as("m_max"),
          round(fagg("avg"), 4).as("m_avg"),
          fagg("dcount_null").as("m_dc"))
      }
      // identical window/collect plan, scoring replaced by size() —
      // the delta bounds EVERYTHING codegen could save in FrameAggExpr
      time(spark, "maxsize_noscore") {
        ev.withColumn("__arr", arr).select(
          col("event_id"),
          size(col("__arr")).as("m_sum"),
          size(col("__arr")).as("m_cnt"),
          size(col("__arr")).as("m_min"),
          size(col("__arr")).as("m_max"),
          size(col("__arr")).as("m_avg"),
          size(col("__arr")).as("m_dc"))
      }
    }
    spark.stop()
  }
}
