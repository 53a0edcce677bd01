package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The sf-scale-up fixture generator feeds the cross-scale bench
  * evidence (BENCH_sf1_r16.json), so its invariants get their own gate:
  * linear row growth, join-consistent key strides, replica-0 passthrough,
  * within-replica dup structure preserved and cross-replica text
  * decorrelated. Factor 3 over sf0.001 keeps the spec fast. */
class ScaleUpSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val dst = {
    val d = Files.createTempDirectory("scaleup").toString
    graft.tools.ScaleUp.scale(spark, src, d, 3)
    d
  }
  private def t(dir: String, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")

  test("fact tables grow by exactly the factor; dims stay fixed") {
    Seq("orders", "lineitem", "customer", "part", "supplier", "events",
      "documents", "embeddings").foreach { n =>
      assert(t(dst, n).count() == 3 * t(src, n).count(), n)
    }
    Seq("region", "nation").foreach { n =>
      assert(t(dst, n).count() == t(src, n).count(), n)
    }
  }

  test("key strides keep joins consistent: no orphans, linear key growth") {
    val li = t(dst, "lineitem"); val o = t(dst, "orders")
    // every lineitem orderkey resolves (FK intact across replicas)
    assert(li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() == 0)
    assert(t(dst, "orders").join(t(dst, "customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    assert(li.join(t(dst, "part"),
      li("l_partkey") === col("p_partkey"), "left_anti").count() == 0)
    // distinct keys scale linearly — group COUNT grows, not group size
    assert(o.select("o_orderkey").distinct.count() ==
      3 * t(src, "orders").select("o_orderkey").distinct.count())
    val evS = t(src, "events"); val evD = t(dst, "events")
    assert(evD.select("user_id").distinct.count() ==
      3 * evS.select("user_id").distinct.count())
    // replica group sizes match the source's (join back on the residue)
    val srcSizes = evS.groupBy("user_id").count()
      .withColumnRenamed("count", "n0")
    val stride = evS.agg(max("user_id")).head.getLong(0) + 1
    val dstSizes = evD.groupBy("user_id").count()
      .withColumn("base_id", col("user_id") % stride)
    assert(dstSizes.join(srcSizes,
        dstSizes("base_id") === srcSizes("user_id"))
      .filter(col("count") =!= col("n0")).count() == 0)
  }

  test("documents: replica 0 verbatim; within-replica dup structure " +
      "preserved; cross-replica shingles decorrelated") {
    val dS = t(src, "documents"); val dD = t(dst, "documents")
    val stride = dS.agg(max("doc_id")).head.getLong(0) + 1
    // replica 0 = bit-identical pass-through
    val rep0 = dD.filter(col("doc_id") < stride)
    assert(rep0.select("doc_id", "text").except(
      dS.select("doc_id", "text")).count() == 0)
    // exact-dup cluster structure replicates: every source exact-dup
    // pair (same text) exists in every replica under shifted ids
    val srcDupTexts = dS.groupBy("text").count().filter(col("count") > 1)
    val dupPerReplica = dD.withColumn("rep", floor(col("doc_id") / stride))
      .groupBy("rep", "text").count().filter(col("count") > 1)
      .groupBy("rep").count()
    val expected = srcDupTexts.count()
    assert(dupPerReplica.collect().forall(_.getLong(1) == expected))
    // cross-replica: no salted text ever equals a replica-0 text, and
    // token sets are disjoint (every replica token carries its suffix)
    val texts0 = dS.select("text")
    assert(dD.filter(col("doc_id") >= stride).select("text")
      .intersect(texts0).count() == 0)
    // n_chars stays consistent with the rewritten text
    assert(dD.filter(col("n_chars") =!= length(col("text"))).count() == 0)
  }

  test("embeddings: rotation preserves norms; replica 0 verbatim") {
    val eS = t(src, "embeddings"); val eD = t(dst, "embeddings")
    val stride = eS.agg(max("vec_id")).head.getLong(0) + 1
    val norm = (c: String) => aggregate(transform(col(c), x => x * x),
      lit(0.0d), (acc, x) => acc + x)
    val normsS = eS.select((col("vec_id") % stride).as("base"),
      norm("embedding").as("n0"))
    val normsD = eD.select((col("vec_id") % stride).as("base"),
      col("vec_id"), norm("embedding").as("n1"))
    val joined = normsD.join(normsS, "base")
    assert(joined.filter(abs(col("n1") - col("n0")) > 1e-3).count() == 0)
    assert(eD.filter(col("vec_id") < stride).select("vec_id", "embedding")
      .except(eS.select("vec_id", "embedding")).count() == 0)
  }
}
