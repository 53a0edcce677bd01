package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").persist()

  test("hashSample is invariant under repartitioning and re-runs") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.hashSample(docs.repartition(17), col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }

  test("hashSample rate lands near the target; salts are independent") {
    val n = docs.count().toDouble
    val k = Sampling.hashSample(docs, col("doc_id"), 0.5, "a").count()
    // binomial(n, .5): 5 sigma ≈ 5*sqrt(n)/2
    assert(math.abs(k - n / 2) < 5 * math.sqrt(n) / 2,
      s"rate 0.5 kept $k of $n")
    val sa = Sampling.hashSample(docs, col("doc_id"), 0.5, "a")
      .select("doc_id").as[Long].collect().toSet
    val sb = Sampling.hashSample(docs, col("doc_id"), 0.5, "b")
      .select("doc_id").as[Long].collect().toSet
    val overlap = sa.intersect(sb).size.toDouble
    // independent halves overlap ~ n/4
    assert(math.abs(overlap - n / 4) < 5 * math.sqrt(n) / 2,
      s"salt overlap $overlap of $n")
  }

  test("sub-sample nesting: a 0.1 sample is a subset of the 0.3 sample") {
    val s01 = Sampling.hashSample(docs, col("doc_id"), 0.1)
      .select("doc_id").as[Long].collect().toSet
    val s03 = Sampling.hashSample(docs, col("doc_id"), 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(s01.subsetOf(s03))
  }

  test("stratified takes exactly min(quota, |stratum|) per stratum") {
    val out = Sampling.stratified(docs, col("lang"), col("doc_id"), 20)
    val got = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    sizes.foreach { case (lang, sz) =>
      assert(got(lang) == math.min(20L, sz), s"stratum $lang")
    }
    // deterministic: same selection on a different partitioning
    val again = Sampling.stratified(docs.repartition(13), col("lang"),
        col("doc_id"), 20)
      .select("doc_id").as[Long].collect().sorted
    val first = out.select("doc_id").as[Long].collect().sorted
    assert(first.sameElements(again))
  }
}
