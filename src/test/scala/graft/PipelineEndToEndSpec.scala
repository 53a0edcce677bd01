package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LangModel, Packing, Sampling, TextOps}

/** The full LLM-training-data pipeline as ONE composed flow over the
  * driver's documents table — the integration the engine exists for:
  *
  *   exact dedup → semantic-family near-dedup (jaccard components +
  *   keep policy) → benchmark decontamination → perplexity quality
  *   filter → temperature-flattened language mix → sequence packing →
  *   sharded manifest accounting.
  *
  * Each stage is individually oracle-verified elsewhere; this spec
  * pins the COMPOSITION: stage-by-stage row accounting, no document
  * invented or duplicated anywhere, and end-to-end determinism across
  * two runs. */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def runPipeline(): (Seq[Long], DataFrame, Long) = {
    val docs = Tables.load(spark, d, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("text")).cache()
    try runStages(docs) finally docs.unpersist(false)
  }

  private def runStages(docs: DataFrame): (Seq[Long], DataFrame, Long) = {
    val n0 = docs.count()

    // 1. exact dedup (identical text → keep smallest id)
    val exactKeep = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val d1 = docs.join(exactKeep, "doc_id")
    val n1 = d1.count()

    // 2. near-dedup: jaccard components, keep the smallest member
    val comp = Dedup.jaccardComponents(d1, "doc_id", "text", 0.8)
    val d2 = d1.join(
      comp.groupBy("component").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id"), "doc_id")
    val n2 = d2.count()

    // 3. decontamination: the 5 lowest-id docs play the benchmark set
    val probes = docs.orderBy("doc_id").limit(5)
      .select(col("doc_id"), col("text"))
    val d3 = Dedup.decontaminate(d2, probes, "doc_id", "text", n = 3)
      .filter(!col("contaminated")).drop("contaminated")
    val n3 = d3.count()

    // 4. quality: keep the lower-perplexity half (bigram LM scored on
    //    the surviving corpus itself)
    val ppl = LangModel.perplexity(d3, col("doc_id"), col("text"),
      vocabSize = 64).filter(col("ppl").isNotNull)
    val cut = ppl.agg(percentile_approx(col("ppl"), lit(0.5),
      lit(1000))).head.getDouble(0)
    val d4 = d3.join(ppl.filter(col("ppl") <= cut)
      .select("doc_id"), "doc_id")
    val n4 = d4.count()

    // 5. temperature-flattened language mix (T = 2)
    val d5 = Sampling.temperatureMix(d4, col("lang"), col("doc_id"),
      temperature = 2.0, salt = "e2e")
    val n5 = d5.count()

    // 6. pack into 256-token sequences over 32 shards
    val packs = Packing.packTexts(d5, col("doc_id"), col("text"),
      budget = 256, shards = 32, salt = "e2e")
    val keptTokens = d5
      .agg(sum(TextOps.tokenCount(col("text")))).head.getLong(0)
    (Seq(n0, n1, n2, n3, n4, n5), packs, keptTokens)
  }

  test("stage accounting: monotone, nothing invented, nothing dropped silently") {
    val (counts, packs, keptTokens) = runPipeline()
    info(s"pipeline counts: ${counts.mkString(" -> ")}")
    // each stage only removes documents
    assert(counts.sliding(2).forall(p => p(1) <= p(0)), counts.toString)
    // every stage keeps something (the fixture is not degenerate)
    assert(counts.last > 0)
    // dedup stages actually removed near-dups on this dup-dense corpus
    assert(counts(2) < counts(0))
    // packing loses no tokens: the packed token total equals the kept
    // corpus's token total (spans cover every doc exactly once)
    val packedTokens =
      packs.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(packedTokens == keptTokens,
      s"packed $packedTokens != kept $keptTokens")
    // every pack except possibly one per shard is exactly the budget
    val short = packs.filter(col("n_tokens") =!= 256)
      .groupBy("shard").count().filter(col("count") > 1).count()
    assert(short == 0, "more than one under-budget pack in a shard")
  }

  test("deterministic end-to-end: two runs agree pack-for-pack") {
    def fingerprint(): Seq[(String, Long)] = {
      val (_, packs, _) = runPipeline()
      packs.select(concat_ws(":", col("shard"), col("pack_id")).as("k"),
          xxhash64(col("text")).as("h"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(fingerprint() == fingerprint())
  }
}
