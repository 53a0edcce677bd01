package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.operators.Dedup

/** Scratch probe for the Bloom decontamination plan + timing
  * (`Test/runMain graft.tools.BloomPlanProbe [sfDir]`). */
object BloomPlanProbe {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = Tables.load(spark, dir, "documents")
    val out = Dedup.decontaminateBloom(
      docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(50)) === 0),
      "doc_id", "text", n = 13)
    def best3(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t = System.nanoTime
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime - t) / 1e9
      }
      println(f"$label%-12s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    best3("BLOOM", out)
    val ex = Dedup.decontaminate(
      docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(50)) === 0),
      "doc_id", "text", n = 13)
    best3("EXACT", ex)
    // candidate density drives the economics: report it
    val trainN = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0).count()
    val candN = out.filter(col("contaminated")).count()
    println(s"TRAIN=$trainN CONTAMINATED=$candN")
  }
}
