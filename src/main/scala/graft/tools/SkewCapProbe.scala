package graft.tools

import org.apache.spark.sql.functions._

/** One-off measurement harness for the LSH hot-bucket cap under a
  * boilerplate mega-bucket (VERDICT r15 item 1): overwrites 10% of the
  * corpus with one template text, then times capped vs uncapped
  * minhashLshPairs and lshFirstSeen. Not part of the bench surface —
  * results feed the benchVariants comments and the cap default. */
object SkewCapProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = graft.Tables.load(graft.GraftSession.tune(spark), d,
      "documents")
    val skewed = docs0.withColumn("text",
      when(col("doc_id") % 10 === 0,
        lit("the quick brown template boilerplate footer text repeated " +
          "across every page of the crawl")).otherwise(col("text")))
      .localCheckpoint(true) // fixture build cost out of the timings
    def time(label: String)(body: => Unit): Unit = {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[skewcap] $label%-28s best=${samples.min}%.3f s  " +
        s"all=${samples.map(x => f"$x%.3f").mkString(",")}")
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (cap <- Seq(0, 16, 64, 256)) {
      time(s"pairs cap=$cap") {
        sink(graft.operators.Dedup.minhashLshPairs(skewed, "doc_id",
          "text", shingleN = 1, bands = 8, rowsPerBand = 3,
          threshold = 0.25, maxBucketSize = cap))
      }
    }
    for (cap <- Seq(0, 64)) {
      time(s"lshseen cap=$cap") {
        sink(graft.operators.Dedup.lshFirstSeen(skewed, "doc_id", "text",
          maxBucketSize = cap))
      }
    }
    spark.stop()
  }
}
