package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for the named queries to
  * plans/<round>/<query>_<tag>.txt — the before/after plan artifacts an
  * optimization round commits (the judge checks plan-shape claims
  * against these files). Queries behind a materialization barrier use
  * SparkEntry.planVariants, like graft.Plans.
  *
  * Usage: ExplainDump <outDir> <tag> <dataDir> <query> [query...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val dir = args(2)
    val names = args.drop(3).toSeq
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val fn = graft.SparkEntry.planVariants.getOrElse(n,
        graft.SparkEntry.benchVariants.getOrElse(n,
          graft.SparkEntry.queries(n)))
      try {
        val df = fn(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
        println(s"[explain] wrote $outDir/${n}_$tag.txt")
      } catch {
        case e: Throwable =>
          println(s"[explain] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
