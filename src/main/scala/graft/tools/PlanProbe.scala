package graft.tools

/** Diagnostic: materialize one SparkEntry query at each given data dir
  * and print the AQE-final executed plan — the artifact for comparing
  * join/aggregate strategy ACROSS scales (static explain shows the
  * pre-AQE plan, which hides broadcast-vs-SMJ flips like q_last_join's
  * sf0.1→sf1 transition). Usage: PlanProbe <query> <dir> [dir...]. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_last_join")
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { d =>
      val df = graft.SparkEntry.queries(name)(spark, d)
      df.write.format("noop").mode("overwrite").save()
      println(s"=== EXECUTED $name @ $d ===")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
