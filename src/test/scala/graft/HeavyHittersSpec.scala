package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftAggregates => A}

/** Misra–Gries heavy-hitters sketch: bounded state, hot-item capture
  * under skew, the mergeable-summaries guarantee across partition
  * merges. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(items: Seq[String], cap: Int,
      parts: Int = 8): Map[String, Long] =
    spark.createDataset(items).toDF("tok").repartition(parts)
      .agg(A.heavy_hitters(col("tok"), cap).as("m"))
      .select(explode(col("m"))).as[(String, Long)]
      .collect().toMap

  test("skewed stream: the hot items survive with bounded undercount") {
    // 10_000 total: "hot" 4000, "warm" 2500, 700 distinct cold fillers
    val items = Seq.fill(4000)("hot") ++ Seq.fill(2500)("warm") ++
      (1 to 3500).map(i => s"cold${i % 700}")
    val cap = 16
    val m = sketch(scala.util.Random.shuffle(items), cap)
    assert(m.size <= cap)
    val slack = items.size.toDouble / (cap + 1) // 588
    assert(m.contains("hot") && m.contains("warm"))
    assert(m("hot") <= 4000 && m("hot") >= 4000 - slack, m("hot"))
    assert(m("warm") <= 2500 && m("warm") >= 2500 - slack, m("warm"))
  }

  test("distinct set under capacity: exact counts, no decrements") {
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(7)("c")
    val m = sketch(items, cap = 8)
    assert(m == Map("a" -> 30L, "b" -> 20L, "c" -> 7L))
  }

  test("guarantee holds regardless of partitioning (merge tree)") {
    val items = (1 to 5000).map(i => s"k${(math.sqrt(i)).toInt}") // skewed
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cap = 12
    val slack = items.size.toDouble / (cap + 1)
    for (parts <- Seq(1, 3, 32)) {
      val m = sketch(items, cap, parts)
      assert(m.size <= cap, s"parts=$parts size=${m.size}")
      exact.foreach { case (k, c) =>
        if (c > slack) assert(m.contains(k), s"parts=$parts missing $k ($c)")
      }
      m.foreach { case (k, est) =>
        val c = exact(k)
        assert(est <= c && c - est <= slack, s"parts=$parts $k est=$est true=$c")
      }
    }
  }

  test("capacity must be positive") {
    intercept[IllegalArgumentException] { new A.HeavyHitters(0) }
  }

  test("null inputs never count (sibling-aggregate rule)") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("tok")
    val m = df.agg(A.heavy_hitters(col("tok"), 4).as("m"))
      .select(explode(col("m"))).as[(String, Long)].collect().toMap
    assert(m == Map("a" -> 2L, "b" -> 1L))
  }
}
