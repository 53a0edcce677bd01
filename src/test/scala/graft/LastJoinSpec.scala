package graft

import org.apache.spark.sql.functions._
import graft.operators.LastJoin

class LastJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, null.asInstanceOf[String])
  ).toDF("lid", "k")

  private def right = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("b", 5L, 3.0),
    (null.asInstanceOf[String], 99L, 9.0)
  ).toDF("k", "ts", "v")

  test("equi-key LAST JOIN picks the max-order right row per key") {
    val out = LastJoin(left, right, Seq("k"), Seq("k"), Some(col("ts")))
      .select("lid", "ts", "v").as[(Long, Option[Long], Option[Double])]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L) == (Some(20L), Some(2.0))) // last of the two 'a' rows
    assert(out(2L) == (Some(5L), Some(3.0)))
    assert(out(3L) == (None, None)) // unmatched keeps nulls
  }

  test("NULL left keys never match (even NULL-keyed right rows)") {
    val out = LastJoin(left, right, Seq("k"), Seq("k"), Some(col("ts")))
      .filter(col("lid") === 4L).select("ts", "v").collect()
    assert(out.length == 1 && out(0).isNullAt(0) && out(0).isNullAt(1))
  }

  test("every left row appears exactly once") {
    val out = LastJoin(left, right, Seq("k"), Seq("k"), Some(col("ts")))
    assert(out.count() == 4)
  }

  test("general-condition LAST JOIN honors non-equi predicates") {
    val l = Seq((1L, 15L), (2L, 7L)).toDF("lid", "cap")
    val r = Seq((10L, "x"), (12L, "y"), (20L, "z")).toDF("ts", "name")
    val out = LastJoin.general(l, r, l("cap") >= r("ts"), r("ts"))
      .select("lid", "name").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("y")) // max ts <= 15 is 12
    assert(out(2L).isEmpty)       // no right row qualifies
  }
}
