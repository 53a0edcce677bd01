package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for operator specs (one JVM-wide session —
  * getOrCreate reuses it across suites within the forked test JVM). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession =
    GraftSession.builder(master = "local[4]").getOrCreate()

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  /** collect a single column as a sorted seq for order-free compare */
  def col1[T](df: DataFrame): Seq[Any] =
    df.collect().toSeq.map(_.get(0))
}
