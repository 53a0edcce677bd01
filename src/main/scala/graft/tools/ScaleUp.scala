package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator (VERDICT r15 item 2): replicates the
  * driver's sf0.1 tables by an integer factor with key-space shifts so
  * the result behaves like a genuinely larger SF — join keys stay
  * consistent (lineitem↔orders↔customer, lineitem↔part/supplier),
  * key cardinality grows linearly (so groupBy/window group COUNTS grow,
  * not group sizes), and text/embedding content is decorrelated across
  * replicas (each replica's internal near-dup structure is preserved
  * exactly; cross-replica shingles/signatures diverge, so the LSH
  * families see linear — not quadratic — candidate growth, the same
  * shape a real 10x crawl would have).
  *
  * Usage: ScaleUp <srcDir> <dstDir> [factor=10]. Writes parquet tables
  * under dstDir with the sf0.1 file layout; Bench then runs with
  * SPARK_GRAFT_SF_DIR=dstDir. Dimension tables region/nation are kept
  * fixed (TPC-H scales them sublinearly; nationkey joins stay valid).
  * Not part of the library surface — a measurement tool only.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, factor)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def save(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")

    // key-space strides: one past the source max, so replica i's keys are
    // key + i*stride — disjoint ranges, join-consistent across tables
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key).cast("long"))).head.getLong(0) + 1L

    val orders = load("orders"); val lineitem = load("lineitem")
    val customer = load("customer"); val part = load("part")
    val supplier = load("supplier")
    val sOrder = stride(orders, "o_orderkey")
    val sCust = stride(customer, "c_custkey")
    val sPart = stride(part, "p_partkey")
    val sSupp = stride(supplier, "s_suppkey")

    // replicate(df)(i => transforms): union of `factor` shifted copies,
    // expressed as ONE cross join with a replica-range literal so Spark
    // plans a single scan + generate, not `factor` scans
    def replicate(df: DataFrame)(shift: (DataFrame, org.apache.spark.sql.Column) => DataFrame): DataFrame = {
      val withRep = df.crossJoin(
        spark.range(factor.toLong).toDF("rep").hint("broadcast"))
      shift(withRep, col("rep")).drop("rep")
    }

    save(replicate(orders) { (df, rep) =>
      df.withColumn("o_orderkey", col("o_orderkey") + rep * sOrder)
        .withColumn("o_custkey", col("o_custkey") + rep * sCust)
    }, "orders", 8)

    save(replicate(lineitem) { (df, rep) =>
      df.withColumn("l_orderkey", col("l_orderkey") + rep * sOrder)
        .withColumn("l_partkey", col("l_partkey") + rep * sPart)
        .withColumn("l_suppkey", col("l_suppkey") + rep * sSupp)
    }, "lineitem", 16)

    save(replicate(customer) { (df, rep) =>
      df.withColumn("c_custkey", col("c_custkey") + rep * sCust)
    }, "customer", 4)

    save(replicate(part) { (df, rep) =>
      df.withColumn("p_partkey", col("p_partkey") + rep * sPart)
    }, "part", 4)

    save(replicate(supplier) { (df, rep) =>
      df.withColumn("s_suppkey", col("s_suppkey") + rep * sSupp)
    }, "supplier", 2)

    // events: new user ids per replica → linear growth in window-group
    // count (group SIZES unchanged — the dimension windows scale along)
    val events = load("events")
    val sEvent = stride(events, "event_id")
    val sUser = stride(events, "user_id")
    save(replicate(events) { (df, rep) =>
      df.withColumn("event_id", col("event_id") + rep * sEvent)
        .withColumn("user_id", col("user_id") + rep * sUser)
    }, "events", 8)

    // documents: replica 0 is verbatim; replicas >0 get a per-replica
    // suffix welded onto EVERY token, which rewrites every shingle —
    // within-replica dup clusters are preserved bit-for-bit, across
    // replicas nothing collides (linear LSH candidate growth)
    val documents = load("documents")
    val sDoc = stride(documents, "doc_id")
    save(replicate(documents) { (df, rep) =>
      val salted = when(rep === 0, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("_"), rep.cast("string"))), " "))
      // salt ONCE into a scratch column: a second `salted` reference
      // after text is replaced would re-evaluate against the salted
      // text (double-salt) — n_chars derives from the scratch column
      df.withColumn("doc_id", col("doc_id") + rep * sDoc)
        .withColumn("__salted", salted)
        .withColumn("text", col("__salted"))
        .withColumn("n_chars", length(col("__salted")).cast("long"))
        .drop("__salted")
    }, "documents", 8)

    // embeddings: rotate the vector by `rep` positions — norms and
    // within-replica geometry are preserved exactly, cross-replica
    // cosine structure is scrambled
    val embeddings = load("embeddings")
    val sVec = stride(embeddings, "vec_id")
    save(replicate(embeddings) { (df, rep) =>
      val dim = size(col("embedding"))
      val rotated = when(rep === 0, col("embedding")).otherwise(
        transform(col("embedding"), (_, i) =>
          element_at(col("embedding"),
            (pmod(i + rep.cast("int"), dim) + 1).cast("int"))))
      df.withColumn("vec_id", col("vec_id") + rep * sVec)
        .withColumn("embedding", rotated)
    }, "embeddings", 4)

    // fixed dims: copy through unchanged
    Seq("region", "nation").foreach(t => save(load(t), t, 1))
  }
}
