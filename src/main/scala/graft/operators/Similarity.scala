package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small)
  * query set against the corpus, no corpus shuffle, ranking via a
  * per-query window. Scale path: sign-LSH bucketing (random
  * hyperplanes derived from seeded hashes, so the "planes" ship as
  * code, not data) restricts candidates to one bucket; an IVF-style
  * variant can use k-means centroids the same way. All vector math is
  * codegen'd higher-order functions (zip_with/aggregate) over
  * double-cast arrays.
  */
object Similarity {

  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-0.5, 0.5) derived from xxhash64 — reproducible across
    * the cluster without shipping plane matrices. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(1000000L)).cast("double") / 1e6) - 0.5

  /** Sign-LSH bucket key: one bit per hyperplane. */
  def signLshKey(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val proj = aggregate(zip_with(vec,
        transform(sequence(lit(0), size(vec) - 1), i => planeComponent(p, i)),
        (x, w) => x * w), lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (cosine desc, id asc tie-break). Queries are
    * broadcast — the corpus is scanned once with no shuffle until the
    * final per-query ranking. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"),
      toDoubleVec(col(vecCol)).as("qe")))
    val c = corpus.select(col(idCol).as("vec_id"),
      toDoubleVec(col(vecCol)).as("ce"))
    val scored = q.join(c, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the
    * query's sign-LSH bucket; ranking as in the brute-force path.
    * Recall trades off with `planes` (more planes → smaller buckets). */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 6): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"),
        toDoubleVec(col(vecCol)).as("qe"))
      .withColumn("bucket", signLshKey(col("qe"), planes)))
    val c = corpus.select(col(idCol).as("vec_id"),
        toDoubleVec(col(vecCol)).as("ce"))
      .withColumn("bucket", signLshKey(col("ce"), planes))
    val scored = q.join(c,
        col("qid") =!= col("vec_id") && q("bucket") === c("bucket"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}
