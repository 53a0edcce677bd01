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

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): uniform in [-0.5, 0.5) derived from xxhash64 — reproducible
    * across the cluster without shipping plane matrices. */
  private def planeComponent(table: Int, plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(table.toLong * 1000 + plane), dim), lit(1000000L))
      .cast("double") / 1e6) - 0.5

  /** Sign-LSH bucket key: one bit per hyperplane. `table` seeds an
    * independent plane family (banded LSH uses several tables). */
  def signLshKey(vec: Column, planes: Int, table: Int = 0): Column =
    (0 until planes).map { p =>
      val proj = aggregate(zip_with(vec,
        transform(sequence(lit(0), size(vec) - 1), i => planeComponent(table, p, i)),
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

  /** Distance of `vec` to each centroid as array<struct<d,c>> (squared
    * L2; centroids ship as literals — code, not data). */
  private def centroidDists(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array(centroids.zipWithIndex.map { case (ctr, i) =>
      val cLit = array(ctr.map(lit): _*)
      val d = aggregate(zip_with(vec, cLit, (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x)
      struct(d.as("d"), lit(i).as("c"))
    }: _*)

  /** Nearest-centroid id (argmin over [[centroidDists]]; array_min
    * orders struct arrays by the first field). */
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(centroidDists(vec, centroids))("c")

  /** (cluster, cdist) struct: nearest-centroid id AND the squared-L2
    * distance to it in one argmin pass (assignment + keep-rule inputs
    * of [[graft.operators.Dedup.semanticDedup]]). */
  def nearestCentroidAssign(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val m = array_min(centroidDists(vec, centroids))
    struct(m("c").as("cluster"), m("d").as("cdist"))
  }

  /** The `nprobe` nearest centroid ids, nearest first (the IVF probe
    * list; multi-probe pair enumeration in semanticDedup). */
  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]],
      nprobe: Int): Column =
    slice(transform(array_sort(centroidDists(vec, centroids)),
      s => s("c")), 1, nprobe)

  /** Lloyd k-means over an embedding column, distributed: assignment is
    * a codegen'd argmin against broadcast centroid literals, the update
    * step one (cid, dim) grouped mean. Returns nlist centroids.
    * Deterministic init: the nlist lowest xxhash64(id) corpus vectors. */
  def kmeansCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): Seq[Seq[Double]] = {
    val vecs = corpus.select(col(idCol).as("id"), toDoubleVec(col(vecCol)).as("e"))
    var centroids: Seq[Seq[Double]] = vecs
      .orderBy(xxhash64(col("id"))).limit(nlist)
      .select(col("e")).collect().toSeq.map(_.getSeq[Double](0))
    for (_ <- 1 to iters) {
      val assigned = vecs.withColumn("cid", nearestCentroid(col("e"), centroids))
      val means = assigned
        .select(col("cid"), posexplode(col("e")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ps"))
        .select(col("cid"), transform(col("ps"), p => p("m")).as("ctr"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      // empty clusters keep their previous centroid
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** IVF top-k: corpus partitioned into nlist centroid lists; each
    * query probes its `nprobe` nearest lists. nprobe = nlist degrades
    * gracefully to exact brute force (asserted in spec). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    val centroids = kmeansCentroids(corpus, idCol, vecCol, nlist, iters)
    val c = corpus.select(col(idCol).as("vec_id"),
        toDoubleVec(col(vecCol)).as("ce"))
      .withColumn("cid", nearestCentroid(col("ce"), centroids))
    val q = broadcast(queries.select(col(idCol).as("qid"),
        toDoubleVec(col(vecCol)).as("qe"))
      .withColumn("cid",
        explode(nearestCentroids(col("qe"), centroids, nprobe))))
    val scored = q.join(c, q("cid") === c("cid") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Banded sign-LSH bucket rows: one (table, bucket) row per input row
    * per table — independent plane families so a near neighbor missed
    * by one table's split is caught by another (same recall structure
    * as MinHash-LSH banding). */
  private def bandedKeys(df: DataFrame, planes: Int, tables: Int,
      vec: Column): DataFrame =
    df.withColumn("__tb", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), signLshKey(vec, planes, t).as("b"))): _*)))
      .withColumn("__t", col("__tb")("t"))
      .withColumn("bucket", col("__tb")("b"))
      .drop("__tb")

  /** LSH-bucketed approximate top-k: candidates restricted to buckets
    * the query shares with the corpus row in ANY of `tables` independent
    * plane families; ranking as in the brute-force path. Recall rises
    * with `tables`, bucket selectivity with `planes`; recall vs the
    * exact baseline is asserted in DedupSimilaritySpec. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 6,
      tables: Int = 4): DataFrame = {
    val q = broadcast(bandedKeys(queries.select(col(idCol).as("qid"),
      toDoubleVec(col(vecCol)).as("qe")), planes, tables, col("qe")))
    val c = bandedKeys(corpus.select(col(idCol).as("vec_id"),
        toDoubleVec(col(vecCol)).as("ce")), planes, tables, col("ce"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scored = q.join(c,
        col("qid") =!= col("vec_id") && q("__t") === c("__t") &&
          q("bucket") === c("bucket"))
      .select(col("qid"), col("vec_id"), col("qe"), col("ce"))
      .dropDuplicates("qid", "vec_id")
      .select(col("qid"), col("vec_id"),
        cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    val topk = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
    Dedup.materializeAndFree(topk, c)
  }
  /** Symmetric per-vector int8 quantization: scale = max|x|/127,
    * q_i = floor(x_i/scale + 0.5) clamped to [-127, 127], stored as
    * array<tinyint> + one float scale — a 4× memory/scan reduction
    * for a 100 TB embedding store (the standard faiss-style SQ8
    * layout). The rounding rule is integer-floor so any engine
    * replays it bit-for-bit; all-zero vectors keep scale 0 and an
    * all-zero code. */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame = {
    val v = toDoubleVec(col(vecCol))
    val scale = aggregate(v, lit(0.0),
      (acc, x) => greatest(acc, abs(x))) / 127.0
    df.select(col(idCol).as("vec_id"),
        v.as("__v"), scale.as("qscale"))
      .select(col("vec_id"), col("qscale").cast("float").as("qscale"),
        transform(col("__v"), x =>
          when(col("qscale") === 0.0, lit(0))
            .otherwise(greatest(lit(-127), least(lit(127),
              floor(x / col("qscale") + 0.5).cast("int"))))
            .cast("tinyint")).as("qvec"))
  }

  /** Brute-force cosine top-k over the QUANTIZED corpus: codes
    * dequantize on the fly (q·scale), queries stay full-precision.
    * Same broadcast/no-corpus-shuffle shape as [[bruteForceTopK]] —
    * the corpus side just reads 1/4 the bytes. */
  def quantTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"),
      toDoubleVec(col(vecCol)).as("qe")))
    val c = quantizeInt8(corpus, idCol, vecCol)
      .select(col("vec_id"),
        transform(col("qvec"),
          x => x.cast("double") * col("qscale").cast("double")).as("ce"))
    val scored = q.join(c, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }
}