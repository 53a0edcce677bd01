package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * `rand()`-based sampling is not stable under retries, speculative
  * tasks, or repartitioning — at 100 TB a resubmitted stage would
  * sample DIFFERENT rows, breaking train/eval splits and incremental
  * reruns. Both operators here are content-addressed: the keep/drop
  * decision is a pure function of the row key and a salt, so any
  * cluster, partitioning, or re-run selects the identical subset, and
  * changing the salt draws an independent sample.
  *
  * The decision hash is md5 (hex-string order) rather than a native
  * 64-bit hash solely so the SAME selection is expressible in any
  * engine (the DuckDB oracle gate recomputes it verbatim); one md5 per
  * row is scan-linear and vectorizes in codegen.
  */
object Sampling {

  /** Hex threshold for `rate` over the first 8 md5 nibbles. */
  private[graft] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** The row's decision coordinate: md5("<key>:<salt>") as lowercase
    * hex — uniform over [0, 16^32) in lexicographic order. */
  def sampleKey(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(":" + salt)))

  /** Keep each row iff its decision coordinate < rate — a stable
    * Bernoulli(rate) sample keyed by `key`. Pure filter: predicate
    * pushdown and partition pruning still apply upstream. */
  def hashSample(df: DataFrame, key: Column, rate: Double,
      salt: String = "graft"): DataFrame =
    df.filter(substring(sampleKey(key, salt), 1, 8)
      .lt(lit(hexThreshold(rate))))

  /** The decision coordinate as an exact dyadic fraction in [0, 1):
    * first 8 md5 nibbles / 2^32. Both operands are integer-valued
    * doubles, so any IEEE engine computes the identical value — the
    * DuckDB gate recompares it bit-for-bit. */
  def sampleFraction(key: Column, salt: String): Column =
    conv(substring(sampleKey(key, salt), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Weighted (importance) sample: keep each row with ITS OWN
    * probability `weight` (clamped to [0, 1]) — quality-curriculum
    * selection, e.g. keep long/high-scoring documents preferentially.
    * Same content-addressed decision as [[hashSample]], so retries,
    * repartitions, and engines agree row-by-row; still a pure filter,
    * so pushdown and pruning apply upstream. */
  def weightedSample(df: DataFrame, key: Column, weight: Column,
      salt: String = "graft"): DataFrame =
    df.filter(sampleFraction(key, salt) <
      least(lit(1.0), greatest(lit(0.0), weight)))

  /** Mixture rebalancing: downsample strata so the kept corpus matches
    * `targetShares` (stratum → fraction) in expectation — the standard
    * domain/language remixing step before pretraining. The largest
    * achievable total under downsampling-only is
    * N' = min over strata of (n_s / p_s); each stratum keeps with rate
    * p_s · N' / n_s (the limiting stratum keeps everything). Strata
    * absent from the map are dropped.
    *
    * Scale: stratum counts are a stratum-cardinality aggregate
    * (partial-aggregated wordcount shape) joined BACK as a broadcast —
    * the corpus side stays a pure filter on the content-addressed
    * coordinate, so pushdown still applies and any engine/retry keeps
    * identical rows.
    *
    * Every target stratum must be PRESENT in the corpus: a requested
    * stratum with zero rows makes the mix unsatisfiable (its n_s/p_s
    * bound is 0), so rather than silently ignoring it and shipping a
    * corpus that cannot match the requested shares, this fails fast.
    * The check collects the stratum-count table — bounded by
    * |targetShares| rows — and persists it, so the corpus is still
    * scanned once. */
  def rebalance(df: DataFrame, stratum: Column, key: Column,
      targetShares: Map[String, Double],
      salt: String = "graft"): DataFrame = {
    require(targetShares.nonEmpty && targetShares.values.forall(_ > 0.0),
      "target shares must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val shares = targetShares.toSeq.toDF("__stratum", "__share")
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .join(shares, "__stratum")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val present = counts.select(col("__stratum").cast("string"))
      .as[String].collect().toSet
    val missing = targetShares.keySet -- present
    require(missing.isEmpty,
      "rebalance: target strata absent from the corpus (unsatisfiable " +
        s"mix): ${missing.toSeq.sorted.mkString(", ")}")
    val nPrime = counts.agg(min(col("__n") / col("__share")).as("__np"))
    val rates = counts.crossJoin(broadcast(nPrime))
      .select(col("__stratum").as("__rate_s"),
        least(lit(1.0), col("__share") * col("__np") / col("__n"))
          .as("__rate"))
    df.join(broadcast(rates), stratum === col("__rate_s"), "inner")
      .where(sampleFraction(key, salt) < col("__rate"))
      .drop("__rate", "__rate_s")
  }

  /** Temperature-flattened mixture sampling — the multilingual/T5
    * mixing rule: the kept corpus follows shares p_s ∝ n_s^(1/T)
    * (T = 1 keeps the natural mix, i.e. everything; T → ∞ approaches
    * uniform shares), realized by downsampling only, so the largest
    * achievable total is N' = min_s(n_s / p_s) and stratum s keeps
    * with rate p_s · N' / n_s — the limiting stratum keeps all rows.
    *
    * Scale: identical shape to [[rebalance]] — one stratum-cardinality
    * aggregate, unit-sized share/total relations riding along as
    * broadcasts, and the corpus side stays a pure filter on the
    * content-addressed coordinate (pushdown applies; any engine/retry
    * keeps identical rows). Unlike rebalance's dyadic literal shares,
    * the pow() rates are NOT binary-exact across runtimes, so rates
    * quantize to 1e-6 before the coordinate compare — the same
    * discipline as the suite's quality-score gates — and any engine
    * replays the identical keep set. */
  def temperatureMix(df: DataFrame, stratum: Column, key: Column,
      temperature: Double, salt: String = "graft"): DataFrame = {
    require(temperature > 0.0, "temperature must be positive")
    val invT = 1.0 / temperature
    val counts = df.groupBy(stratum.as("__stratum"))
      .agg(count(lit(1)).cast("double").as("__n"))
    val tot = counts.agg(sum(pow(col("__n"), invT)).as("__tot"))
    val p = counts.crossJoin(broadcast(tot))
      .withColumn("__p", pow(col("__n"), invT) / col("__tot"))
    val nPrime = p.agg(min(col("__n") / col("__p")).as("__np"))
    val rates = p.crossJoin(broadcast(nPrime))
      .select(col("__stratum").as("__rate_s"),
        (floor(least(lit(1.0), col("__p") * col("__np") / col("__n"))
          * 1e6) / 1e6).as("__rate"))
    df.join(broadcast(rates), stratum === col("__rate_s"), "inner")
      .where(sampleFraction(key, salt) < col("__rate"))
      .drop("__rate", "__rate_s")
  }

  /** Stratified fixed-quota sample: the `quota` rows of each stratum
    * whose decision coordinate orders first (key tiebreak). One
    * hash-shuffle on the stratum column + one in-partition sort —
    * skewed strata cost their own partition only, and the per-stratum
    * quota bounds the output regardless of stratum size. */
  def stratified(df: DataFrame, stratum: Column, key: Column,
      quota: Int, salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(sampleKey(key, salt).asc, key.asc)
    df.withColumn("__s_rn", row_number().over(w))
      .filter(col("__s_rn") <= quota)
      .drop("__s_rn")
  }
}
