package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) interleaving for
  * co-clustering several filter dimensions in one sort order — the
  * OPTIMIZE ZORDER BY of a lakehouse pipeline, applied before the
  * sharded release write so downstream range scans on ANY of the
  * z-dimensions touch a bounded slice of the files.
  *
  * Everything here is closed-form integer arithmetic (shift/and/or
  * chains — whole-stage-codegen'd, no UDF), so the z-value is
  * bit-reproducible by any engine, which is exactly what a 100 TB
  * layout needs: re-clustering a partition on another cluster or
  * engine version yields byte-identical ordering decisions.
  *
  * Scale shape: [[zorderValue]] is a scan-local expression (zero
  * shuffle); [[zorderBy]] adds the ONE range-exchange any global
  * ordering needs — the same cost as a plain ORDER BY on one column,
  * but the resulting files serve range predicates on ALL the
  * z-dimensions (locality spec'd in LayoutSpec: per-file span of each
  * dimension shrinks vs a single-column sort).
  */
object Layout {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i
    * (Morton "part1by1", the classic magic-number sequence). Input
    * must already be masked to 16 bits. */
  private def part1by1(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val b = (a.bitwiseOR(shiftleft(a, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val c = (b.bitwiseOR(shiftleft(b, 2))).bitwiseAND(lit(0x33333333L))
    (c.bitwiseOR(shiftleft(c, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Spread the low 21 bits of `x` to every 3rd position ("part1by2")
    * for 3-dimensional interleave. */
  private def part1by2(x: Column): Column = {
    val a = (x.bitwiseOR(shiftleft(x, 32))).bitwiseAND(lit(0x1F00000000FFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 16))).bitwiseAND(lit(0x1F0000FF0000FFL))
    val c = (b.bitwiseOR(shiftleft(b, 8))).bitwiseAND(lit(0x100F00F00F00F00FL))
    val d = (c.bitwiseOR(shiftleft(c, 4))).bitwiseAND(lit(0x10C30C30C30C30C3L))
    (d.bitwiseOR(shiftleft(d, 2))).bitwiseAND(lit(0x1249249249249249L))
  }

  /** Map a non-negative integral column into [0, 2^bits) by keeping
    * the low `bits` bits (deterministic bucketing for key-like ints;
    * continuous values should be rank-bucketized by the caller). */
  def lowBits(c: Column, bits: Int): Column =
    c.cast("long").bitwiseAND(lit((1L << bits) - 1))

  /** Morton z-value of 2 dimensions (16 bits each → 32-bit z) or 3
    * dimensions (21 bits each → 63-bit z). Dimensions must already be
    * bucket indices in range (see [[lowBits]] / [[rankBuckets]]). */
  def zorderValue(dims: Seq[Column]): Column = dims match {
    case Seq(x, y) =>
      part1by1(lowBits(x, 16)).bitwiseOR(shiftleft(part1by1(lowBits(y, 16)), 1))
    case Seq(x, y, z) =>
      part1by2(lowBits(x, 21))
        .bitwiseOR(shiftleft(part1by2(lowBits(y, 21)), 1))
        .bitwiseOR(shiftleft(part1by2(lowBits(z, 21)), 2))
    case other => throw new IllegalArgumentException(
      s"zorderValue interleaves 2 or 3 dimensions, got ${other.length}")
  }

  /** Bucket a continuous column into 2^bits rank buckets: quantile
    * boundaries over the DISTINCT values in ONE aggregate pass,
    * broadcast as literals into a codegen'd boundary count. Exact (and
    * therefore a pure function of the distinct-value set) up to the
    * sketch accuracy of 10,000 distinct values; above that the
    * boundaries are approximate and can vary with partial-merge order —
    * for the byte-identical cross-engine re-layout contract, feed
    * integral bucket ids through [[lowBits]] instead (the z-value
    * interleave itself is always bit-exact given bucket indices). */
  def rankBuckets(df: DataFrame, c: Column, bits: Int): Column = {
    val n = 1 << bits
    val qs = (1 until n).map(_.toDouble / n)
    val row = df.select(c.cast("double").as("__v")).distinct()
      .agg(percentile_approx(col("__v"),
        array(qs.map(lit): _*), lit(10000)).as("b")).head()
    // empty / all-null column: no boundaries, everything lands in
    // bucket 0 instead of an NPE
    if (row.isNullAt(0)) return lit(0)
    val bounds = row.getSeq[Double](0)
    // width_bucket over explicit ascending bounds: index of the first
    // boundary >= value (dedup'd — percentile can repeat boundaries)
    val distinctBounds = bounds.distinct
    val arr = array(distinctBounds.map(lit): _*)
    // count of boundaries strictly below the value = bucket index
    aggregate(arr, lit(0),
      (acc, b) => acc + when(c.cast("double") > b, 1).otherwise(0))
  }

  /** Re-layout `df` for multi-dimensional locality: one range exchange
    * + within-partition sort on the interleaved z-value. `dims` are
    * bucket-index columns (see [[lowBits]]/[[rankBuckets]]). */
  def zorderBy(df: DataFrame, dims: Seq[Column],
      numPartitions: Int): DataFrame = {
    val z = zorderValue(dims).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
