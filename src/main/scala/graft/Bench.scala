package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Methodology: every query is materialized through the `noop` sink
  * (`df.write.format("noop")`), which consumes the full output schema —
  * Catalyst cannot prune unreferenced window/projection expressions the
  * way a bare `.count()` allows, so the timings reflect the real work.
  * Queries with a hand-written plain-Spark-SQL twin ([[PlainBaseline]])
  * are timed on both sides and the ours/plain ratio is reported
  * (BASELINE.md target: ratio <= 2.0). Exceptions are NOT swallowed:
  * a failing query is reported in an "errors" map and forces a non-zero
  * exit code after the JSON line is printed.
  */
object Bench {
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = "/root/testdata/sf0.001"
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // optional args: run only the named queries (iteration aid)
    val benchNames =
      if (args.nonEmpty) SparkEntry.benchQueries.filter(args.toSet)
      else SparkEntry.benchQueries
    val (json, failed) = run(spark, sfDir, warmDir, benchNames)
    println(json)
    spark.stop()
    if (failed > 0) sys.exit(1)
  }

  /** Run the bench and return (one-line JSON, failed-query count). The
    * JSON line is ALWAYS produced, whatever fails — a bad table degrades
    * to entries in the "errors" map, never an abort (the BENCH_r10/r11
    * failure mode was one unreadable view killing every timing). */
  def run(spark: SparkSession, sfDir: String, warmDir: String,
          benchNames: Seq[String]): (String, Int) = {
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timed(name: String)(body: => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      try { body; Some((System.nanoTime() - t0) / 1e9) }
      catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\n\\r]", " ").take(200)
          None
      }
    }
    // View registration (and warmup) must never abort the bench: one bad
    // table would otherwise zero out every timing and print no JSON at
    // all (the BENCH_r10/r11 failure mode). A failed registration drops
    // only the plain-baseline side; graft queries read via Tables.load
    // and fail (or not) per-query inside `timed`.
    def guarded(label: String)(body: => Unit): Boolean =
      timed(label)(body).isDefined

    val plainNames0 = benchNames.filter(PlainBaseline.has)
    val plainNames =
      if (guarded("register_views")(PlainBaseline.registerViews(spark, sfDir)))
        plainNames0
      else Seq.empty[String]

    // bench-time operator variants (see SparkEntry.benchVariants)
    def benchQuery(name: String): (SparkSession, String) => DataFrame =
      SparkEntry.benchVariants.getOrElse(name, SparkEntry.queries(name))

    // JVM/codegen warmup on the smallest SF so we measure steady-state.
    // Warmup failures are remembered and reported; the timed run below
    // will surface the same error.
    benchNames.foreach { name =>
      try materialize(benchQuery(name)(spark, warmDir))
      catch { case _: Throwable => () }
    }
    if (plainNames.nonEmpty &&
        guarded("register_views_warm")(PlainBaseline.registerViews(spark, warmDir))) {
      plainNames.foreach { name =>
        try materialize(PlainBaseline.query(spark, name))
        catch { case _: Throwable => () }
      }
      guarded("register_views")(PlainBaseline.registerViews(spark, sfDir))
    }

    // Ratio-paired queries run FIRST and each (ours, plain) pair is
    // measured back-to-back, repeated up to best-of-3: ambient load on
    // a shared box inflates timings in bursts, and taking the two sides
    // ADJACENTLY under up-to-three bursts is what keeps the reported
    // ratio a property of the plans rather than of the moment (the
    // multi-second approximate operators then run last, outside every
    // ratio measurement's GC/page-cache shadow).
    val (ratioNames, soloNames) = benchNames.partition(plainNames.contains)
    val oursBest = scala.collection.mutable.LinkedHashMap[String, Double]()
    val plainBest = scala.collection.mutable.LinkedHashMap[String, Double]()
    val ratioResults = ratioNames.flatMap { name =>
      // cold cache state per QUERY: the persist-heavy operators
      // (minhash sig tables, lshFirstSeen, semanticDedup assignments)
      // leave InMemoryRelations behind, and accumulated pressure makes
      // LATER queries' own caches LRU-evict mid-run — a partial sig
      // eviction re-inlines the k-minhash projection into both join
      // sides, turning a 13 s query into 45 s (measured: isolated
      // q_dedup_minhash best-of-5 12.98-44.67 s spread on identical
      // work, r17 probe). Within a pair both sides then share warm
      // state symmetrically, which is what a ratio should measure.
      spark.catalog.clearCache()
      val first = timed(name)(materialize(benchQuery(name)(spark, sfDir)))
      first.foreach(t => oursBest(name) = t)
      timed(s"plain:$name")(materialize(PlainBaseline.query(spark, name)))
        .foreach(t => plainBest(name) = t)
      // expensive pairs amortize their noise; re-pass the cheap ones
      // (the 3 s line keeps multi-second approximate operators at two
      // runs while the sub-2 s plan-shape pairs — whose first run still
      // carries JIT/codegen warm-up — get a true best-of-3)
      // sub-half-second pairs sit at the scheduler-jitter noise floor
      // (±0.1 s swings a ratio by ±0.3) — give them a true best-of-5.
      // Multi-second pairs get best-of-3 (was 2): at two samples one
      // GC-burst draw decides the ratio — the r16 q_dedup_minhash
      // 1.252 reading, which a fresh-JVM best-of-5 measured at 0.93
      val passes =
        if (first.exists(_ > 3.0)) 2
        else if (first.exists(_ > 0.5)) 2
        else 4
      (1 to passes).foreach { _ =>
        timed(name)(materialize(benchQuery(name)(spark, sfDir)))
          .foreach(t => oursBest(name) =
            math.min(oursBest.getOrElse(name, t), t))
        timed(s"plain:$name")(materialize(PlainBaseline.query(spark, name)))
          .foreach(t => plainBest(name) =
            math.min(plainBest.getOrElse(name, t), t))
      }
      first.map(name -> _)
    }
    // report the BEST ours timing for paired queries (the same number
    // the ratio uses) — the first run carries whatever JIT/codegen
    // warm-up survived the sf0.001 pass and is not the plan's cost
    // solo entries (no plain twin) get best-of-2: a single draw let a
    // GC/LRU burst own a committed number outright (the r17
    // q_dedup_lshseen_capped 50.54 s vs its isolated 7.2 s) — the
    // first reading still surfaces through the cold map when the
    // spread exceeds 2×
    val soloFirst = scala.collection.mutable.LinkedHashMap[String, Double]()
    val soloBest = soloNames.flatMap { name =>
      spark.catalog.clearCache() // same per-query cold start as pairs
      val first = timed(name)(materialize(benchQuery(name)(spark, sfDir)))
      first.foreach(t => soloFirst(name) = t)
      val second = first.flatMap { _ =>
        spark.catalog.clearCache()
        timed(name)(materialize(benchQuery(name)(spark, sfDir)))
      }
      first.map(f => name -> math.min(f, second.getOrElse(f)))
    }
    val results = ratioResults.map { case (n, t) =>
      n -> oursBest.getOrElse(n, t)
    } ++ soloBest
    val plainOut = plainNames.flatMap(n => plainBest.get(n).map(n -> _))
    val ratios = plainOut.flatMap { case (name, pSec) =>
      oursBest.get(name).map(o => name -> (o / math.max(pSec, 1e-9)))
    }
    // steady-state protocol, recorded in the artifact: when a pair's FIRST pass read
    // >2x its best (JIT/codegen warm-up draw), surface that cold reading
    // alongside the steady ratio instead of letting one draw tell the
    // whole story (the r17 q_bench_shape 2.605-vs-1.2 class)
    // capped at the 8 widest spreads: the one-line JSON must stay
    // under the harness's ~1900-char tail window (BenchGuardSpec)
    val bestOf = oursBest ++ soloBest.toMap
    val coldSpread = (ratioResults ++ soloFirst.toSeq).filter {
      case (n, first) =>
        bestOf.get(n).exists(b => first / math.max(b, 1e-9) > 2.0)
    }.sortBy { case (n, first) =>
      -(first / math.max(bestOf.getOrElse(n, first), 1e-9))
    }.take(8)

    (emitJson(results, plainOut, ratios, errors.toSeq, sfDir, coldSpread),
      errors.size)
  }

  /** Render the one-line JSON. Timings are rounded to 3 decimals (1 ms —
    * below bench noise) so the full line stays comfortably under the
    * ~2000-char tail window the harness keeps of this process's output —
    * full-precision doubles pushed the line past it, truncating the front
    * of the JSON and making it unparseable (every BENCH_r*.json through
    * r13 has parsed=null). Guarded by BenchGuardSpec at the current
    * bench-query count. */
  def emitJson(results: Seq[(String, Double)], plainOut: Seq[(String, Double)],
               ratios: Seq[(String, Double)], errors: Seq[(String, String)],
               sfDir: String,
               coldSpread: Seq[(String, Double)] = Nil): String = {
    def r3(v: Double): String = "%.3f".format(v)
    // per-query seconds carry 2 decimals (10 ms grain — the noise
    // floor is ±100 ms anyway); ratios keep 3. The line must stay
    // under the harness's ~1900-char tail window (BenchGuardSpec).
    def r2(v: Double): String = "%.2f".format(v)
    def jmap(kv: Seq[(String, Double)], f: Double => String = r3): String =
      kv.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    // exception messages can carry quotes/backslashes/newlines — escape
    // per RFC 8259 or the one line this whole refactor protects breaks
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""
    def smap(kv: Seq[(String, String)]): String =
      kv.map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // no separate "plain" map: with every query ratio-paired the three
    // maps overflow the tail window — plain twin timings are exactly
    // queries[k] / ratio[k]
    val cold =
      if (coldSpread.isEmpty) ""
      else s""","cold":${jmap(coldSpread, r2)}"""
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${jmap(results, r2)},"ratio":${jmap(ratios)}$cold,"errors":${smap(errors)},"failed":${errors.size},"sf":"${new java.io.File(sfDir).getName}"}"""
  }
}
