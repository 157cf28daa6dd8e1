package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.SketchFunctions._
import graft.data.CorpusGenerator

/**
 * Benchmark main (driver-run per round → BENCH_r{N}.json).
 *
 * Emits ONE JSON line: headline metric = Count-Min sketch-build throughput
 * (M rows/s) on a ≥10M-row deterministic zipf corpus — the BASELINE.md
 * yardstick against the reference's single-core update-loop numbers
 * (/root/reference/data/throughput.txt) — plus per-query wall times over the
 * driver's sf directory.
 */
object Bench {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One untimed warm run then best-of-3 — for single-path tools
    * (ScanScale etc.); the main bench uses [[timeAllInterleaved]]. */
  def timeBest[T](f: => T): Double = {
    f
    Seq(time(f)._2, time(f)._2, time(f)._2).min
  }

  /** Measure every path with one untimed warm run (absorbs codegen/JIT debt
    * so numbers are order-insensitive), then INTERLEAVED cycles — each cycle
    * times every path once, best-of-cycles per path. Interleaving matters on
    * this shared VM: external load arrives in bursts of minutes, so three
    * back-to-back reps of one path can ALL land inside a burst (observed:
    * one path 8× slow while its neighbors were nominal); spreading a path's
    * samples across the full measurement window makes the min robust. */
  /** `teardown` runs after every sample OUTSIDE the timed region — cache
    * teardown must never bill the path that owns the cache (the same rule
    * the gate runner applies to clearCache). */
  def timeAllInterleaved(paths: Seq[(String, () => Unit)], cycles: Int = 3,
      teardown: () => Unit = () => ()): Map[String, Double] = {
    paths.foreach { p => p._2(); teardown() } // warm
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to cycles; (name, f) <- paths) {
      val sec = time(f())._2
      teardown()
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
    }
    best.toMap
  }

  /** CM/TopK/HLL build throughput over `rows` generated corpus rows.
    * `eps` sizes the CM paths: 1e-4 (width 32768, 1.3MB buffer) stresses
    * memory, 1e-3 (width 4096, 160KB) is the cache-resident HH sizing. */
  def sketchThroughput(spark: SparkSession, rows: Long, parts: Int,
      eps: Double = sys.env.getOrElse("SPARK_GRAFT_BENCH_EPS", "1e-4").toDouble)
      : Map[String, Double] = {
    // prune to the two consumed columns BEFORE caching: the cached working
    // set is what a column-pruned parquet scan would deliver, and it must
    // fit in memory or the "throughput" measures disk instead
    val corpus = CorpusGenerator.keyed(spark, rows, parts)
      .select(col("token"), col("weight")).cache()
    corpus.count() // materialize outside the timed region
    // drain the generation garbage (80M-row string churn) before timing —
    // otherwise the first measured stage absorbs the collection
    System.gc()
    graft.agg.NativeCountMinAgg.register(spark, eps = eps)
    graft.agg.NativeTopKAgg.register(spark, capacity = 4096, eps = eps)
    graft.agg.NativeHllAgg.register(spark, p = 14)
    corpus.createOrReplaceTempView("bench_corpus_v")
    val paths: Seq[(String, () => Unit)] = Seq(
      "cm_build" -> (() =>
        corpus.agg(cm_sketch(col("token"), col("weight"), eps = eps)).head()),
      "cm_native_build" -> (() =>
        spark.sql("SELECT cm_sketch_fast(token, weight) FROM bench_corpus_v").head()),
      "topk_build" -> (() =>
        corpus.agg(cm_topk(col("token"), lit(1L), capacity = 4096, eps = eps)).head()),
      "topk_native_build" -> (() =>
        spark.sql("SELECT topk_sketch_fast(token, 1L) FROM bench_corpus_v").head()),
      "hll_build" -> (() =>
        corpus.agg(hll_sketch(col("token"), p = 14)).head()),
      "hll_native_build" -> (() =>
        spark.sql("SELECT hll_sketch_fast(token) FROM bench_corpus_v").head()),
      "kll_build" -> (() =>
        corpus.agg(kll_sketch(col("weight").cast("double"), k = 200)).head()),
      "tdigest_build" -> (() =>
        corpus.agg(tdigest_sketch(col("weight").cast("double"))).head()),
      // platform baseline: pure whole-stage-codegen scan+hash aggregate over
      // the same cache - zero sketch code; what the VM's Spark pipeline can do
      "scan_baseline" -> (() =>
        corpus.agg(expr("bit_xor(xxhash64(token))")).head()))
    // 5 interleaved cycles (vs the gate's 3): the throughput block is the
    // headline BASELINE.md comparison and load bursts on this shared VM
    // last minutes — more, wider-spread samples per path make the per-path
    // min meaningfully burst-resistant (BENCH_SCALING.md methodology)
    val secs = timeAllInterleaved(paths, cycles = 5)
    corpus.unpersist()
    val scanSec = secs("scan_baseline")
    secs.flatMap { case (name, sec) =>
      Seq(s"${name}_sec" -> sec, s"${name}_mrows_per_sec" -> rows / sec / 1e6,
        // scan-normalized ratio: path throughput relative to the SAME RUN's
        // pure-codegen scan+agg baseline. A VM load burst that lands inside
        // one measurement moves the absolute Mrows/s but not this ratio
        // (both numerator and denominator ride the same box), so a recorded
        // conclusion (e.g. native-vs-udaf ordering) can be read off the
        // ratios even when the absolutes are burst-skewed — the round-4
        // BENCH artifact inverted the hll ordering exactly this way
        // (VERDICT r4 "what's wrong" #2).
        s"${name}_scan_ratio" -> scanSec / sec)
    }
  }

  def session(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors() / 2).toString)
    val benchRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "10000000").toLong
    val spark = session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + codegen for the aggregate stages, outside the timed region
    sketchThroughput(spark, math.max(benchRows / 20, 100000), cpus.toInt)
    // one partition per core: each partial task owns exactly one O(d*w)
    // sketch buffer, so partial-buffer serialization cost stays constant as
    // cores scale (the 100TB-cluster sizing rule: partials ∝ executors, not
    // input splits)
    val corpusStats = sketchThroughput(spark, benchRows, cpus.toInt)

    // Per-query gate: one untimed warm cycle (codegen/JIT debt), then
    // INTERLEAVED measured cycles, best-of-cycles per query — the same
    // discipline as timeAllInterleaved/ScalingBench. Round 2 ran each query
    // once, and shared-VM load bursts made per-query numbers swing 3-9×
    // between rounds on unchanged code; spreading a query's samples across
    // the full window makes the min attributable. clearCache stays OUTSIDE
    // the timed region so each run pays its own internal persists and none
    // inherits another's.
    val gateCycles =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_GATE_CYCLES", "3").toInt)
    // q00_scan: a zero-sketch pure-codegen scan+hash over the gate's own sf
    // directory, timed INSIDE the interleaved gate cycle at the same cadence
    // as the real queries (VERDICT r5 "what's wrong" #1). It is the
    // per-query twin of the throughput block's scan_baseline: a VM load
    // burst moves q00_scan and its in-window neighbors together, so any
    // BENCH_r{N} query time can be read relative to what the box could do
    // in THAT window (qNN / q00 ratios are round-comparable; absolutes are
    // not). Excluded from total_query_sec — it is an anchor, not workload.
    val scanAnchor: (SparkSession, String) => DataFrame = (s, dir) =>
      graft.queries.Tables.lineitem(s, dir).agg(
        expr("bit_xor(xxhash64(l_orderkey, l_partkey, l_suppkey, l_quantity))")
          .as("scan_fingerprint"))
    val gate = ("q00_scan" -> scanAnchor) +:
      SparkEntry.queries.toSeq.sortBy(_._1)
    def runOnce(fn: (SparkSession, String) => DataFrame): Double = {
      val (ok, sec) = time {
        try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      }
      spark.catalog.clearCache()
      if (ok) sec else -1.0
    }
    gate.foreach { case (_, fn) => runOnce(fn) } // warm cycle, untimed
    // best-of-SUCCESSFUL-cycles per query: one failed cycle (a transient VM
    // hiccup) must not poison a query that succeeded in other cycles, and
    // permanently-failing queries are reported in `failed`, not summed as
    // -1 into the total (ADVICE r3)
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to gateCycles; (name, fn) <- gate) {
      val sec = runOnce(fn)
      if (sec >= 0)
        best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
    }
    val queryTimes = gate.map { case (name, _) => name -> best.getOrElse(name, -1.0) }
    val failed = queryTimes.collect { case (k, v) if v < 0 => k }
    val total = queryTimes
      .collect { case (k, v) if v >= 0 && k != "q00_scan" => v }.sum
    val extras = corpusStats.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString(",")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // line 1, verbose (full query names, 3 decimals): the human-readable
    // record in the sbt log
    val qsFull = queryTimes.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"cm_build_mrows_per_sec","value":${
      f"${corpusStats("cm_build_mrows_per_sec")}%.3f"
    },"unit":"Mrows/s","total_query_sec":${f"$total%.3f"},"failed":$failedJson,"bench_rows":$benchRows,"cpus":$cpus,"gate_cycles":$gateCycles,$extras,"queries":$qsFull,"sf":"$sfDir"}""")
    // LAST line, compact (~1 KB): the driver snapshots the final ~2000 chars
    // of stdout into BENCH_r{N}.json, and round 3's single verbose line
    // (~3.6 KB) was truncated mid-JSON there (VERDICT r3 item 8). Query keys
    // shrink to their unambiguous qNN prefix, throughput keys to the path
    // name; sbt's trailing "[success]" line still fits beside it.
    // short key = the full qNN prefix up to the first underscore (NOT a
    // fixed take(3), which would silently merge q10x with q10 if the gate
    // ever reaches three-digit ids); uniqueness asserted so a collision
    // fails the bench loudly instead of last-writer-winning in the JSON
    val shortKeys = queryTimes.map { case (k, _) => k.takeWhile(_ != '_') }
    require(shortKeys.distinct.size == shortKeys.size,
      s"compact bench keys collide after prefix-shortening: $shortKeys")
    val qsShort = queryTimes.zip(shortKeys)
      .map { case ((_, v), sk) => "\"" + sk + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    val mrowsShort = corpusStats.toSeq.sortBy(_._1).collect {
      case (k, v) if k.endsWith("_mrows_per_sec") =>
        "\"" + k.stripSuffix("_build_mrows_per_sec").stripSuffix("_mrows_per_sec") +
          f"\":$v%.2f"
    }.mkString("{", ",", "}")
    // scan-normalized ratios (path mrows / same-run scan mrows): the
    // burst-proof record — see sketchThroughput's _scan_ratio note
    val normShort = corpusStats.toSeq.sortBy(_._1).collect {
      case (k, v) if k.endsWith("_scan_ratio") && k != "scan_baseline_scan_ratio" =>
        "\"" + k.stripSuffix("_build_scan_ratio").stripSuffix("_scan_ratio") +
          f"\":$v%.2f"
    }.mkString("{", ",", "}")
    val sfShort = sfDir.split('/').last
    // bench_rows/cpus/gate_cycles live on the verbose line only: at 110
    // gate keys the compact line sits ~1.7 KB and every spare field is
    // headroom against the driver's ~2000-char stdout snapshot
    val compact = s"""{"metric":"cm_build_mrows_per_sec","value":${
      f"${corpusStats("cm_build_mrows_per_sec")}%.2f"
    },"unit":"Mrows/s","total_query_sec":${f"$total%.2f"},"failed":$failedJson,"mrows":$mrowsShort,"mrows_scan_norm":$normShort,"queries":$qsShort,"sf":"$sfShort"}"""
    require(compact.length <= 1800,
      s"compact bench line ${compact.length} chars > 1800 — the driver's " +
        "2000-char stdout snapshot would truncate it; shorten the blocks")
    println(compact)
    spark.stop()
  }
}
