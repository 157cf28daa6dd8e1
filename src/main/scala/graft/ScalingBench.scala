package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-parallelism scaling evidence (stands in for the north rule's N vs 4N
 * executor criterion per task instructions): runs the identical CM-build
 * workload at `local[lo]` and `local[hi]`, reports throughput at both plus
 * scaling efficiency = speedup / (hi/lo).
 *
 * Methodology: a burn-in session first (the first SparkSession in a JVM
 * absorbs C2/codegen compilation), then `reps` interleaved (lo, hi)
 * measurement cycles; each level's throughput is the MAX across cycles
 * (sustained capacity — single-cycle samples vary ~2x on this shared VM,
 * dominated by the lo side; see BENCH_SCALING.md history). Within a cycle,
 * each stage is already best-of-3 (Bench.timeBest). Heap must be large
 * (SPARK_DRIVER_MEM=96g): with 32 mutator threads, young-gen GC becomes the
 * scaling bottleneck on small heaps (a raw-CPU microbenchmark scales ~4x on
 * this box; 8g-heap Spark runs plateaued at ~2.7x).
 */
object ScalingBench {

  def runAt(cpus: Int, rows: Long): (Double, Double) = {
    val spark = Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("WARN")
    val stats = Bench.sketchThroughput(spark, rows, cpus)
    System.err.println(s"[scaling] cpus=$cpus " + stats.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    (stats("cm_build_mrows_per_sec"), stats("scan_baseline_mrows_per_sec"))
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "160000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    runAt(hi, rows / 4) // burn-in session (C2/codegen)
    var tLo = 0.0
    var tHi = 0.0
    var sLo = 0.0
    var sHi = 0.0
    for (_ <- 0 until reps) {
      val (cmL, scL) = runAt(lo, rows)
      tLo = math.max(tLo, cmL); sLo = math.max(sLo, scL)
      val (cmH, scH) = runAt(hi, rows)
      tHi = math.max(tHi, cmH); sHi = math.max(sHi, scH)
    }
    val speedup = tHi / tLo
    val efficiency = speedup / (hi.toDouble / lo)
    val scanSpeedup = sHi / sLo
    // sketch scaling normalized to what Spark's plain codegen scan achieves
    // on this VM (separate-JVM executors on a real cluster do not share one
    // memory system; the scan baseline is this sandbox's platform ceiling)
    val normalized = speedup / scanSpeedup
    val json = f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"frac","cores_lo":$lo,"cores_hi":$hi,"mrows_per_sec_lo":$tLo%.3f,"mrows_per_sec_hi":$tHi%.3f,"speedup":$speedup%.3f,"scan_baseline_lo":$sLo%.3f,"scan_baseline_hi":$sHi%.3f,"scan_speedup":$scanSpeedup%.3f,"efficiency_vs_scan_baseline":$normalized%.3f,"rows":$rows,"reps":$reps}"""
    println(json)
    val line = f"| ${java.time.LocalDate.now()} | $rows | local[$lo]: $tLo%.2f Mrows/s | local[$hi]: $tHi%.2f Mrows/s | speedup $speedup%.2f× | efficiency $efficiency%.2f (vs scan baseline $normalized%.2f) |\n"
    val p = java.nio.file.Paths.get("BENCH_SCALING.md")
    if (!java.nio.file.Files.exists(p)) {
      java.nio.file.Files.writeString(p,
        "# Scaling runs (local[N] vs local[4N], identical input — stands in for N vs 4N executors)\n\n" +
          "| date | rows | lo | hi | speedup | efficiency (target ≥0.8) |\n|---|---|---|---|---|---|\n")
    }
    java.nio.file.Files.writeString(p, line,
      java.nio.file.StandardOpenOption.APPEND)
  }
}
