package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-parallelism scaling evidence (stands in for the north rule's N vs 4N
 * executor criterion per task instructions): runs the identical CM-build
 * workload at `local[8]` and `local[32]` in one process, reports throughput
 * at both plus scaling efficiency = (T8/T32) / 4. Written to stdout as one
 * JSON line and appended to BENCH_SCALING.md.
 */
object ScalingBench {

  def runAt(cpus: Int, rows: Long): Double = {
    val spark = Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("WARN")
    // warmup (JIT + codegen) then measured run
    Bench.sketchThroughput(spark, rows / 10, cpus)
    val stats = Bench.sketchThroughput(spark, rows, cpus)
    System.err.println(s"[scaling] cpus=$cpus " + stats.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
    spark.stop()
    // SparkSession.clearActiveSession so the next master takes effect
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    stats("cm_build_mrows_per_sec")
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "80000000").toLong
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    // burn-in session: the first SparkSession in a JVM eats classloading +
    // C2 compilation of the whole codegen'd pipeline (measured: 2-10x noise
    // on whichever stage runs first). Pay that cost in a throwaway session
    // so both measured sessions see steady state.
    runAt(hi, rows / 4)
    val tLo = runAt(lo, rows)
    val tHi = runAt(hi, rows)
    val speedup = tHi / tLo
    val efficiency = speedup / (hi.toDouble / lo)
    val json = f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"frac","cores_lo":$lo,"cores_hi":$hi,"mrows_per_sec_lo":$tLo%.3f,"mrows_per_sec_hi":$tHi%.3f,"speedup":$speedup%.3f,"rows":$rows}"""
    println(json)
    val line = f"| ${java.time.LocalDate.now()} | $rows | local[$lo]: $tLo%.2f Mrows/s | local[$hi]: $tHi%.2f Mrows/s | speedup $speedup%.2f× | efficiency $efficiency%.2f |\n"
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
