package graft.tools

import graft.Bench

/** VERDICT r3 item 5: steady-state comparison of the udaf vs native sketch
  * builds (cm, topk) and the hll/kll udaf builds — N independent
  * interleaved-best-of-3 throughput rounds in one JVM, so a VM load burst
  * shows up as cross-round variance instead of silently deciding the
  * verdict (the r3 bench read cm_native BELOW cm_udaf in a single round).
  * Prints per-round Mrows/s and the max (sustained capacity). */
object SketchBuildProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "20000000").toLong
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROFILE_ROUNDS", "4").toInt
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    Bench.sketchThroughput(spark, rows / 10, cpus.toInt) // burn-in
    val keys = Seq("cm_build", "cm_native_build", "topk_build",
      "topk_native_build", "hll_build", "hll_native_build", "kll_build",
      "tdigest_build", "scan_baseline")
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to rounds) {
      val stats = Bench.sketchThroughput(spark, rows, cpus.toInt)
      println(s"[profile] round $r: " + keys.map { k =>
        val v = stats(s"${k}_mrows_per_sec")
        best(k) = math.max(best.getOrElse(k, 0.0), v)
        f"$k=$v%.1f"
      }.mkString(" "))
    }
    println("[profile] max: " + keys.map(k => f"$k=${best(k)}%.1f").mkString(" "))
    println(f"[profile] cm native/udaf = ${best("cm_native_build") / best("cm_build")}%.2f, " +
      f"topk native/udaf = ${best("topk_native_build") / best("topk_build")}%.2f, " +
      f"hll native/udaf = ${best("hll_native_build") / best("hll_build")}%.2f")
    spark.stop()
  }
}
