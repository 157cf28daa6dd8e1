package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench
import graft.queries.TextQueries

/**
 * Measure the tiled-vs-prefix cutover for the exact n-gram Jaccard join
 * (VERDICT r3 item 2): both paths, t ∈ {0.1, 0.2, 0.3, 0.5} × sf ∈
 * {0.01, 0.1}, under the interleaved best-of-3 discipline (the only timing
 * methodology that is attributable on this shared VM). Prints a markdown
 * table; the committed grid lives in BENCH_SCALING.md and sets
 * [[TextQueries]]'s `PrefixCutoverMicro`.
 *
 * Both paths are row-identical at any t (JaccardJoinSpec), so this tunes
 * cost only, never results.
 */
object JaccardCutover {

  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val sfs = Seq("sf0.01", "sf0.1")
    val ts = Seq(100000L, 200000L, 300000L, 500000L)
    val sb = new StringBuilder
    sb.append("| sf | t | tiled_sec | prefix_sec | winner |\n")
    sb.append("|---|---|---|---|---|\n")
    for (sf <- sfs) {
      val dir = s"/root/testdata/$sf"
      val paths: Seq[(String, () => Unit)] = ts.flatMap { t =>
        Seq(
          s"tiled_$t" -> (() => {
            TextQueries.ngramJaccardPath(spark, dir, t, usePrefix = false).count(): Unit
          }),
          s"prefix_$t" -> (() => {
            TextQueries.ngramJaccardPath(spark, dir, t, usePrefix = true).count(): Unit
          }))
      }
      // cache teardown outside the timed region (gate-runner discipline) —
      // billing clearCache to the sample would bias against the path that
      // persists more intermediates
      val best = Bench.timeAllInterleaved(paths,
        teardown = () => spark.catalog.clearCache())
      for (t <- ts) {
        val tiled = best(s"tiled_$t")
        val prefix = best(s"prefix_$t")
        val winner = if (tiled <= prefix) "tiled" else "prefix"
        sb.append(f"| $sf | ${t / 1000000.0}%.1f | $tiled%.2f | $prefix%.2f | $winner |\n")
      }
    }
    println(sb.toString)
    spark.stop()
  }
}
