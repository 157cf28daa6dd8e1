package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench
import graft.data.SyntheticScale
import graft.queries.TextQueries

/**
 * The B ∈ {4000, 6000} Jaccard cutover cells (VERDICT r5 next #5): the
 * round-5 re-fit set `PrefixMinAvgBlockDocs = 4096` from a flat ~1.12×
 * tiled-lead at B = 1000/2500 plus a growth-term argument — the constant's
 * own neighborhood was extrapolated, not measured. B = 10⁴ remains
 * unmeasurable here (candidate-stage shuffle spills past the free disk —
 * the corpus's ≤961-bigram vocabulary makes every posting list huge, so
 * BOTH paths' candidate stages blow up together); 4k and 6k bracket the
 * constant from inside the disk budget.
 *
 * Protocol: ONE (B, path) cell per JVM invocation —
 * `runMain graft.tools.JaccardBigB <scale> <tiled|prefix>` with
 * scale 16 → B = 4000 docs/block, 24 → B = 6000 — because a cell's
 * shuffle files live until the app stops and four cells' spill in one JVM
 * exceeded the disk (attempted; killed at 30+ GB). Per-JVM = warm +
 * best-of-2 with clearCache teardown; cells are minutes-long so the
 * interleaving that matters for sub-10 s measurements matters less here
 * (run the grid twice in both orders if a burst is suspected — the
 * BENCH_SCALING.md A/B discipline). Documents-only corpora
 * (`SyntheticScale.documents`, deterministic — the committed decade
 * cells' family), t = 0.3.
 */
object JaccardBigB {

  def main(args: Array[String]): Unit = {
    require(args.length == 2 && Set("tiled", "prefix")(args(1)),
      "usage: JaccardBigB <scale: 16|24|...> <tiled|prefix>")
    val scale = args(0).toInt
    val usePrefix = args(1) == "prefix"
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"target/scale10/gen${scale}x_docs"
    val parts = spark.sparkContext.defaultParallelism
    if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists())
      SyntheticScale.documents(spark, 5000L * scale, parts)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val b = 250 * scale
    println(s"[bigB] cell: B=$b ${args(1)} (t=0.3)")
    def run(): Unit = {
      val (n, sec) = Bench.time(
        TextQueries.ngramJaccardPath(spark, dir, 300000L, usePrefix).count())
      spark.catalog.clearCache()
      println(f"[bigB] B=$b ${args(1)}: $sec%.2f s ($n pairs)")
    }
    run() // warm (absorbs codegen/JIT; printed for the record, not the min)
    run(); run()
    spark.stop()
  }
}
