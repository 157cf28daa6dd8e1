package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Bench
import graft.data.SyntheticScale
import graft.queries.IncrementalDedup

/**
 * q80 scaling separation (VERDICT r5 next #4's "Done" criterion): show the
 * incremental-dedup DELTA PASS costs ∝ |delta|, not |base| — the property
 * that makes incremental curation cheaper than re-running q15 over
 * base ∪ delta.
 *
 * Grid: bases at 1× and 10× (5k / 50k docs, [[SyntheticScale]] family),
 * deltas at 1×, 10× and 100× (5k / 50k / 500k docs — two decades, because
 * at one decade every cell is fixed-cost dominated and proves nothing
 * about the growth term, the q69 three-decade lesson; independent id
 * range ⇒ fresh content, plus an every-20th-base-doc planted duplicate
 * block so the confirm path does real work). Each cell measured as
 *   prep   = prepareBase (the one-time amortized cost — reported, and
 *            expected ∝ |base|)
 *   delta  = dedupDelta + census action (the per-snapshot cost — the claim
 *            is rows along a base column are FLAT while rows along a delta
 *            column scale ~linearly)
 * Interleaved min-of-cycles per cell (the gate discipline; this VM's load
 * arrives in minutes-long bursts).
 */
object DeltaScale {

  /** A delta snapshot: `n` fresh docs (id range disjoint from any base) +
    * every-20th doc of `base` re-planted as a cross-snapshot duplicate. */
  private def makeDelta(spark: SparkSession, base: DataFrame, n: Long)
      : DataFrame = {
    val parts = spark.sparkContext.defaultParallelism
    val fresh = SyntheticScale.documents(spark, n, parts)
      .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
    fresh.unionAll(
      base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 2000000000L).as("doc_id"), col("text")))
  }

  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val root = "target/scale10"
    val cycles = sys.env.getOrElse("SPARK_GRAFT_DECADE_CYCLES", "3").toInt

    // reuse the decade corpora (idempotent writeAll)
    Seq(1, 10).foreach(s => SyntheticScale.writeAll(spark, s"$root/gen${s}x", s))
    val bases = Seq(1, 10).map { s =>
      s -> spark.read.parquet(s"$root/gen${s}x/documents.parquet")
    }.toMap

    // one-time prep per base (timed once each — the amortized side)
    val prepDirs = bases.map { case (s, df) =>
      val dir = s"$root/incr_base_${s}x"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val (_, sec) = Bench.time(IncrementalDedup.prepareBase(spark, df, dir))
      println(f"[delta-scale] prepareBase base=${s}x: $sec%.2f s")
      s -> dir
    }

    // persist the deltas so the timed region is the dedup pass, not the
    // synthetic text generation
    // 1000× (5M docs) only against the 10× base: through 500k docs every
    // cell is fixed-cost dominated on 32 cores, so the linear term needs a
    // third decade to materialize (the q69 lesson)
    def deltaSizes(bs: Int) = if (bs == 10) Seq(1, 10, 100, 1000) else Seq(1, 10, 100)
    val deltas = (for (bs <- Seq(1, 10); ds <- deltaSizes(bs)) yield {
      val path = s"$root/incr_delta_b${bs}_d${ds}.parquet"
      makeDelta(spark, bases(bs), 5000L * ds)
        .write.mode("overwrite").parquet(path)
      (bs, ds) -> path
    }).toMap

    val cells: Seq[(String, () => Unit)] =
      for (bs <- Seq(1, 10); ds <- deltaSizes(bs)) yield {
        s"b${bs}x_d${ds}x" -> (() => {
          val delta = spark.read.parquet(deltas((bs, ds)))
          IncrementalDedup.dedupDelta(spark, delta, prepDirs(bs))
            .agg(count(lit(1)), sum(col("is_dup").cast("long"))).head(): Unit
        })
      }
    val secs = Bench.timeAllInterleaved(cells, cycles = cycles,
      teardown = () => spark.catalog.clearCache())
    for (bs <- Seq(1, 10); ds <- deltaSizes(bs))
      println(f"[delta-scale] base=${bs}x delta=${ds}x: " +
        f"${secs(s"b${bs}x_d${ds}x")}%.2f s")
    val baseGrowth = secs("b10x_d1x") / secs("b1x_d1x")
    val deltaGrowth = secs("b10x_d1000x") / secs("b10x_d1x")
    println(f"[delta-scale] 10x BASE at fixed delta: $baseGrowth%.2f x; " +
      f"1000x DELTA at fixed base: $deltaGrowth%.2f x " +
      "(claim: delta-pass cost follows |delta|, stays ~flat in |base|)")
    spark.stop()
  }
}
