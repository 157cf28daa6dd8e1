package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Bench, SparkEntry}
import graft.data.SyntheticScale
import graft.queries.{DedupClusterQuery, TextQueries}

/**
 * Decade-scaling measurement (VERDICT r4 next #1 and #6): run the
 * expensive query family on a 1× (≈ sf0.1-shaped) and a 10× generated
 * corpus ([[SyntheticScale]] — identical distribution family, one decade
 * apart, so the t10/t1 ratio is a clean growth measurement rather than a
 * distribution change), plus the 10⁴-node chain experiment for the two CC
 * algorithms. Prints one result line per measurement; the committed table
 * lives in BENCH_SCALING.md.
 *
 * Growth accounting printed per query: ratio = t(10×)/t(1×) and the
 * implied exponent log₁₀(ratio) — 1.0 = linear, 2.0 = quadratic. Judged
 * against each query's STATED complexity (e.g. the tiled Jaccard path is
 * Ω(B²) per block BY DESIGN below the prefix cutover; both paths are
 * measured here — the three-point grid pinned the crossover at B* ≈ 580,
 * committed as PrefixMinAvgBlockDocs = 512).
 */
object ScaleDecade {

  /** The expensive family named by the verdict, plus the round-5 span
    * pair. Subset with SPARK_GRAFT_DECADE_QUERIES (comma-separated) to
    * measure new members without re-running the committed rows. */
  private val Family: Seq[String] = {
    val all = Seq(
      "q18_ngram_jaccard",
      "q25_cosine_neardup",
      "q55_ngram_jaccard_prefix",
      "q37_dedup_clusters",
      "q61_dedup_clusters_star",
      "q39_ann_ivf",
      "q66_ngram_novelty",
      "q62_reroute_repath",
      "q63_reroute_bb",
      "q69_dup_spans",
      "q70_dup_span_cut",
      "q72_semantic_dedup",
      "q73_source_overlap",
      "q74_dsir_select",
      "q75_stream_sessions",
      "q76_mixture_weights",
      "q77_hard_negatives",
      "q78_stream_topk",
      "q79_stream_dedup",
      "q80_incremental_dedup",
      "q81_pq_ann",
      "q82_stream_incr_dedup",
      "q83_bm25_topk",
      "q84_quality_keeper",
      "q85_heavy_change",
      "q86_priority_sample",
      "q87_bpe_merges",
      "q88_cdc_chunks",
      "q89_bpe_tokenize",
      "q90_stream_kll",
      "q91_pmi_collocations",
      "q92_source_drift",
      "q93_stream_join",
      "q94_kmeans",
      "q95_cluster_sample",
      "q96_lm_perplexity",
      "q97_stream_sample",
      "q98_ams_f2",
      "q99_equidepth",
      "q100_pricing_rollup",
      "q101_hll_set_algebra",
      "q102_bloom_join",
      "q103_shipping_priority",
      "q104_cube_distinct",
      "q105_stream_hll",
      "q106_decayed_topk",
      "q107_pagerank",
      "q108_minhash_estimator",
      "q109_kll_rollup",
      "q110_funnel",
      "q111_frequent_pairs",
      "q112_stream_bloom",
      "q113_rfm_segments",
      "q114_zorder",
      "q115_sliding_distinct",
      "q116_local_supplier",
      "q117_bucketed_join")
    sys.env.get("SPARK_GRAFT_DECADE_QUERIES") match {
      case Some(qs) => all.filter(qs.split(',').map(_.trim).toSet)
      case None => all
    }
  }

  /** Best-of-2 with the GATE's teardown rule: clearCache between samples
    * (outside the timed region), so every sample pays its own internal
    * persists. Without the teardown, sample 2 of any query that persists
    * its scan reuses sample 1's cache and min-of-2 reports only the
    * post-cache compute — at 1000× the q69 span census read 1.02 s warm
    * vs 112 s cold, a 110× lie. Matches Bench.runOnce / the gate runner.
    * Used by the cutover-grid block; the Family block interleaves instead
    * (see main) because back-to-back samples of one cell both land inside
    * the same VM load burst. */
  private def timeBest2(spark: SparkSession)(f: => Unit): Double = {
    val a = Bench.time(f)._2
    spark.catalog.clearCache()
    val b = Bench.time(f)._2
    spark.catalog.clearCache()
    println(f"[scale10]   samples: $a%.2f s, $b%.2f s")
    math.min(a, b)
  }

  def main(args: Array[String]): Unit = {
    val spark = Bench.session(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val base = "target/scale10"
    // default decade; override e.g. `runMain graft.tools.ScaleDecade 1` for
    // a generator/query smoke at 1x only (skips the growth table)
    val scales =
      if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10)

    val dirs = scales.map { s =>
      val dir = s"$base/gen${s}x"
      val (_, genSec) = Bench.time(SyntheticScale.writeAll(spark, dir, s))
      println(f"[scale10] generated ${s}x under $dir in $genSec%.1f s")
      s -> dir
    }.toMap

    // Every (query, scale) cell measured via the gate's interleaved
    // discipline (one untimed warm of every cell, then cycles that touch
    // each cell once, min per cell, clearCache teardown after every
    // sample): this VM's load bursts last minutes, so two back-to-back
    // samples of one cell can BOTH land inside a burst — interleaving
    // spreads a cell's samples across the whole window instead.
    val cycles = sys.env.getOrElse("SPARK_GRAFT_DECADE_CYCLES", "3").toInt
    val cells: Seq[(String, () => Unit)] = for (s <- scales; q <- Family)
      yield s"$q@${s}" -> (() => {
        SparkEntry.queries(q)(spark, dirs(s)).count(): Unit
      })
    val interleaved = Bench.timeAllInterleaved(cells, cycles = cycles,
      teardown = () => spark.catalog.clearCache())
    val results = collection.mutable.Map.empty[(String, Int), Double]
    for (s <- scales; q <- Family) {
      val sec = interleaved(s"$q@${s}")
      results((q, s)) = sec
      println(f"[scale10] $q @ ${s}x: $sec%.2f s (min of $cycles interleaved)")
    }
    // subset runs (env-filtered Family) measure only the named queries:
    // the cutover grid and the chain experiment are committed rows
    val subsetRun = sys.env.contains("SPARK_GRAFT_DECADE_QUERIES")
    // the measured-cutover claim: both explicit Jaccard paths at both
    // scales (block size 250 -> 2500 docs across the decade)
    for (s <- scales if !subsetRun;
         (path, usePrefix) <- Seq(("tiled", false), ("prefix", true))) {
      val sec = timeBest2(spark) {
        TextQueries.ngramJaccardPath(spark, dirs(s), 300000L, usePrefix)
          .count(): Unit
      }
      spark.catalog.clearCache()
      results((s"jaccard_$path", s)) = sec
      println(f"[scale10] jaccard_$path @ ${s}x: $sec%.2f s")
    }

    if (scales == Seq(1, 10)) {
      println("[scale10] ---- decade growth ----")
      (Family ++ (if (subsetRun) Nil
                  else Seq("jaccard_tiled", "jaccard_prefix"))).foreach { q =>
        val t1 = results((q, 1))
        val t10 = results((q, 10))
        val ratio = t10 / t1
        println(f"[scale10] $q%-26s t1=$t1%7.2f s  t10=$t10%7.2f s  " +
          f"ratio=$ratio%6.2f  exponent=${math.log10(ratio)}%.2f")
      }
    }

    // ---- 10^4-node chain: star vs min-label propagation (verdict #6) ----
    if (subsetRun) { spark.stop(); return }
    import spark.implicits._
    val chainN = 10000L
    val half = spark.range(0L, chainN - 1).select(col("id").as("src"),
      (col("id") + 1).as("dst"))
    val chain = half.unionAll(half.select(col("dst").as("src"),
      col("src").as("dst"))).localCheckpoint()

    def rounds(dir: String): Int = {
      val f = new java.io.File(dir)
      if (!f.exists()) 0
      else f.listFiles().count(_.getName.startsWith("commit-"))
    }

    // timed runs carry NO checkpoint dir (pure compute, same footing for
    // both algorithms); the star's round count comes from a separate
    // untimed checkpointed run
    val (starLabels, starSec) = Bench.time {
      DedupClusterQuery.connectedComponentsStar(chain, maxRounds = 200)
        .collect()
    }
    val starOk = starLabels.forall(_.getLong(1) == 0L) &&
      starLabels.length == chainN
    val starDir = s"$base/cc_star_chain"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(starDir))
    DedupClusterQuery.connectedComponentsStar(chain,
      ckptDir = Some(starDir), maxRounds = 200).collect()
    println(f"[scale10] chain10k star: $starSec%.1f s, ${rounds(starDir)} " +
      f"rounds, labels_ok=$starOk")

    // propagation converges in O(diameter) rounds = ~10^4 here — run a
    // bounded 25-round slice and report the measured per-round cost (the
    // full run would be diameter * per-round, quoted not executed)
    val propRounds = 25
    val (_, propSec) = Bench.time {
      DedupClusterQuery.connectedComponents(chain, maxRounds = propRounds)
        .collect()
    }
    val perRound = propSec / propRounds
    println(f"[scale10] chain10k propagation: $propSec%.1f s for " +
      f"$propRounds rounds ($perRound%.2f s/round; full convergence needs " +
      f"~${chainN - 1} rounds = ~${perRound * (chainN - 1) / 3600}%.1f h)")

    spark.stop()
  }
}
