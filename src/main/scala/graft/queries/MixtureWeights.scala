package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * q76: temperature-scaled source mixture weights — the standard α-sampling
 * rule for multi-source/multilingual pretraining (p_s ∝ n_s^α with α < 1,
 * Conneau & Lample 2019 α=0.5; mBERT/XLM-R use the same family): small
 * sources are upsampled relative to proportional sampling so the mixture
 * is not dominated by the largest source. q50 SCHEDULES a mixture given
 * weights; this operator derives the weights themselves from corpus
 * statistics, plus the sampler's effective-epochs diagnostic (passes over
 * each source at a fixed token budget) and the upsampled flag.
 *
 * Plan shape: ONE shuffle (the per-source census aggregate over the
 * corpus — the only O(n) stage), then a broadcast join of the ≤S-row
 * (n_tokens → α-term) literal lookup and a 1-row broadcast of the totals;
 * all downstream arithmetic is integral. S = source count is bounded
 * metadata (the q62-topology / q74-vocab discipline), so the driver-side
 * lookup build is O(S), not O(corpus).
 *
 * Cross-engine exactness (the q65/q74 injection contract): n^α is
 * transcendental, so the driver computes `term = floor(n^α · 1000)` ONCE
 * (one libm call site) and injects the (n_tokens → term) pairs into both
 * the Spark plan (literal broadcast frame) and the DuckDB oracle (VALUES
 * joined on the oracle's OWN independently-derived token counts — a wrong
 * Spark-side count still breaks the join and fails the gate). Every
 * derived column is then integer arithmetic: `div`, never float division
 * (float floor drifts past ~2⁵³; the epochs product reaches ~10¹⁶ at a
 * 10⁹-token corpus and stays exact as a long).
 */
object MixtureWeights {

  /** α = 0.5 — temperature T = 2 in the p^(1/T) formulation. */
  private[graft] val Alpha = 0.5

  /** Token budget = 10 × total corpus tokens: a proportional sampler does
    * exactly 10 passes over every source, so `epochs_milli > 10000` is
    * precisely "upsampled vs proportional". */
  private[graft] val BudgetEpochs = 10L

  /** Whitespace token count per doc — the q20 `ws_tokens` / q65 `len(t)`
    * convention, mirrored 1:1 by `len(string_split(text, ' '))`. */
  private def tokenCount = size(split(col("text"), " ")).cast("long")

  private def perSource(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("source"), tokenCount.as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  /** Driver-side (n_tokens → floor(n_tokens^α · 1000)) pairs — the ONE
    * libm call site both engines consume as literals. Deduped on count so
    * equal-sized sources share a row (the q65 lookup shape). */
  private[graft] def alphaTermLookup(spark: SparkSession,
      sfDir: String): Seq[(Long, Long)] =
    alphaTerms(perSource(spark, sfDir))

  private def alphaTerms(per: DataFrame): Seq[(Long, Long)] =
    per.select(col("n_tokens"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
      .map(n => n -> math.floor(math.pow(n.toDouble, Alpha) * 1000.0).toLong)

  /** q76: per-source α-mixture census. Columns:
    *  - weight_micro   floor-div sampling weight, Σ ≈ 10⁶
    *  - epochs_milli   passes over the source at budget = 10 × total tokens
    *  - upsampled      epochs exceed the proportional sampler's 10 passes
    */
  def mixtureWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // persisted: the ≤S-row census feeds BOTH the totals branch and the
    // output join — without it the corpus scan + aggregate runs twice
    // (the multi-consumer discipline; the frame itself is tiny)
    val per = perSource(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val terms = alphaTerms(per).toDF("n_tokens", "term")
    val totals = per.join(broadcast(terms), "n_tokens")
      .agg(sum(col("term")).as("total_term"),
        sum(col("n_tokens")).as("total_tokens"))
    per.join(broadcast(terms), "n_tokens")
      .crossJoin(broadcast(totals))
      .withColumn("weight_micro", expr("(term * 1000000L) div total_term"))
      // exact while weight_micro(≤10⁶)·total_tokens·10 < 2⁶³ — i.e. up to
      // ~9·10¹¹ total tokens; past that, drop the micro scale a decade
      .withColumn("epochs_milli", expr(
        s"(weight_micro * total_tokens * ${BudgetEpochs}L) div (n_tokens * 1000L)"))
      .withColumn("upsampled", col("epochs_milli") > BudgetEpochs * 1000L)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight_micro"), col("epochs_milli"), col("upsampled"))
      .orderBy(col("source"))
  }
}
