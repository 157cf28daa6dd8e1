package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis
import graft.sketch.{MinHash, SimHash}

/**
 * Training-data-pipeline operators over the `documents` table: exact and
 * near-duplicate detection, token/quality statistics, language ID and
 * fingerprinting. All built-in-function paths stay inside whole-stage
 * codegen; kernel UDFs appear only where the algorithm genuinely isn't
 * expressible (minhash/simhash/winnowing).
 *
 * Scale design: near-dup candidate generation never goes quadratic — MinHash
 * LSH explodes each doc into `bands` bucket keys and self-joins on the
 * bucket (shuffle on band hash; pairs only form within a bucket), and
 * SimHash joins on 16-bit blocks (pigeonhole: hamming ≤3 ⇒ some block
 * equal). Exact verification runs only on the candidate pairs.
 */
object TextQueries {

  /** q15: exact dedup census via content hash (sha2-256 of text). */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val grouped = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("c"))
    grouped.agg(
      sum(col("c")).as("n_docs"),
      count(lit(1)).as("distinct_texts"),
      sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_groups"),
      sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_rows"))
  }

  private val MinhashK = 128
  private val Bands = 32
  private val RowsPerBand = 4

  private val ShingleN = 3

  /** Docs with (id, text, minhash band hashes over 3-gram shingles) — q16. */
  private def minhashDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val sigUdf = udf((text: String) =>
      MinHash.bandHashes(
        MinHash.signature(TextAnalysis.shingles(text, ShingleN), MinhashK),
        Bands, RowsPerBand))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), sigUdf(col("text")).as("bands"))
  }

  /** q16: MinHash-LSH near-duplicate pairs, exact-Jaccard verified at τ=0.5
    * over word-trigram shingle sets. Candidates via band-bucket self-join
    * (the shuffle key is the band hash — no quadratic pair enumeration),
    * then the exact set-Jaccard filter. At b=32, r=4 a true τ≥0.9 near-dup
    * is missed with probability < 1e-14 — and this corpus's planted
    * near-dups all sit at J ≥ 0.9 with the next pair below 0.07. */
  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = minhashDocs(spark, sfDir)
    val buckets = docs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bh")))
    val a = buckets.select(col("band"), col("bh"), col("doc_id").as("id_a"))
    val b = buckets.select(col("band"), col("bh"), col("doc_id").as("id_b"))
    // dedup candidate pairs on narrow ids BEFORE rejoining texts: the
    // distinct shuffle moves 16 bytes/pair, not two documents/pair
    val candidateIds = a.select(col("band"), col("bh"), col("id_a"))
      .join(b.select(col("band"), col("bh"), col("id_b")), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val texts = docs.select(col("doc_id"), col("text"))
    val candidates = candidateIds
      .join(texts.select(col("doc_id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(texts.select(col("doc_id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
    val jaccardUdf = udf((ta: String, tb: String) =>
      MinHash.exactJaccard(
        TextAnalysis.shingles(ta, ShingleN), TextAnalysis.shingles(tb, ShingleN)))
    candidates
      .withColumn("jaccard_micro",
        floor(jaccardUdf(col("text_a"), col("text_b")) * 1000000.0).cast("long"))
      .filter(col("jaccard_micro") >= 500000L)
      .select(col("id_a"), col("id_b"), col("jaccard_micro"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q17: SimHash near-dup candidates at hamming ≤ 3, via 16-bit-block
    * pigeonhole join (hamming ≤3 over 4 blocks ⇒ at least one block equal).
    * Oracle-less (SimHash is not SQL-expressible); ScalaTest covers the
    * kernel, this exercises the distributed plan. */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    val shUdf = udf((text: String) => TextAnalysis.simhash(text))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), shUdf(col("text")).as("sh"))
    val blocks = docs.select(col("doc_id"), col("sh"),
      explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("blk_val", expr("(sh >> (blk * 16)) & 65535"))
    val a = blocks.select(col("blk"), col("blk_val"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = blocks.select(col("blk"), col("blk_val"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val distUdf = udf((x: Long, y: Long) => SimHash.hammingDistance(x, y))
    a.join(b, Seq("blk", "blk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), distUdf(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q18: exact word-bigram Jaccard similarity, blocked by `source` (the
    * corpus's natural bucketing column) — pairs only form inside a block,
    * expressible 1:1 in the DuckDB oracle. Emits pairs with J ≥ 0.05.
    * Bigram sets are compared as xxhash64 values: long-array intersection is
    * ~5x cheaper than string intersection per pair, and a hash collision
    * perturbing a set size has probability ~|set|²/2⁶⁴ per pair (verified
    * value-equal with the string-based oracle). */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        array_distinct(transform(
          zip_with(
            slice(split(col("text"), " "), lit(1), size(split(col("text"), " ")) - 1),
            slice(split(col("text"), " "), lit(2), size(split(col("text"), " ")) - 1),
            (x, y) => concat_ws(" ", x, y)),
          b => xxhash64(b))).as("bigrams"))
    val a = docs.select(col("source"), col("doc_id").as("id_a"), col("bigrams").as("bg_a"))
    val b = docs.select(col("source"), col("doc_id").as("id_b"), col("bigrams").as("bg_b"))
    a.join(b, Seq("source"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("bg_a"), col("bg_b"))))
      .withColumn("uni", size(col("bg_a")) + size(col("bg_b")) - col("inter"))
      .withColumn("jaccard_micro",
        floor(col("inter").cast("double") / col("uni").cast("double") * 1000000.0).cast("long"))
      .filter(col("jaccard_micro") >= 50000L)
      .select(col("id_a"), col("id_b"), col("jaccard_micro"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q19: per-language token statistics — pure built-ins, fully SQL-mirrored. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs
      .withColumn("tokens", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens").cast("long")).as("total_tokens"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        floor(avg(length(col("text")).cast("double")) * 1000000.0).cast("long")
          .as("avg_chars_micro"))
      .orderBy(col("lang"))
  }

  /** q20: BPE-ish regex token counts per language (regexp parity between
    * Spark's Java regex and DuckDB's RE2 holds for this pattern class). */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    docs
      .withColumn("n_bpeish",
        size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))))
      .withColumn("n_ws", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(sum(col("n_bpeish").cast("long")).as("bpeish_tokens"),
        sum(col("n_ws").cast("long")).as("ws_tokens"))
      .orderBy(col("lang"))
  }

  /** q21: quality-score histogram (formula mirrored exactly in SQL:
    * thirds of length-saturation, lexical diversity, alpha-token ratio). */
  def qualityHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val lengthNorm = least(lit(1.0), nTok / 100.0)
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val alphaRatio = size(filter(toks, t => t.rlike("^[A-Za-z]+$"))).cast("double") / nTok
    val score = (lengthNorm + diversity + alphaRatio) / 3.0
    docs
      .withColumn("bucket", floor(score * 10.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("bucket"))
  }

  /** q22: heuristic language-ID distribution (kernel UDF; oracle-less —
    * covered by TextAnalysisSpec against hand-labeled fixtures). */
  def langIdDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val langUdf = udf((text: String) => TextAnalysis.detectLanguage(text))
    Tables.documents(spark, sfDir)
      .groupBy(langUdf(col("text")).as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang_pred"))
  }

  /** q23: winnowing fingerprint census per document (oracle-less kernel op;
    * the shared-fingerprint join is the plagiarism/near-dup scale path). */
  def fingerprintCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val fpUdf = udf((text: String) => TextAnalysis.fingerprints(text))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), fpUdf(col("text")).as("fps"))
      .select(col("doc_id"), size(col("fps")).as("n_fingerprints"),
        array_min(col("fps")).as("min_fp"))
      .orderBy(col("doc_id"))
  }
}
