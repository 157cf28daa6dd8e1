package graft.text

import graft.sketch.{MinHash, RollingHash, SimHash, XxHash64}

/**
 * Text-analysis kernels for large-scale training-data pipelines: language
 * identification (stopword/character-profile heuristic), quality scoring,
 * tokenization, and document fingerprinting. Pure JVM — exposed to Spark as
 * UDFs (row-level, no state) in [[graft.queries.TextQueries]].
 */
object TextAnalysis {

  /** Whitespace tokenizer (the corpus fixtures are single-space separated;
    * `\s+` keeps it robust to incidental newlines/tabs). */
  def tokenize(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.split("\\s+").filter(_.nonEmpty)

  /** BPE-ish surface tokenization: letter runs, digit runs, single symbols.
    * (A real BPE vocabulary is environment-external; this regex matches the
    * pre-tokenization split most BPE tokenizers use.) */
  private val BpeIsh = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
  def bpeIshTokens(text: String): Array[String] =
    if (text == null) Array.empty else BpeIsh.findAllIn(text).toArray

  // ---- language ID: tiny per-language stopword profiles (public common
  // stopword lists). Score = fraction of tokens that are stopwords of L;
  // argmax with deterministic tie-break by language code.

  val StopwordProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
      "on", "with", "as", "are", "was", "be", "this", "at", "by", "or"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den",
      "von", "mit", "auf", "für", "im", "nicht", "sich", "dem", "des"),
    "fr" -> Set("le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
      "en", "que", "qui", "dans", "pour", "pas", "sur", "au", "ce"),
    "es" -> Set("el", "la", "los", "las", "de", "y", "es", "un", "una", "del",
      "en", "que", "no", "por", "con", "para", "su", "al", "se")
  )

  /** Predicted language code, or "und" when no profile scores > 0. */
  def detectLanguage(text: String): String = {
    val toks = tokenize(text).map(_.toLowerCase)
    if (toks.isEmpty) return "und"
    val scored = StopwordProfiles.toSeq
      .map { case (lang, sw) => (lang, toks.count(sw.contains).toDouble / toks.length) }
      .sortBy { case (lang, score) => (-score, lang) }
    if (scored.head._2 > 0.0) scored.head._1 else "und"
  }

  /** Quality score in [0,1]: length saturation + lexical diversity +
    * alpha-token ratio, equal thirds. Formula is intentionally simple enough
    * to mirror exactly in the SQL oracle. */
  def qualityScore(text: String): Double = {
    val toks = tokenize(text)
    if (toks.isEmpty) return 0.0
    val lengthNorm = math.min(1.0, toks.length / 100.0)
    val diversity = toks.distinct.length.toDouble / toks.length
    val alphaRatio = toks.count(_.forall(_.isLetter)).toDouble / toks.length
    (lengthNorm + diversity + alphaRatio) / 3.0
  }

  /** Winnowing fingerprint set (see [[RollingHash.winnow]]); k-gram 8,
    * window 4 — the classic MOSS parameters scaled to short docs. */
  def fingerprints(text: String): Array[Long] =
    if (text == null || text.isEmpty) Array.empty
    else RollingHash.winnow(text, 8, 4)

  def simhash(text: String): Long = SimHash.simhash64(tokenize(text))

  def minhashSignature(text: String, k: Int): Array[Long] =
    MinHash.signature(tokenize(text).toSet, k)

  /** Word n-gram shingle set (the MinHash/Jaccard unit for near-dup
    * detection; n=3 mirrors the classic shingling setup). */
  def shingles(text: String, n: Int): Set[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Stable 64-bit content id (e.g. for exact dedup grouping). */
  def contentHash(text: String): Long = XxHash64.hashString(text, 0x1234abcdL)
}
