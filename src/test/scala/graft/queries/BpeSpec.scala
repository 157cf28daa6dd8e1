package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q87 (BPE merge learning): a pure-JVM reference model of the Sennrich
  * merge loop, a hand fixture pinning the overlap semantics (census counts
  * EVERY adjacent occurrence; application merges leftmost non-overlapping),
  * and the gate contracts at sf0.001. */
class BpeSpec extends SparkTestBase {

  import spark.implicits._

  /** Reference BPE: identical census / tie-break / greedy-apply rules,
    * driver-side. Java's String.replace scans leftmost non-overlapping —
    * the same contract as both engines' SQL replace. */
  private def refBpe(vocab: Seq[(String, Long)], rounds: Int): Seq[(Long, String, String, Long)] = {
    var enc = vocab.map { case (w, c) => (w.toCharArray.map("_" + _).mkString(" "), c) }
    (1 to rounds).map { r =>
      val census = scala.collection.mutable.Map.empty[String, Long]
      for ((e, c) <- enc) {
        val s = e.split(' ')
        for (i <- 0 until s.length - 1) {
          val pr = s(i) + " " + s(i + 1)
          census(pr) = census.getOrElse(pr, 0L) + c
        }
      }
      val (pr, pc) = census.toSeq.minBy { case (p, n) => (-n, p) }
      val merged = pr.replace(" _", "")
      enc = enc.map { case (e, c) => (e.replace(pr, merged), c) }
      (r.toLong, pr, merged.replace("_", ""), pc)
    }
  }

  private def encFrame(vocab: Seq[(String, Long)]) =
    vocab.toDF("w", "c")
      .select(expr("trim(regexp_replace(w, '(.)', '_$1 '))").as("e"), col("c"))

  test("q87: overlap fixture — census counts both (a,a) in 'aaa', apply merges leftmost only") {
    // round 1: (_a _a) = 2·3 = 6 beats (_a _b) = 5; 'aaa' → '_aa _a'
    // round 2: (_a _b) = 5 beats (_aa _a) = 3
    val got = TextQueries.bpeMergesOn(
      encFrame(Seq(("aaa", 3L), ("ab", 5L), ("a", 2L))), rounds = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "_a _a", "aa", 6L),
      (2L, "_a _b", "ab", 5L)))
  }

  test("q87: tie-break picks the lexicographically smallest pair") {
    // both pairs occur once with weight 1 → '_x _a' < '_x _b'
    val got = TextQueries.bpeMergesOn(
      encFrame(Seq(("xb", 1L), ("xa", 1L))), rounds = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq((1L, "_x _a", "xa", 1L)))
  }

  test("q87: merged symbols participate in later rounds (multi-char growth)") {
    // 'abab' ×4: r1 (_a _b)=8 → '_ab _ab'; r2 (_ab _ab)=4 → '_abab'
    val got = TextQueries.bpeMergesOn(
      encFrame(Seq(("abab", 4L), ("cd", 3L))), rounds = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "_a _b", "ab", 8L),
      (2L, "_ab _ab", "abab", 4L)))
  }

  test("q87: gate output equals the JVM reference model at sf0.001") {
    val dir = sf("sf0.001")
    val vocab = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toSeq
    val expected = refBpe(vocab, TextQueries.BpeMergeRounds)
    val got = TextQueries.bpeMerges(spark, dir)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q87: more rounds than remaining pairs fails loudly, not with an index error") {
    val e = intercept[IllegalArgumentException] {
      TextQueries.bpeMergesOn(encFrame(Seq(("ab", 1L))), rounds = 2)
    }
    assert(e.getMessage.contains("fully merged"), e.getMessage)
  }

  test("q89: tokenize equals a driver-side apply of the learned merges at sf0.001") {
    val dir = sf("sf0.001")
    val vocab = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toSeq
    val merges = refBpe(vocab, TextQueries.BpeMergeRounds)
    var enc = vocab.map { case (w, _) =>
      (w, w.toCharArray.map("_" + _).mkString(" ")) }.toMap
    for ((_, pr, _, _) <- merges)
      enc = enc.map { case (w, e) => (w, e.replace(pr, pr.replace(" _", ""))) }
    val sym = enc.map { case (w, e) => (w, e.split(' ').length.toLong) }
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    val expected = docs.map { case (id, t) =>
      val ws = t.split(' ').filter(_.nonEmpty)
      val nTok = ws.map(sym).sum
      val nCh = ws.map(_.length.toLong).sum
      (id, ws.length.toLong, nTok, nCh, nCh * 1000L / nTok)
    }.sortBy(_._1).take(20).toSeq
    val got = TextQueries.bpeTokenize(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q89: census invariants — one symbol per word minimum, one char per symbol minimum") {
    val rows = TextQueries.bpeTokenize(spark, sf("sf0.001")).collect()
    assert(rows.length === 20)
    for (r <- rows) {
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("n_tok_bpe"))
      assert(r.getAs[Long]("n_tok_bpe") <= r.getAs[Long]("n_word_chars"))
      assert(r.getAs[Long]("chars_per_tok_milli") >= 1000L)
    }
    spark.catalog.clearCache()
  }

  test("q87: deterministic, 6 rounds, top counts non-increasing") {
    val dir = sf("sf0.001")
    val a = TextQueries.bpeMerges(spark, dir).collect()
    val b = TextQueries.bpeMerges(spark, dir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getAs[Long]("rnd")).toSeq === (1L to 6L))
    // any pair formed by a merge occurs at most as often as the merge it
    // came from, so the chosen counts can never increase across rounds
    val cs = a.map(_.getAs[Long]("pair_count")).toSeq
    assert(cs === cs.sorted.reverse, cs)
    // every new_symbol is the pair's concatenation without markers
    for (r <- a) {
      val pr = r.getAs[String]("pair")
      assert(r.getAs[String]("new_symbol") === pr.replace(" _", "").replace("_", ""))
    }
    spark.catalog.clearCache()
  }
}
