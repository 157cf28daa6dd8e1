package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q69 (exact-substring duplication-span census) on planted fixtures with
  * hand-computed coverage — one scenario per merge rule the
  * gaps-and-islands reconstruction must honor — plus schema and
  * cross-scale sanity on the driver corpus.
  *
  * Scenarios (sources):
  *  - `src_a`: cross-doc shared 8-gram → one [1,8] span in each doc.
  *  - `src_b`: a <8-token doc (no grams, coverage 0) and a WITHIN-doc
  *    repeat (the 16-token doc "w1..w8 w1..w8": grams at pos 1 and 9 are
  *    the same string, occ=2 → both duplicated; ADJACENT intervals [1,8]
  *    and [9,16] merge into one fully-covering span).
  *  - `src_c`: two spans separated by a gap stay two islands (covered
  *    16 of 19/20), plus an all-unique doc (coverage 0).
  *  - `src_d`: OVERLAPPING duplicated intervals [1,8] and [3,10] in one
  *    doc must merge to [1,10] = 10 covered tokens, not 16 — the
  *    non-double-counting rule.
  */
class DupSpanSpec extends SparkTestBase {

  private def fixture(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dupspan-fx").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q69: census matches hand-computed coverage on all four merge scenarios") {
    val dir = fixture(Seq(
      (1L, "a b c d e f g h x y z", "src_a"),
      (2L, "a b c d e f g h q r s", "src_a"),
      (3L, "short doc", "src_b"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8", "src_b"),
      (5L, "g1 g2 g3 g4 g5 g6 g7 g8 u1 u2 u3 h1 h2 h3 h4 h5 h6 h7 h8", "src_c"),
      (6L, "g1 g2 g3 g4 g5 g6 g7 g8 v1 v2 v3 v4 h1 h2 h3 h4 h5 h6 h7 h8", "src_c"),
      (7L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", "src_c"),
      (8L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", "src_d"),
      (9L, "a1 a2 a3 a4 a5 a6 a7 a8 q9 q10", "src_d"),
      (10L, "p1 p2 a3 a4 a5 a6 a7 a8 a9 a10", "src_d")))
    val out = TextQueries.dupSpanCensus(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    spark.catalog.clearCache()
    // (n_docs, heavy_docs, total_tokens, covered_tokens)
    assert(out("src_a") === ((2L, 2L, 22L, 16L)))
    assert(out("src_b") === ((2L, 1L, 18L, 16L)))
    assert(out("src_c") === ((3L, 2L, 49L, 32L)))
    // overlap: doc 8 covers [1,10] merged = 10, docs 9/10 cover 8 each
    assert(out("src_d") === ((3L, 3L, 30L, 26L)))
  }

  test("q70: cut census matches hand-computed cleaned text on all four scenarios") {
    val dir = fixture(Seq(
      (1L, "a b c d e f g h x y z", "src_a"),
      (2L, "a b c d e f g h q r s", "src_a"),
      (3L, "short doc", "src_b"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8", "src_b"),
      (5L, "g1 g2 g3 g4 g5 g6 g7 g8 u1 u2 u3 h1 h2 h3 h4 h5 h6 h7 h8", "src_c"),
      (6L, "g1 g2 g3 g4 g5 g6 g7 g8 v1 v2 v3 v4 h1 h2 h3 h4 h5 h6 h7 h8", "src_c"),
      (7L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10", "src_c"),
      (8L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10", "src_d"),
      (9L, "a1 a2 a3 a4 a5 a6 a7 a8 q9 q10", "src_d"),
      (10L, "p1 p2 a3 a4 a5 a6 a7 a8 a9 a10", "src_d")))
    val out = TextQueries.dupSpanCut(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    spark.catalog.clearCache()
    // (n_docs, docs_modified, tokens_after, chars_after, distinct_cleaned)
    // src_a: "x y z" + "q r s" survive (5 chars each)
    assert(out("src_a") === ((2L, 2L, 6L, 10L, 2L)))
    // src_b: "short doc" untouched (9 chars); doc 4 fully cut → ""
    assert(out("src_b") === ((2L, 1L, 2L, 9L, 2L)))
    // src_c: "u1 u2 u3" (8) + "v1 v2 v3 v4" (11) + full doc 7 (30 chars)
    assert(out("src_c") === ((3L, 2L, 17L, 49L, 3L)))
    // src_d: overlap-merged doc 8 fully cut → ""; "q9 q10" (6) + "p1 p2" (5)
    assert(out("src_d") === ((3L, 3L, 4L, 11L, 3L)))
  }

  test("q70 is consistent with q69: tokens_after = total - covered, per source") {
    val census = TextQueries.dupSpanCensus(spark, sf("sf0.001")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    val cut = TextQueries.dupSpanCut(spark, sf("sf0.001")).collect()
    spark.catalog.clearCache()
    assert(cut.length === census.size)
    cut.foreach { r =>
      val (nDocs, total, covered) = census(r.getString(0))
      assert(r.getLong(1) === nDocs)
      assert(r.getLong(3) === total - covered,
        s"cut/census disagree on ${r.getString(0)}: $r vs ($total,$covered)")
      assert(r.getLong(5) <= nDocs)
    }
  }

  test("q69: schema and cross-scale sanity on the driver corpus") {
    val df = TextQueries.dupSpanCensus(spark, sf("sf0.001"))
    assert(df.columns.toSeq === Seq("source", "n_docs", "heavy_docs",
      "total_tokens", "covered_tokens"))
    val rows = df.collect()
    spark.catalog.clearCache()
    assert(rows.length === 20) // all 20 source blocks present
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3),
        s"coverage cannot exceed tokens: $r")
      assert(r.getLong(2) <= r.getLong(1))
    }
    // the corpus plants a near-dup for every doc_id % 500 == 1 (TESTDATA
    // family) and draws from a ~31-word zipf vocabulary, so duplicated
    // 8-gram mass must exist somewhere
    assert(rows.map(_.getLong(4)).sum > 0L, "no duplicated spans found")
  }
}
