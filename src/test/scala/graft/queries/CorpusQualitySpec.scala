package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** q65 (unigram-LM quality filter) and q66 (n-gram novelty census) on
  * planted fixtures where the right answer is hand-computable, plus
  * cross-scale sanity on the driver corpus. */
class CorpusQualitySpec extends SparkTestBase {

  /** Write a documents.parquet fixture; returns its sfDir. */
  private def fixture(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-docs-fx").toString
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q65: the OOV-gibberish doc is the flagged one") {
    // 19 docs drawn from a 4-word common vocabulary + 1 doc of words the
    // LM never promotes to vocab — its every token pays the OOV floor
    // (-ln(1/N) ≈ ln(396) ≈ 6.0 nats vs ≈1.4 for the common words), so it
    // alone clears mean + 1.1 nats.
    val common = (0L until 19L).map { i =>
      (i, Seq.tabulate(20)(j => Seq("alpha", "beta", "gamma", "delta")(((i + j) % 4).toInt)).mkString(" "), "clean")
    }
    val gibberish = Seq((99L,
      Seq.tabulate(16)(j => s"zx$j").mkString(" "), "noisy"))
    val dir = fixture(common ++ gibberish)
    val out = TextQueries.lmQualityFilter(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(out("clean") === ((19L, 0L)))
    assert(out("noisy") === ((1L, 1L)))
  }

  test("q65: score is a per-token average, invariant to doc length") {
    // two docs with identical token MIX but 2x length must score equal →
    // equal flag outcome and per-source totals proportional to doc count
    val base = "alpha beta gamma delta alpha beta gamma delta"
    val dir = fixture(Seq(
      (1L, base, "s1"), (2L, base + " " + base, "s2")))
    val rows = TextQueries.lmQualityFilter(spark, dir).collect()
    val bySource = rows.map(r => r.getString(0) -> r.getLong(3)).toMap
    // equal average score ⇒ equal total_score_micro per single-doc source
    assert(bySource("s1") === bySource("s2"))
  }

  test("q65: null-text docs are excluded from the census on both sides") {
    // the oracle's unnest drops null-text docs implicitly; the Spark side
    // must exclude them explicitly or n_docs and the mean diverge
    val dir = fixture(Seq(
      (1L, "alpha beta alpha beta", "s1"),
      (2L, null.asInstanceOf[String], "s1"),
      (3L, "alpha beta alpha beta", "s2")))
    val out = TextQueries.lmQualityFilter(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("s1" -> 1L, "s2" -> 1L)) // the null row is not counted
  }

  test("q66: planted duplicate pair vs unique doc") {
    // 10-token docs → 3 distinct 8-grams each. a/b identical → all their
    // 8-grams have df=2 (novel=0, dupish). c unique → novel=3, not dupish.
    val ta = (1 to 10).map(i => s"w$i").mkString(" ")
    val tc = (1 to 10).map(i => s"u$i").mkString(" ")
    val dir = fixture(Seq((1L, ta, "dup"), (2L, ta, "dup"), (3L, tc, "uniq")))
    val out = TextQueries.ngramNovelty(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("dup") === ((2L, 2L, 6L, 0L)))
    assert(out("uniq") === ((1L, 0L, 3L, 3L)))
  }

  test("q66: sub-8-token docs drop out; novelty bounded by totals") {
    val dir = fixture(Seq(
      (1L, "a b c", "short"),
      (2L, (1 to 12).map(i => s"v$i").mkString(" "), "long")))
    val rows = TextQueries.ngramNovelty(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("long"))
    val r = rows.head
    assert(r.getLong(3) === 5L && r.getLong(4) === 5L) // 12 tokens → 5 8-grams, all novel
  }

  test("q67: piiRedact masks planted email+phone, leaves clean text alone") {
    import spark.implicits._
    val rows = Seq(
      "reach me at jane.doe+spam@sub.example.org today",
      "call 555-0142 before noon",
      "plain word soup with no pii at all",
      "both a@b.io and 555-9999 here").toDF("text")
      .select(col("text"), TextQueries.piiRedact(col("text")).as("r"))
      .select(col("r.redacted"), col("r.emails"), col("r.phones")).collect()
    assert(rows(0).getString(0) === "reach me at <EMAIL> today")
    assert((rows(0).getLong(1), rows(0).getLong(2)) === ((1L, 0L)))
    assert(rows(1).getString(0) === "call <PHONE> before noon")
    assert((rows(1).getLong(1), rows(1).getLong(2)) === ((0L, 1L)))
    assert(rows(2).getString(0) === "plain word soup with no pii at all")
    assert((rows(2).getLong(1), rows(2).getLong(2)) === ((0L, 0L)))
    assert(rows(3).getString(0) === "both <EMAIL> and <PHONE> here")
    // idempotent: redacting redacted text changes nothing
    val again = Seq(rows(3).getString(0)).toDF("text")
      .select(TextQueries.piiRedact(col("text")).as("r"))
      .select(col("r.redacted"), col("r.emails") + col("r.phones")).head()
    assert(again.getString(0) === rows(3).getString(0) && again.getLong(1) === 0L)
  }

  test("q67: counts equal performed replacements when PII classes interact") {
    import spark.implicits._
    val rows = Seq(
      "ping 555-0142@example.com now", // phone digits consumed by email mask
      "see a@b.cc555-0142",            // phone boundary exists only post-mask
      "short a@b.io mail").toDF("text")
      .select(TextQueries.piiRedact(col("text")).as("r"))
      .select(col("r.redacted"), col("r.emails"), col("r.phones"),
        col("r.chars_removed")).collect()
    assert(rows(0).getString(0) === "ping <EMAIL> now")
    assert((rows(0).getLong(1), rows(0).getLong(2)) === ((1L, 0L)))
    assert(rows(1).getString(0) === "see <EMAIL><PHONE>")
    assert((rows(1).getLong(1), rows(1).getLong(2)) === ((1L, 1L)))
    assert(rows(1).getLong(3) === 14L) // |a@b.cc| + |555-0142| matched chars
    // matched-chars stays non-negative when the match is shorter than its
    // 7-char mask: "a@b.io" removed 6 chars though the text got LONGER
    assert(rows(2).getLong(3) === 6L)
  }

  test("q67: masks stay inert beside leftover text; \\b blocks digit runs") {
    import spark.implicits._
    // "a@b.cc@d.ee": the email pass consumes "a@b.cc"; the leftover
    // "@d.ee" must not combine with the mask into a new email — '>' sits
    // outside the local-part class, so "<EMAIL>@d.ee" cannot re-match.
    // "555-0142555-9999": neither 8-digit run has the \b the phone
    // pattern requires on both sides — zero matches, text unchanged.
    val rows = Seq("a@b.cc@d.ee", "555-0142555-9999").toDF("text")
      .select(TextQueries.piiRedact(col("text")).as("r"))
      .select(col("r.redacted"), col("r.emails") + col("r.phones")).collect()
    assert(rows(0).getString(0) === "<EMAIL>@d.ee")
    assert(rows(0).getLong(1) === 1L)
    assert(rows(1).getString(0) === "555-0142555-9999")
    assert(rows(1).getLong(1) === 0L)
    // and the leftover-adjacent result is a fixpoint: re-redaction finds 0
    val again = Seq(rows(0).getString(0)).toDF("text")
      .select(TextQueries.piiRedact(col("text")).as("r"))
      .select(col("r.redacted"), col("r.emails") + col("r.phones")).head()
    assert(again.getString(0) === rows(0).getString(0) && again.getLong(1) === 0L)
  }

  test("q67 census: planted counts match the doc_id arithmetic, residual 0") {
    val out = SparkEntry.queries("q67_pii_census")(spark, sf("sf0.001"))
      .agg(sum("n_docs"), sum("emails_redacted"), sum("phones_redacted"),
        sum("residual_matches")).head()
    val ids = Tables.documents(spark, sf("sf0.001"))
      .agg(count(lit(1)),
        sum(when(col("doc_id") % 3 === 0, 1L).otherwise(0L)),
        sum(when(col("doc_id") % 5 === 0, 1L).otherwise(0L))).head()
    assert(out.getLong(0) === ids.getLong(0))
    assert(out.getLong(1) === ids.getLong(1)) // one email per mod-3 doc
    assert(out.getLong(2) === ids.getLong(2)) // one phone per mod-5 doc
    assert(out.getLong(3) === 0L)             // nothing survives redaction
  }

  test("q65/q66 on the driver corpus: verdict columns in range") {
    for (s <- Seq("sf0.001", "sf0.01")) {
      val lm = SparkEntry.queries("q65_lm_quality")(spark, sf(s))
        .agg(sum("n_docs"), sum("flagged_docs")).head()
      assert(lm.getLong(1) > 0L, s"$s: no docs flagged")
      assert(lm.getLong(1) * 10 < lm.getLong(0), s"$s: flag is not a tail")
      val nv = SparkEntry.queries("q66_ngram_novelty")(spark, sf(s))
        .agg(sum("n_docs"), sum("dupish_docs"), sum("total_shingles"),
          sum("novel_shingles")).head()
      assert(nv.getLong(1) > 0L, s"$s: planted near-dups not seen")
      assert(nv.getLong(1) * 2 < nv.getLong(0), s"$s: dupish not a minority")
      assert(nv.getLong(3) <= nv.getLong(2))
      spark.catalog.clearCache()
    }
  }
}
