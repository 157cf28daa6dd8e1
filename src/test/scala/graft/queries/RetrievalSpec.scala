package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q83 (BM25 ranked retrieval) on a hand-built fixture where every score
  * is computable by exact integer arithmetic, plus gate-scale sanity.
  *
  * Fixture geometry: 12 docs × 24 tokens each (so dl = avgdl for every
  * doc and the BM25 length normalization is exactly 1 at tf = 1 —
  * term_score = idf_micro precisely). 16 stopwords appear in every doc
  * (df = 12, occupying selection ranks 1–16); the 8 query terms t17–t24
  * carry strictly decreasing dfs 9, 8, …, 2; per-doc fillers have df = 1
  * (ranks > 24). doc2 carries t17 TWICE (its filler slot), pinning the tf
  * leg of the formula: its Q0 score must beat the tf = 1 docs. */
class RetrievalSpec extends SparkTestBase {

  private val stops = (0 until 16).map(i => s"s${('a' + i).toChar}")
  private val terms = (17 to 24).map(i => s"t$i") // df 9, 8, ..., 2

  /** doc d contains t(17+j) iff d < df_j where df_j = 9 − j. */
  private def payload(d: Int): Seq[String] = {
    val present = terms.zipWithIndex.collect {
      case (t, j) if d < 9 - j => t
    }
    // doc2: duplicate t17 in the first filler slot (tf = 2, dl unchanged)
    val extra = if (d == 2) Seq("t17") else Seq.empty
    val fillers = Seq.tabulate(8 - present.size - extra.size)(j => s"u${d}x$j")
    present ++ extra ++ fillers
  }

  private lazy val fxDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-fx").toString
    import spark.implicits._
    (0 until 12).map { d =>
      (d.toLong, (stops ++ payload(d)).mkString(" "), "fx")
    }.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def idf(df: Long): Long = TextQueries.bm25IdfMicro(df, 12L)

  /** The operator's per-term score in exact integer arithmetic. */
  private def ts(df: Long, tf: Long, dl: Long, avm: Long): Long =
    idf(df) * 22L * tf * avm / (10L * avm * tf + 3L * avm + 9000L * dl)

  test("q83 model: selection window is exactly t17–t24 with their dfs") {
    val (sel, n, avm) = TextQueries.bm25Model(spark, fxDir)
    assert(n === 12L)
    assert(avm === 24000L) // 288 tokens · 1000 / 12 docs
    assert(sel.map(_._1) === terms)
    assert(sel.map(_._2) === Seq(9L, 8L, 7L, 6L, 5L, 4L, 3L, 2L))
    assert(sel.map(_._3) === sel.map(s => idf(s._2)))
    spark.catalog.clearCache()
  }

  test("q83 fixture: every rank and score matches hand integer arithmetic") {
    val got = TextQueries.bm25Search(spark, fxDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val avm = 24000L
    // at dl = avgdl and tf = 1 the normalization is exactly 1:
    assert(ts(9, 1, 24, avm) === idf(9))
    val tfBoost = ts(9, 2, 24, avm) // doc2's duplicated t17
    assert(tfBoost > idf(9), "tf = 2 must outscore tf = 1")
    val expected = Seq(
      // Q0 (t17 df9, t18 df8): doc2's tf-boosted t17 wins; then doc order
      (0L, 1L, 2L, tfBoost + idf(8)),
      (0L, 2L, 0L, idf(9) + idf(8)),
      (0L, 3L, 1L, idf(9) + idf(8)),
      (0L, 4L, 3L, idf(9) + idf(8)),
      (0L, 5L, 4L, idf(9) + idf(8)),
      // Q1 (t19 df7, t20 df6): docs 0–5 carry both; top-5 by doc_id
      (1L, 1L, 0L, idf(7) + idf(6)),
      (1L, 2L, 1L, idf(7) + idf(6)),
      (1L, 3L, 2L, idf(7) + idf(6)),
      (1L, 4L, 3L, idf(7) + idf(6)),
      (1L, 5L, 4L, idf(7) + idf(6)),
      // Q2 (t21 df5, t22 df4): docs 0–3 carry both; doc4 has t21 only
      (2L, 1L, 0L, idf(5) + idf(4)),
      (2L, 2L, 1L, idf(5) + idf(4)),
      (2L, 3L, 2L, idf(5) + idf(4)),
      (2L, 4L, 3L, idf(5) + idf(4)),
      (2L, 5L, 4L, idf(5)),
      // Q3 (t23 df3, t24 df2): only 3 docs match at all — the inverted
      // index never pads with zero-score rows
      (3L, 1L, 0L, idf(3) + idf(2)),
      (3L, 2L, 1L, idf(3) + idf(2)),
      (3L, 3L, 2L, idf(3)))
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q83 gate scale: 4 queries × top-5, scores ranked, terms present") {
    val rows = graft.SparkEntry.queries("q83_bm25_topk")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 20)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L))
    for ((_, rs) <- byQ) {
      assert(rs.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      val ordered = rs.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
      assert(ordered === ordered.sorted.reverse, s"scores not ranked: $ordered")
      assert(ordered.forall(_ > 0L))
    }
    spark.catalog.clearCache()
  }
}
