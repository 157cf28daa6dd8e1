package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q88 (content-defined chunking dedup): a JVM reference chunker pinned
  * against the Spark HOF pass, the shift-invariance property that is CDC's
  * whole point, reconstruction/determinism contracts, and a planted
  * cross-document duplicate fixture. */
class CdcSpec extends SparkTestBase {

  import spark.implicits._

  private def fold(w: String): Long =
    w.foldLeft(0L)((h, c) => (h * 131 + c.toLong) % 4093)

  /** JVM reference: cut after position i (1-based, i ≥ 8) iff the fold of
    * the trailing 8-char window ≡ 0 (mod 16). */
  private def refChunks(s: String): Seq[String] = {
    val n = s.length
    val bs = if (n >= TextQueries.CdcWindow)
      (TextQueries.CdcWindow to n).filter(i =>
        fold(s.substring(i - TextQueries.CdcWindow, i)) % TextQueries.CdcDiv == 0)
    else Seq.empty[Int]
    val cuts = 0 +: bs :+ n
    val dedup = if (bs.nonEmpty && bs.last == n) (0 +: bs) else cuts
    dedup.sliding(2).map { case Seq(a, b) => s.substring(a, b) }.toSeq
  }

  test("q88: Spark chunk rows equal the JVM reference at sf0.001") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val expected = docs.as[(Long, String)].collect()
      .flatMap { case (id, s) => refChunks(s).map((id, _)) }
      .sorted.toSeq
    val got = TextQueries.cdcChunkRows(docs)
      .as[(Long, String)].collect().sorted.toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q88: chunks reconstruct the text and are never empty") {
    val dir = sf("sf0.001")
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull).select(col("doc_id"), col("text"))
    val texts = docs.as[(Long, String)].collect().toMap
    val grouped = TextQueries.cdcChunkRows(docs).as[(Long, String)]
      .collect().groupBy(_._1)
    for ((id, chs) <- grouped) {
      assert(chs.forall(_._2.nonEmpty), s"empty chunk in doc $id")
      assert(chs.map(_._2).mkString === texts(id), s"doc $id does not reconstruct")
    }
    assert(grouped.keySet === texts.keySet)
    spark.catalog.clearCache()
  }

  test("q88: boundaries are shift-invariant — an inserted prefix leaves the tail chunks identical") {
    val base = "the quick scan filter join hash merge row batch column order " * 4
    val shifted = "zz" + base
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val got = TextQueries.cdcChunkRows(docs).as[(Long, String)].collect()
    val a = got.filter(_._1 == 1L).map(_._2).toSeq
    val b = got.filter(_._1 == 2L).map(_._2).toSeq
    // same boundary rule on the JVM reference
    assert(a === refChunks(base))
    assert(b === refChunks(shifted))
    // every window not overlapping the 2-char prefix hashes identically,
    // so cuts ≥ 10 in the shifted doc are exactly the original's cuts + 2
    // and the chunk sequences agree from the first such cut on: only the
    // leading chunk(s) before it may differ
    val trailingEqual = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    assert(trailingEqual >= a.size - 2,
      s"expected all but the leading chunks shared: $trailingEqual of ${a.size}\n$a\n$b")
    spark.catalog.clearCache()
  }

  test("q88: planted cross-doc duplication is caught at chunk level despite different prefixes") {
    val shared = "select sum from lineitem where ship date between order key " * 3
    val docs = Seq(
      (1L, "alpha " + shared),
      (2L, "a completely different and much longer beginning " + shared),
      (3L, "unrelated text that shares nothing with the others at all zz")
    ).toDF("doc_id", "text")
    val out = TextQueries.cdcChunkRows(docs)
      .groupBy(md5(col("ch")).as("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).count()
    assert(out >= 2, s"expected ≥2 shared chunks, got $out")
    spark.catalog.clearCache()
  }

  test("q88: gate census is deterministic and internally consistent") {
    val dir = sf("sf0.001")
    val a = TextQueries.cdcChunkDedup(spark, dir).collect()(0)
    val b = TextQueries.cdcChunkDedup(spark, dir).collect()(0)
    assert(a.toSeq === b.toSeq)
    assert(a.getAs[Long]("total_chunks") >= a.getAs[Long]("distinct_chunks"))
    assert(a.getAs[Long]("distinct_chunks") >= a.getAs[Long]("cross_doc_chunks"))
    assert(a.getAs[Long]("cross_doc_chunks") > 0L, "template corpus must share chunks")
    assert(a.getAs[Long]("n_docs") === 500L)
    spark.catalog.clearCache()
  }
}
