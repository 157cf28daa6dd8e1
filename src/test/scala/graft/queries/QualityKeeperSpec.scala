package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q84 (canonical survivor selection): keep-best-copy semantics on planted
  * fixtures where the right keeper is hand-derivable, plus the gate-scale
  * planted-twin contract at sf0.001. */
class QualityKeeperSpec extends SparkTestBase {

  import spark.implicits._

  /** A 40-token all-distinct all-alpha base text (38 distinct trigram
    * shingles, so an appended-token twin keeps J ≈ 0.83–0.86 ≫ τ): the
    * twin's quality lift comes through the length-saturation third of the
    * q21 score (40 → 44/46 tokens, diversity and alpha ratio pinned at 1). */
  private def baseText(seed: String): String =
    Seq.tabulate(40)(i =>
      s"$seed${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("q84: higher-quality near-dup wins over the lower doc_id") {
    // doc 20 = doc 10 + 6 distinct alpha tokens: J ≈ 38/(38+8) ≈ 0.83 ≥ τ,
    // diversity strictly higher → keeper must be 20, not min-id 10
    val a = baseText("qa")
    val b = a + " qxnorth qxsouth qxeast qxwest qxup qxdown"
    val out = DedupClusterQuery.qualityKeepersOver(
      docsDf(Seq((10L, a), (20L, b)))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("cluster_id") === 10L)
    assert(r.getAs[Long]("n_members") === 2L)
    assert(r.getAs[Long]("keeper_doc_id") === 20L)
    assert(r.getAs[Long]("dropped") === 1L)
    assert(r.getAs[Boolean]("keeper_is_min_id") === false)
    spark.catalog.clearCache()
  }

  test("q84: equal quality falls back to the lowest doc_id") {
    val t = baseText("qb")
    val out = DedupClusterQuery.qualityKeepersOver(
      docsDf(Seq((7L, t), (3L, t), (5L, t)))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("cluster_id") === 3L)
    assert(r.getAs[Long]("n_members") === 3L)
    assert(r.getAs[Long]("keeper_doc_id") === 3L)
    assert(r.getAs[Long]("dropped") === 2L)
    assert(r.getAs[Boolean]("keeper_is_min_id") === true)
    spark.catalog.clearCache()
  }

  test("q84: keeper quality matches the q21 formula in milli") {
    val a = baseText("qc")
    val b = a + " qxalpha qxbeta qxgamma qxdelta qxepsilon qxzeta"
    // hand milli score of the 46-token twin: all distinct, all alpha →
    // (min(1, 46/100) + 1 + 1)/3 · 1000 floored
    val n = 46.0
    val expected = math.floor(
      (math.min(1.0, n / 100.0) + n / n + n / n) / 3.0 * 1000.0).toLong
    val out = DedupClusterQuery.qualityKeepersOver(
      docsDf(Seq((1L, a), (2L, b)))).collect()
    assert(out.head.getAs[Long]("keeper_quality_milli") === expected)
    spark.catalog.clearCache()
  }

  test("q84: disjoint clusters stay separate, one keeper each") {
    val a = baseText("qd"); val a2 = a + " qxone qxtwo qxsix qxten"
    val b = baseText("qe"); val b2 = b + " qxred qxblue qxjade qxgold"
    val out = DedupClusterQuery.qualityKeepersOver(
      docsDf(Seq((1L, a), (2L, a2), (11L, b), (12L, b2))))
      .collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("cluster_id")).toSeq === Seq(1L, 11L))
    assert(out.map(_.getAs[Long]("keeper_doc_id")).toSeq === Seq(2L, 12L))
    spark.catalog.clearCache()
  }

  test("q84 gate at sf0.001: planted twins beat their bases; census sane") {
    val dir = sf("sf0.001")
    val rows = graft.SparkEntry.queries("q84_quality_keeper")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    // the two planted twin ids = the two longest docs + the q80 offset
    val plantIds = SketchSelect.topK(
      Tables.documents(spark, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n")),
      "n", "doc_id", 2L).collect().map(_.getAs[Long]("doc_id")).toSet
    val twinIds = plantIds.map(_ + IncrementalDedup.PlantIdOffset)
    val planted = rows.filter(r => twinIds.contains(
      r.getAs[Long]("keeper_doc_id")))
    assert(planted.length === 2, s"planted keepers missing: ${rows.toSeq}")
    assert(planted.forall(!_.getAs[Boolean]("keeper_is_min_id")))
    assert(planted.forall(_.getAs[Long]("n_members") >= 2L))
    // every cluster drops exactly n_members − 1 docs
    assert(rows.forall(r =>
      r.getAs[Long]("dropped") === r.getAs[Long]("n_members") - 1L))
    spark.catalog.clearCache()
  }
}
