package graft.queries

import graft.SparkTestBase

/**
 * q81 contract: PQ encode + ADC ranking recovers true neighborhoods on
 * cluster-structured data (PQ's actual domain — the gate corpus is
 * near-isotropic and its recall is whatever the oracle re-derives), and
 * the gate output is shaped and deterministic.
 */
class PqAnnSpec extends SparkTestBase {

  test("planted clusters: ADC top-5 stays inside the true cluster") {
    val spark2 = spark
    import spark2.implicits._
    // 3 well-separated 64-dim clusters (centers ~3.0 apart per dim),
    // members spaced by a small id-proportional offset so the exact
    // ordering is monotone in id distance
    def center(g: Int, d: Int): Double = math.sin((g + 1) * (d + 1) * 0.5) * 3.0
    val rows = (0L until 24L).map { id =>
      val g = (id % 3).toInt
      (id, Array.tabulate(64)(d => (center(g, d) + id * 0.002).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = AnnQueries.pqAnnOn(emb, k = 4, stride = 2L, nQueries = 3).collect()
    assert(out.length === 15)
    out.foreach { r =>
      // every ADC neighbor is a true cluster mate — the separation is the
      // claim; ordering inside the cluster is quantization-resolution
      assert(r.getAs[Long]("neighbor_id") % 3 === r.getAs[Long]("query_id") % 3,
        r.toString)
    }
    val hits = out.map(r =>
      r.getAs[Long]("query_id") -> r.getAs[Long]("recall_hits")).toMap
    hits.foreach { case (q, h) => assert(h >= 3L, s"query $q recall_hits $h") }
    spark.catalog.clearCache()
  }

  test("gate shape at sf0.001: 5 queries x top-5, ranked by ADC distance, deterministic") {
    def run() = graft.SparkEntry.queries("q81_pq_ann")(spark, sf("sf0.001"))
      .collect().map(_.toString).toSeq
    val a = run()
    spark.catalog.clearCache()
    assert(a.length === 25)
    val rows = graft.SparkEntry.queries("q81_pq_ann")(spark, sf("sf0.001")).collect()
    spark.catalog.clearCache()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      assert(sorted.map(_.getAs[Int]("rn")).toSeq === (1 to 5), s"query $q")
      val dists = sorted.map(_.getAs[Long]("adc_micro")).toSeq
      assert(dists === dists.sorted, s"query $q ADC not ranked: $dists")
    }
    assert(rows.map(_.toString).toSeq === a, "non-deterministic output")
  }
}
