package graft.queries

import graft.SparkTestBase

/**
 * q77 contract: hard-negative mining — full driver-side reference-model
 * equivalence at sf0.001, the planted false-negative exclusion, and the
 * margin/column arithmetic.
 */
class HardNegativesSpec extends SparkTestBase {

  private lazy val rows = AnnQueries.hardNegatives(spark, sf("sf0.001"))
    .collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  /** Driver-side reference model: same planted twins, same float→double
    * cast and in-order accumulation as the Spark HOFs. */
  private lazy val reference: Seq[(Long, Int, Long, Long, Long, Long, Long)] = {
    val base = Tables.embeddings(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getInt(2)))
    val off = AnnQueries.DupIdOffset
    val emb = base ++ base.filter(_._1 < 3)
      .map { case (id, v, l) => (id + off, v, (l + 1) % 10) }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def normOf(a: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val queries = emb.filter(_._1 < 20L)
    queries.sortBy(_._1).toSeq.flatMap { case (qid, qv, qlab) =>
      val sims = emb.filter(_._1 != qid).map { case (id, v, l) =>
        (id, l, math.floor(dot(qv, v) / (normOf(qv) * normOf(v)) * 1e6).toLong)
      }
      val pos = sims.filter(_._2 == qlab).map(_._3)
      val posMean = if (pos.nonEmpty) pos.sum / pos.length else 0L
      val fn = sims.count(s => s._2 != qlab && s._3 >= 900000L)
      sims.filter(s => s._2 != qlab && s._3 < 900000L)
        .sortBy(s => (-s._3, s._1)).take(5).zipWithIndex
        .map { case ((id, _, sim), i) =>
          (qid, i + 1, id, sim, posMean, posMean - sim, fn.toLong) }
    }
  }

  test("sf0.001: full reference-model equivalence (ranks, margins, counts)") {
    assert(rows === reference)
    assert(rows.size === 100)
  }

  test("planted cross-label twins are excluded, counted, and nothing else is") {
    val byQuery = rows.groupBy(_._1)
    for (q <- 0L until 3L) {
      assert(byQuery(q).forall(_._7 === 1L), s"query $q fn_suspects")
      assert(!byQuery(q).exists(_._3 === AnnQueries.DupIdOffset + q),
        s"query $q mined its own planted twin as a negative")
    }
    assert((3L until 20L).forall(q => byQuery(q).forall(_._7 === 0L)))
  }

  test("mined negatives are genuinely cross-label and below the band") {
    val labels = Tables.embeddings(spark, sf("sf0.001"))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val qlab = (0L until 20L).map(q => q -> labels(q)).toMap
    rows.foreach { case (q, _, nid, sim, _, _, _) =>
      assert(sim < 900000L)
      val nlab = if (nid >= AnnQueries.DupIdOffset)
        (labels(nid - AnnQueries.DupIdOffset) + 1) % 10 else labels(nid)
      assert(nlab !== qlab(q), s"same-label neighbor $nid mined for query $q")
    }
  }
}
