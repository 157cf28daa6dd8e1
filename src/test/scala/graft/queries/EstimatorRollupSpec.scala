package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q108 (MinHash estimator audit) and q109 (KLL shard rollup): estimator
  * verdicts and exact-value parity against driver-side references. */
class EstimatorRollupSpec extends SparkTestBase {

  import spark.implicits._

  test("q108: exact jaccard matches q73 and every estimator verdict holds at sf0.001") {
    val dir = sf("sf0.001")
    val got = TextQueries.minhashEstimator(spark, dir).collect()
    assert(got.length === 190) // 20 sources -> 190 pairs
    got.foreach(r => assert(r.getAs[Boolean]("est_within_bound"), r.toString))
    val q73 = TextQueries.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("jaccard_micro"))
      .toMap
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("jaccard_micro") === q73(k), k.toString)
    }
    spark.catalog.clearCache()
  }

  test("q108: the estimate is deterministic across runs (seedless hashing)") {
    val dir = sf("sf0.001")
    val a = TextQueries.minhashEstimator(spark, dir).collect().map(_.toString)
    spark.catalog.clearCache()
    val b = TextQueries.minhashEstimator(spark, dir).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
    spark.catalog.clearCache()
  }

  test("q109: per-source and merged-global medians equal the rank-rule reference at sf0.001") {
    val dir = sf("sf0.001")
    val rows = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars").cast("long"))
      .as[(String, Long)].collect()
    def p50(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(math.max(1, math.ceil(0.5 * s.length).toInt) - 1)
    }
    val ref = rows.groupBy(_._1).map { case (src, rs) =>
      src -> p50(rs.map(_._2).toSeq)
    } + ("<all>" -> p50(rows.map(_._2).toSeq))
    val got = SketchQueries.kllShardRollup(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got === ref)
    spark.catalog.clearCache()
  }

  test("q109: shard merge is order-invariant (compaction-free multiset concat)") {
    import graft.sketch.KllSketch
    def shards() = (0 until 5).map { g =>
      val sk = KllSketch(65536)
      (0 until 200).foreach(i => sk.update((g * 1000 + i * 7 % 997).toDouble))
      sk
    }
    val fwd = shards().reduce(_ merge _)
    val rev = shards().reverse.reduce(_ merge _)
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9))
      assert(fwd.quantile(q) === rev.quantile(q), s"q=$q")
  }
}
