package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q107: integer PageRank — hand graphs with derivable ranks, a JVM
  * reference replay of the full gate at sf0.001, and the round-arithmetic
  * contract. */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  /** Driver-side reference: the same integer rounds over an edge list. */
  private def refRanks(pairs: Seq[(Long, Long)], rounds: Int = 3): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = contrib.map { case (v, s) => v -> (150000L + (85L * s) / 100L) }
    }
    r
  }

  test("triangle: symmetry keeps all ranks equal at the stationary value") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val got = GraphQueries.pageRankOn(tri).collect()
    assert(got.length === 3)
    // every node receives exactly its own emission back: r = 150000 + 85% r
    // converges toward 1e6 and stays there from r0 = 1e6 (integer-exact)
    got.foreach { r =>
      assert(r.getLong(1) === 999999L || r.getLong(1) === 1000000L, r.toString)
      assert(r.getLong(2) === 2L)
    }
    spark.catalog.clearCache()
  }

  test("star: the hub outranks the leaves and matches the JVM reference") {
    val star = (2L to 6L).map(i => (1L, i))
    val got = GraphQueries.pageRankOn(star.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ref = refRanks(star)
    ref.foreach { case (v, r) => assert(got(v)._1 === r, s"node $v") }
    assert(got(1L)._2 === 5L)
    assert(got(1L)._1 > got(2L)._1, "the hub must outrank a leaf")
    spark.catalog.clearCache()
  }

  test("q107: gate equals the JVM reference replay at sf0.001") {
    val dir = sf("sf0.001")
    val pairs = TextQueries.ngramJaccard(spark, dir)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty, "the sf0.001 near-dup graph must have edges")
    val ref = refRanks(pairs)
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val expected = ref.toSeq.map { case (v, r) => (v, r, deg(v)) }
      .sortBy { case (v, r, _) => (-r, v) }.take(20)
    val got = GraphQueries.pageRankNearDup(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }
}
