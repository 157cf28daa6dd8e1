package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q110 (conversion funnel) and q111 (frequent part pairs): JVM reference
  * replays at sf0.001 plus the funnel's ordering/monotonicity contracts. */
class AnalyticsSpec extends SparkTestBase {

  import spark.implicits._

  private val H = 86400000000L

  test("q110: gate equals the first-touch JVM reference and stages are monotone") {
    val dir = sf("sf0.001")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    def firstAfter(rs: Seq[(Long, String, Long)], et: String, from: Long): Option[Long] = {
      val c = rs.collect { case (_, e, t) if e == et && t >= from && t <= from + H => t }
      if (c.isEmpty) None else Some(c.min)
    }
    val chains = byUser.toSeq.flatMap { case (_, rs) =>
      val views = rs.collect { case (_, "view", t) => t }
      if (views.isEmpty) None
      else {
        val t1 = views.min
        val t2 = firstAfter(rs.toSeq, "click", t1)
        val t3 = t2.flatMap(t => firstAfter(rs.toSeq, "purchase", t))
        Some((t1, t2, t3))
      }
    }
    val r = AnalyticsQueries.conversionFunnel(spark, dir).head()
    assert(r.getAs[Long]("n_users") === byUser.size.toLong)
    assert(r.getAs[Long]("n_viewed") === chains.size.toLong)
    assert(r.getAs[Long]("n_clicked") === chains.count(_._2.isDefined).toLong)
    assert(r.getAs[Long]("n_purchased") === chains.count(_._3.isDefined).toLong)
    assert(r.getAs[Long]("total_lag_us") ===
      chains.collect { case (t1, _, Some(t3)) => t3 - t1 }.sum)
    assert(r.getAs[Long]("n_viewed") >= r.getAs[Long]("n_clicked"))
    assert(r.getAs[Long]("n_clicked") >= r.getAs[Long]("n_purchased"))
    // the horizon must bite on this corpus: a funnel that saturates
    // proves nothing about the ordering rule
    assert(r.getAs[Long]("n_clicked") < r.getAs[Long]("n_viewed"))
    spark.catalog.clearCache()
  }

  test("q111: gate equals the JVM pair census at sf0.001") {
    val dir = sf("sf0.001")
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect().distinct
    val ref = rows.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
      .filter(_._3 >= 2L).toSeq
      .sortBy { case (a, b, s) => (-s, a, b) }.take(20)
    val got = AnalyticsQueries.frequentPartPairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === ref)
    spark.catalog.clearCache()
  }

  test("q113: gate equals the JVM rank-rule RFM reference at sf0.001") {
    val dir = sf("sf0.001")
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")),
        floor(col("value") * lit(1000000L)).cast("long"))
      .as[(Long, Long, Long)].collect()
    val rfm = p.groupBy(_._1).map { case (_, rs) =>
      (rs.map(_._2).max, rs.size.toLong, rs.map(_._3).sum)
    }.toSeq
    val mx = rfm.map(_._1).max
    val axes = Seq(rfm.map(r => mx - r._1), rfm.map(_._2), rfm.map(_._3))
    def q(xs: Seq[Long], p: Double): Long = {
      val s = xs.sorted
      s(math.max(1, math.ceil(p * s.length).toInt) - 1)
    }
    val bs = axes.map(xs => Seq(0.25, 0.5, 0.75).map(q(xs, _)))
    def bucket(x: Long, b: Seq[Long]): Long = 1L + b.count(x > _)
    val ref = rfm.map { case (lu, f, m) =>
      (bucket(mx - lu, bs(0)), bucket(f, bs(1)), bucket(m, bs(2)))
    }.groupBy(identity).map { case (k, vs) => (k._1, k._2, k._3, vs.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2, t._3))
    val got = AnalyticsQueries.rfmSegments(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === ref)
    // every user lands in exactly one cell
    assert(got.map(_._4).sum === rfm.size.toLong)
    spark.catalog.clearCache()
  }
}
