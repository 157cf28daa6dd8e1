package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q86 (priority sampling): the md5-derived u pinned against a JVM
  * reference, a full driver-side reference model of the DLT sample at
  * sf0.001, and the estimator contract. */
class PrioritySampleSpec extends SparkTestBase {

  import spark.implicits._

  /** JVM reference for u: first 8 lowercase-hex md5 digits as a long, +1 —
    * the same definition the operator expresses in Spark SQL and the
    * oracle in DuckDB. */
  private def refU(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) + 1L
  }

  test("q86: Spark's conv(md5) u matches the JVM reference digest") {
    val got = Seq(0L, 1L, 42L, 499L, 1000000000000L).toDF("doc_id")
      .withColumn("u", expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint) + 1"))
      .as[(Long, Long)].collect().toMap
    for (id <- Seq(0L, 1L, 42L, 499L, 1000000000000L))
      assert(got(id) === refU(id), s"u($id)")
  }

  test("q86: gate output equals a driver-side DLT reference model") {
    val dir = sf("sf0.001")
    val k = TextQueries.PrioritySampleK
    val docs = Tables.documents(spark, dir)
      .filter(col("n_chars").isNotNull)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)].collect()
    val ranked = docs.map { case (id, w) =>
      val u = refU(id)
      (id, w, u, w * 4294967296L * 1000L / u)
    }.sortBy { case (id, _, _, p) => (-p, id) }
    val tau = ranked(k)._4
    val expected = ranked.take(k).zipWithIndex.map {
      case ((id, w, u, p), i) =>
        ((i + 1).toLong, id, w, u, p, math.max(w * 1000L, tau))
    }.toSeq
    val got = TextQueries.prioritySample(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q86: estimator floors at tau and at the own weight, deterministic") {
    val dir = sf("sf0.001")
    val a = TextQueries.prioritySample(spark, dir).collect()
    val b = TextQueries.prioritySample(spark, dir).collect()
    assert(a.toSeq === b.toSeq) // seedless: re-runs pick the SAME sample
    assert(a.length === TextQueries.PrioritySampleK)
    for (r <- a) {
      val w = r.getAs[Long]("w")
      val wh = r.getAs[Long]("w_hat_milli")
      assert(wh >= w * 1000L, "estimator never below the true weight")
      // a sampled item's priority clears τ, and p ≥ w·1000 always (u ≤ 2³²),
      // so it clears ŵ = max(w·1000, τ) too
      assert(r.getAs[Long]("p_milli") >= wh, "sampled priority below w_hat")
    }
    // ranks are 1..k and priorities non-increasing
    assert(a.map(_.getAs[Long]("smp_rank")).toSeq === (1L to 20L))
    val ps = a.map(_.getAs[Long]("p_milli")).toSeq
    assert(ps === ps.sorted.reverse)
    spark.catalog.clearCache()
  }
}
