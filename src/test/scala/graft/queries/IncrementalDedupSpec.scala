package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * q80 contract: the incremental delta pass flags exactly the delta docs
 * whose content exists in the base (Bloom prefilter has no false
 * negatives; bucket pruning loses no candidate), the gate's planted
 * cross-snapshot duplicates are all confirmed, and the index read is
 * genuinely partition-pruned to the candidates' buckets.
 */
class IncrementalDedupSpec extends SparkTestBase {

  test("fixture: planted dup flagged, new doc passes") {
    val spark2 = spark
    import spark2.implicits._
    val base = Seq((1L, "alpha beta"), (2L, "gamma delta"),
      (3L, "epsilon zeta")).toDF("doc_id", "text")
    val delta = Seq((10L, "gamma delta"), (11L, "brand new text"),
      (12L, "alpha beta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("incrdedup").toString
    IncrementalDedup.prepareBase(spark, base, dir)
    val out = IncrementalDedup.dedupDelta(spark, delta, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(10L -> true, 11L -> false, 12L -> true))
  }

  test("gate values at sf0.001: 25 arrivals + 10 planted, 10 confirmed, parity holds") {
    val r = graft.SparkEntry.queries("q80_incremental_dedup")(spark, sf("sf0.001"))
      .head()
    assert(r.getAs[Long]("n_delta") === 35L)
    assert(r.getAs[Long]("confirmed_dups") === 10L)
    assert(r.getAs[Long]("new_docs") === 25L)
    assert(r.getAs[Long]("parity_ok") === 1L)
    spark.catalog.clearCache()
  }

  test("the exact-verify index read is partition-pruned to touched buckets") {
    val p = graft.SparkEntry.queries("q80_incremental_dedup")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    // the hash-index FileSourceScan must carry a non-empty PartitionFilters
    // clause over the bucket column — a regression to an unpruned read
    // (reading all 16 directories regardless of candidates) drops it
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*b#.*"), p)
    spark.catalog.clearCache()
  }

  test("commitDelta closes the cycle: the next snapshot sees this one's content") {
    val spark2 = spark
    import spark2.implicits._
    val base = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("incrcommit").toString
    IncrementalDedup.prepareBase(spark, base, dir)
    // snapshot 1: C is new -> admitted, committed
    val s1 = Seq((10L, "charlie content")).toDF("doc_id", "text")
    val f1 = IncrementalDedup.dedupDelta(spark, s1, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(f1 === Map(10L -> false))
    val fppAfter = IncrementalDedup.commitDelta(spark, s1, dir)
    assert(fppAfter < 1e-2, s"headroom-sized filter should stay tight: $fppAfter")
    // snapshot 2: C re-arrives (cross-SNAPSHOT dup via the committed bloom
    // + appended index, base itself untouched), D is new, A still dups
    val s2 = Seq((20L, "charlie content"), (21L, "delta fresh"),
      (22L, "alpha beta")).toDF("doc_id", "text")
    val f2 = IncrementalDedup.dedupDelta(spark, s2, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(f2 === Map(20L -> true, 21L -> false, 22L -> true))
  }

  test("delta with zero duplicates confirms nothing (bloom negatives short-circuit)") {
    val spark2 = spark
    import spark2.implicits._
    val base = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val delta = Seq((10L, "totally fresh"), (11L, "content here"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("incrdedup0").toString
    IncrementalDedup.prepareBase(spark, base, dir)
    val flagged = IncrementalDedup.dedupDelta(spark, delta, dir)
    assert(flagged.filter(col("is_dup")).count() === 0L)
    assert(flagged.count() === 2L)
  }
}
