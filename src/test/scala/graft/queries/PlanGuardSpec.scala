package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the SCALE SHAPE of the parity/audit twins (VERDICT r3 item 1): the
  * brute-force pair enumerations inside q17/q26/q56 must tile the
  * deterministic hash subset, never the full corpus. [[PairTiling.hashSubset]]
  * keeps its `pmod(xxhash64(id), divisor) = 0` filter even at divisor 1, so
  * the guard holds at any fixture scale — a regression that tiles the full
  * frame deletes the filter and fails here long before a 100× corpus kills
  * the gate. */
class PlanGuardSpec extends SparkTestBase {

  /** The hashSubset fingerprint in an optimized plan: a FILTER comparing
    * pmod(xxhash64(...)) to 0. PairTiling's own group assignment also uses
    * pmod(xxhash64(...)) but lands in a Project as `__g` and is never
    * compared to a literal, so the ` = 0` suffix is unique to the subset. */
  private val SubsetFilter = """pmod\(xxhash64\([^\n]{0,120}?\) = 0\)""".r

  private def subsetFilters(df: DataFrame): Int =
    SubsetFilter.findAllIn(df.queryExecution.optimizedPlan.toString).length

  test("hashSubset divisor grows with n; ~target rows survive at any scale") {
    assert(PairTiling.hashSubsetDivisor(500) === 1L)
    assert(PairTiling.hashSubsetDivisor(1024) === 1L)
    assert(PairTiling.hashSubsetDivisor(1L << 20) === 1024L)
    assert(PairTiling.hashSubsetDivisor(1L << 40) === (1L << 30))
    // survivor count concentrates near target once n >> target
    val n = 200000L
    val df = spark.range(n).select(col("id").as("doc_id"))
    val kept = PairTiling.hashSubset(df, "doc_id", n).count()
    assert(kept > 512 && kept < 2048, s"survivors $kept not ~1024")
  }

  test("q17 parity twin tiles the subset, not the corpus") {
    val plan = graft.queries.TextQueries
      .dedupSimhashParity(spark, sf("sf0.001"))
    // one subset filter per tiling branch of the blocked+brute parity
    // (blocked side, brute left, brute right)
    assert(subsetFilters(plan) >= 2, "subset filter missing from q17 plan")
    spark.catalog.clearCache()
  }

  test("q26 locality audit tiles the subset, not the corpus") {
    val plan = graft.queries.AnnQueries
      .lshBucketLocality(spark, sf("sf0.001"))
    assert(subsetFilters(plan) >= 1, "subset filter missing from q26 plan")
    spark.catalog.clearCache()
  }

  test("q56 parity twin tiles the subset, not the corpus") {
    val plan = graft.queries.TextQueries
      .fingerprintJoinParity(spark, sf("sf0.001"))
    assert(subsetFilters(plan) >= 2, "subset filter missing from q56 plan")
    spark.catalog.clearCache()
  }

  test("subset parity verdicts still pass at sf0.01 (the verify scale)") {
    // sf0.01 is where the driver's oracle runs; divisor is 2 there for q17
    // (2500 docs), so this exercises a genuinely proper subset
    val q17 = graft.queries.TextQueries.dedupSimhashParity(spark, sf("sf0.01"))
      .head()
    assert(q17.getAs[Long]("parity_ok") === 1L)
    spark.catalog.clearCache()
    val q26 = graft.queries.AnnQueries.lshBucketLocality(spark, sf("sf0.01"))
      .head()
    assert(q26.getAs[Long]("locality_ok") === 1L)
    spark.catalog.clearCache()
  }
}
