package graft.queries

import graft.SparkTestBase

/**
 * The two exact set-similarity plans behind q18/q55 — triangle-tiled
 * blocked all-pairs (low t) and PPJoin prefix+positional (high t) — are
 * different CANDIDATE strategies over the same exact verify, so they must
 * return identical rows at any shared threshold. The DuckDB oracle pins
 * each gate query's own threshold; this pins the cross-path agreement the
 * oracle can't see (only one path runs per gate query).
 */
class JaccardJoinSpec extends SparkTestBase {

  private def run(tMicro: Long, forcePrefix: Boolean): Seq[(Long, Long, Long)] = {
    val df =
      if (forcePrefix) TextQueries.ngramJaccardPrefix(spark, sf("sf0.001"), tMicro)
      else TextQueries.ngramJaccardTiled(spark, sf("sf0.001"), tMicro)
    val rows = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("jaccard_micro")))
      .toSeq
    spark.catalog.clearCache()
    rows
  }

  test("tiled and prefix paths agree at thresholds spanning the cutover") {
    for (t <- Seq(50000L, 200000L, 300000L, 500000L)) {
      val tiled = run(t, forcePrefix = false)
      val prefix = run(t, forcePrefix = true)
      assert(tiled === prefix, s"paths disagree at tMicro=$t")
    }
  }

  test("adaptive dispatch matches the forced paths at the gate thresholds") {
    assert(TextQueries.ngramJaccard(spark, sf("sf0.001")).collect().toSeq ===
      TextQueries.ngramJaccardTiled(spark, sf("sf0.001"), 50000L).collect().toSeq)
    spark.catalog.clearCache()
    assert(TextQueries.ngramJaccardHigh(spark, sf("sf0.001")).collect().toSeq ===
      TextQueries.ngramJaccardPrefix(spark, sf("sf0.001"), 300000L).collect().toSeq)
    spark.catalog.clearCache()
  }

  test("dispatcher picks tiled on this dense-vocab family at high t (selectivity arm)") {
    // round-6 rule: prefix needs BOTH a big block AND measured posting
    // selectivity (distinct postings/block >= 16·p̄²). This corpus draws
    // from <=961 possible bigrams, so at ANY block size the selectivity
    // arm must veto prefix — the measured B=4k/6k cells showed the
    // block-size arm alone misdispatching 4.2–7.9× (BENCH_SCALING.md).
    // Tiled plan fingerprint: PairTiling's pmod group assignment; prefix
    // fingerprint: the (df, bg)-ordered row_number window.
    val p = TextQueries.ngramJaccardJoin(spark, sf("sf0.001"), 300000L)
      .queryExecution.optimizedPlan.toString
    assert(!p.contains("row_number"), s"dispatcher chose prefix:\n$p")
    spark.catalog.clearCache()
  }

  test("tiled plan forms each pair exactly once (no distinct needed)") {
    // pair multiplicity check: drop the verify threshold to 1 so every
    // surviving size-ratio pair is emitted; duplicates would double rows
    val pairs = TextQueries.ngramJaccardTiled(spark, sf("sf0.001"), 1L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === pairs.distinct.length, "tiling emitted a pair twice")
    assert(pairs.forall { case (a, b) => a < b }, "pair not in canonical order")
    spark.catalog.clearCache()
  }
}
