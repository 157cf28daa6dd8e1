package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** q72 (SemDeDup census): a hand-built two-cluster geometry that exercises
  * each semantic branch — a co-clustered exact duplicate (flagged), a
  * same-cluster pair below the threshold (not flagged), and a near-dup
  * pair SPLIT across clusters (missed by construction — the paper's
  * cluster-pruning tradeoff) — plus gate-corpus invariants at sf0.001. */
class SemDedupSpec extends SparkTestBase {

  import spark.implicits._

  test("q72: controlled geometry — co-clustered dup flagged, cross-cluster dup missed") {
    // centroids: c0 = e1, c1 = e2 (2-dim, orthogonal)
    val centroids = Seq(
      (0L, Array(1.0, 0.0)),
      (1L, Array(0.0, 1.0))).toDF("cid", "cvec")
    val u = Seq(
      // ids 1,2: same direction (cos = 1.0) both assigned c0 → id 2 flagged
      (1L, Array(1.0, 0.1)),
      (2L, Array(2.0, 0.2)),
      // ids 3,4: both c1, cos(3,4) ≈ 0.802 < 0.9 → not flagged
      (3L, Array(0.1, 1.0)),
      (4L, Array(-0.6, 1.0)),
      // ids 5,6: cos(5,6) ≈ 0.9945 ≥ 0.9 but the boundary tilt assigns
      // 5 → c0 and 6 → c1 — the pair is structurally MISSED
      (5L, Array(1.0, 0.9)),
      (6L, Array(0.9, 1.0))).toDF("vec_id", "v")
    val rows = AnnQueries.semanticDedupOn(u, centroids, simMicro = 900000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // cid 0 holds ids {1,2,5}: one flagged dup (id 2); micro-sims
    // floor(1e6/sqrt(1.01)) = 995037 (×2) + floor(1e6/sqrt(1.81)) = 743294
    assert(rows(0L) === ((3L, 1L, 2L * 995037L + 743294L)))
    // cid 1 holds ids {3,4,6}: zero flagged despite id 6's true near-dup
    assert(rows(1L) === ((3L, 0L,
      995037L + 857492L + 743294L)))
    spark.catalog.clearCache()
  }

  test("q72: gate-corpus invariants (sf0.001 planted-dup regime)") {
    val out = AnnQueries.semanticDedup(spark, sf("sf0.001")).collect()
    // 500 originals, vec_id % 64 == 0 seeds → 8 clusters partition all rows
    assert(out.length === 8)
    assert(out.map(_.getLong(1)).sum === 525L) // 500 + 25 planted dups
    // only planted dups (cos ≈ 0.995) can clear 0.9 — background max ≈0.45 —
    // and a dup is flagged iff it co-clusters with its original
    val dups = out.map(_.getLong(2)).sum
    assert(dups >= 1L && dups <= 25L, s"flagged dups: $dups")
    spark.catalog.clearCache()
  }
}
