package graft.queries

import graft.SparkTestBase
import graft.sketch.CountSketch
import org.apache.spark.sql.functions._

/** q85 (heavy-change detection): the Count-Sketch linearity identity the
  * operator rides, a hand-computable fixture census, and the gate-scale
  * planted-burst contract. */
class HeavyChangeSpec extends SparkTestBase {

  import spark.implicits._

  test("kernel: one signed build == sketch(A) − sketch(B), query included") {
    val a = Seq("u1" -> 10L, "u2" -> 3L, "u3" -> 7L)
    val b = Seq("u1" -> 2L, "u2" -> 3L, "u4" -> 5L)
    val signed = CountSketch(depth = 5, width = 256)
    a.foreach { case (k, c) => signed.update(k, c) }
    b.foreach { case (k, c) => signed.update(k, -c) }
    val sa = CountSketch(depth = 5, width = 256)
    a.foreach { case (k, c) => sa.update(k, c) }
    val sb = CountSketch(depth = 5, width = 256)
    b.foreach { case (k, c) => sb.update(k, c) }
    // counters are elementwise (linearity); queries agree on every key
    val diff = sa.counters.zip(sb.counters).map { case (x, y) => x - y }
    assert(signed.counters.toSeq === diff.toSeq)
    for (k <- Seq("u1", "u2", "u3", "u4", "u5")) {
      val ea = sa.query(graft.sketch.Hash128.ofString(k, CountSketch.DefaultSeed))
      val eb = sb.query(graft.sketch.Hash128.ofString(k, CountSketch.DefaultSeed))
      // collision-free at this fill: estimates are exact, so the signed
      // sketch's estimate equals the difference of the two epochs' counts
      assert(signed.query(graft.sketch.Hash128.ofString(k, CountSketch.DefaultSeed))
        === ea - eb)
    }
  }

  /** Write an events.parquet fixture with explicit epoch placement. */
  private def fixture(rows: Seq[(Long, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-hc-fx").toString
    rows.toDF("user_id", "us")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q85 fixture: exact counts, ranks, and the planted burst at rank 1") {
    val base = 1600000000000000L // 2020-09-13, the streaming-gate epoch
    val e2 = base + 1000000L
    val rows =
      Seq.fill(10)((1L, base)) ++ Seq.fill(2)((1L, e2)) ++ // Δ = +8
        Seq.fill(3)((2L, base)) ++ Seq.fill(3)((2L, e2)) ++ // Δ = 0
        Seq.fill(5)((3L, e2)) // Δ = −5
    val got = SketchQueries.heavyChangeUsers(spark, fixture(rows))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSeq
    val expected = Seq(
      ("1000000000000", 0L, 500L, 500L, true), // the planted burst
      ("1", 10L, 2L, 8L, true),
      ("3", 0L, 5L, 5L, true),
      ("2", 3L, 3L, 0L, true))
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("q85 gate at sf0.001: burst at rank 1, envelope verdicts all true") {
    val rows = graft.SparkEntry.queries("q85_heavy_change")(spark, sf("sf0.001"))
      .collect()
    assert(rows.length === 16) // 15 sf0.001 user_ids + the planted burst
    val top = rows.head
    assert(top.getString(0) === SketchQueries.HeavyChangePlantId.toString)
    assert(top.getAs[Long]("c1") === 0L)
    assert(top.getAs[Long]("c2") === SketchQueries.HeavyChangeBurst.toLong)
    assert(rows.forall(_.getAs[Boolean]("within_bound")))
    spark.catalog.clearCache()
  }
}
