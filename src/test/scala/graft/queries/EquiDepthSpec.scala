package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q99: the equi-depth histogram against a driver-side JVM reference
  * (the same ⌈q·n⌉ rank rule as DuckDB's quantile_disc — the boundary
  * claim the full value oracle rests on) plus degenerate fixtures. */
class EquiDepthSpec extends SparkTestBase {

  import spark.implicits._

  private val B = SketchQueries.EquiDepthBins

  private def ref(xs: Seq[Double]): Seq[(Long, Long, Long, Long)] = {
    val sorted = xs.sorted
    val n = sorted.length
    val bounds = (1 until B).map(i =>
      sorted(math.max(1L, math.ceil(i.toDouble / B * n).toLong).toInt - 1)) :+
      sorted.last
    def binOf(x: Double): Int =
      bounds.init.zipWithIndex.collectFirst {
        case (b, i) if x <= b => i + 1
      }.getOrElse(B)
    val cnt = xs.groupBy(binOf).view.mapValues(_.size.toLong).toMap
    var cum = 0L
    (1 to B).map { i =>
      val c = cnt.getOrElse(i, 0L)
      cum += c
      (i.toLong, math.floor(bounds(i - 1) * 1e6).toLong, c, cum)
    }
  }

  test("q99: gate output equals the JVM reference histogram at sf0.001") {
    val dir = sf("sf0.001")
    val xs = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice")).as[Double].collect().toSeq
    val got = SketchQueries.equiDepthHistogram(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === ref(xs))
    // equi-depth contract: at gate-exact boundaries every bin holds
    // between ⌊n/B⌋ - dup-slack and the duplicate mass; on this
    // near-continuous column the masses are within one of n/B
    val n = xs.length.toLong
    got.foreach { case (_, _, c, _) =>
      assert(math.abs(c - n / B) <= n / B,
        s"bin mass $c far from ${n / B}")
    }
    assert(got.last._4 === n, "cumulative mass must equal the row count")
    spark.catalog.clearCache()
  }

  test("q99: a constant column collapses to bin 1 with the other bins restored as zeros") {
    val df = spark.range(1000L).select(lit(42.5).as("x"))
    val got = SketchQueries.equiDepthOn(spark, df)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === (1L to B.toLong))
    assert(got.head === ((1L, 42500000L, 1000L, 1000L)))
    got.tail.foreach { case (_, hi, c, cum) =>
      assert(c === 0L && cum === 1000L && hi === 42500000L)
    }
    spark.catalog.clearCache()
  }

  test("q99: two-value skew puts the mass where the quantiles put the boundaries") {
    // 900 copies of 1.0 and 100 of 2.0: boundaries b1..b7 all equal 1.0
    // (ceil-rank <= 900 for i/8 <= 7/8), so bin 1 takes the 900 and the
    // ELSE arm (bin 8) takes the 100 — empty bins 2..7 restored
    val df = (Seq.fill(900)(1.0) ++ Seq.fill(100)(2.0)).toDF("x")
    val got = SketchQueries.equiDepthOn(spark, df)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._3)) ===
      Seq((1L, 900L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L), (6L, 0L),
        (7L, 0L), (8L, 100L)))
    assert(got.last._2 === 2000000L)
    spark.catalog.clearCache()
  }
}
