package graft.queries

import graft.SparkTestBase
import graft.agg.SketchFunctions._
import graft.sketch.HyperLogLog
import org.apache.spark.sql.functions._

/** q101: HLL set algebra — union/intersection/difference estimates vs a
  * driver-side exact reference, the inclusion–exclusion error envelope on
  * controlled-overlap fixtures, and the `hll_set_union` column function's
  * parity with the kernel merge. */
class SetAlgebraSpec extends SparkTestBase {

  import spark.implicits._

  test("q101: gate exacts equal the JVM reference and all verdicts hold at sf0.001") {
    val cutoff = 896659200000000L
    val rows = Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey").cast("long"),
        unix_micros(col("l_shipdate").cast("timestamp")))
      .as[(Long, Long)].collect()
    val a = rows.collect { case (k, t) if t <= cutoff => k }.toSet
    val b = rows.collect { case (k, t) if t > cutoff => k }.toSet
    val got = SketchQueries.hllSetAlgebra(spark, sf("sf0.001")).head()
    assert(got.getAs[Long]("exact_a") === a.size.toLong)
    assert(got.getAs[Long]("exact_b") === b.size.toLong)
    assert(got.getAs[Long]("exact_union") === (a union b).size.toLong)
    assert(got.getAs[Long]("exact_intersect") === (a intersect b).size.toLong)
    assert(got.getAs[Long]("exact_a_only") === (a diff b).size.toLong)
    assert(got.getAs[Boolean]("union_within_bound"))
    assert(got.getAs[Boolean]("intersect_within_bound"))
    assert(got.getAs[Boolean]("diff_within_bound"))
    spark.catalog.clearCache()
  }

  test("inclusion-exclusion estimates land inside the compounded 3-sigma envelope") {
    // controlled overlap: |A| = |B| = 30k, |A ∩ B| swept over a decade
    for (inter <- Seq(300, 3000, 30000)) {
      val ha = HyperLogLog(14)
      val hb = HyperLogLog(14)
      (0 until 30000).foreach(i => ha.add(s"k$i"))
      (30000 - inter until 60000 - inter).foreach(i => hb.add(s"k$i"))
      val union = ha.copySketch().merge(hb.copySketch())
      val exactU = 60000 - inter
      val sigma = 3 * 1.04 / math.sqrt(16384.0)
      assert(math.abs(union.estimate() - exactU) <= sigma * exactU)
      val estI = ha.estimate() + hb.estimate() - union.estimate()
      assert(math.abs(estI - inter) <= sigma * (30000 + 30000 + exactU),
        s"inter=$inter estI=$estI")
      val estDiff = union.estimate() - hb.estimate()
      assert(math.abs(estDiff - (30000 - inter)) <= sigma * (exactU + 30000))
    }
  }

  test("q115: sliding-window exacts equal the JVM reference and all verdicts hold at sf0.001") {
    val cols = Tables.events(spark, sf("sf0.001"))
      .select(col("user_id").cast("string"),
        expr("unix_micros(cast(ts AS timestamp)) div 21600000000"))
      .as[(String, Long)].collect()
    val mnb = cols.map(_._2).min
    val mxb = cols.map(_._2).max
    val ref = cols.flatMap { case (u, b) => (0 until 4).map(j => (b - j, u)) }
      .filter { case (w, _) => w >= mnb && w + 3 <= mxb }
      .groupBy(_._1).map { case (w, us) => w -> us.map(_._2).distinct.size.toLong }
    val got = SketchQueries.slidingDistinctUsers(spark, sf("sf0.001")).collect()
    assert(got.length === ref.size)
    got.foreach { r =>
      assert(r.getLong(1) === ref(r.getLong(0)), s"window ${r.getLong(0)}")
      assert(r.getBoolean(2), s"verdict failed for window ${r.getLong(0)}")
    }
    spark.catalog.clearCache()
  }

  test("hll_union column function == kernel merge, bit-exact; null-safe") {
    val df = (0 until 20000)
      .map(i => (s"x$i", i % 2 == 0)).toDF("k", "left_side")
    val row = df.agg(
      hll_sketch(when(col("left_side"), col("k"))).as("a"),
      hll_sketch(when(!col("left_side"), col("k"))).as("b"))
      .select(hll_set_union(col("a"), col("b")).as("u"),
        hll_set_union(col("a"), lit(null).cast("binary")).as("nu"),
        col("a"), col("b"))
      .head()
    val kernel = HyperLogLog.deserialize(row.getAs[Array[Byte]]("a"))
      .merge(HyperLogLog.deserialize(row.getAs[Array[Byte]]("b")))
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("u"), kernel.serialize()))
    assert(row.isNullAt(row.fieldIndex("nu")))
    // idempotence: unioning a sketch with itself changes nothing
    val self = HyperLogLog.deserialize(row.getAs[Array[Byte]]("a"))
      .merge(HyperLogLog.deserialize(row.getAs[Array[Byte]]("a")))
    assert(java.util.Arrays.equals(self.serialize(), row.getAs[Array[Byte]]("a")))
    spark.catalog.clearCache()
  }
}
