package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.agg.SketchFunctions._
import graft.sketch.{CountMinSketch, HyperLogLog}

/**
 * Structured Streaming compatibility: the sketches are mergeable monoids, so
 * they drop into streaming `groupBy().agg()` in update/complete mode
 * unchanged (SURVEY.md §2.9 — not a north-rule deliverable, but the merge
 * design makes it free; this proves it).
 */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  test("cm_sketch in a streaming aggregation over micro-batches == batch build") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("k", "w")
      .agg(cm_sketch(col("k"), col("w"), eps = 1e-3).as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("cm_stream")
      .start()
    val stream = graft.sketch.StreamFixtures.weightedZipfStream(20000, 1000)
    // three micro-batches
    stream.grouped(7000).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    val got = spark.sql("SELECT sk FROM cm_stream").head().getAs[Array[Byte]]("sk")
    q.stop()
    val single = CountMinSketch.fromErrorBounds(1e-3, 0.01)
    stream.foreach { case (k, w) => single.update(k, w) }
    assert(java.util.Arrays.equals(got, single.serialize()))
  }

  test("hll_sketch per-group streaming distinct counts (update mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = mem.toDF().toDF("grp", "k")
      .groupBy(col("grp"))
      .agg(hll_sketch(col("k"), p = 12).as("sk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_stream")
      .start()
    val data = (0 until 5000).map(i => (s"g${i % 3}", s"user_${i % 500}"))
    data.grouped(2000).foreach { batch =>
      mem.addData(batch)
      q.processAllAvailable()
    }
    val rows = spark.sql("SELECT grp, sk FROM hll_stream").collect()
    q.stop()
    assert(rows.length === 3)
    rows.foreach { r =>
      val est = HyperLogLog.deserialize(r.getAs[Array[Byte]]("sk")).estimate()
      val exact = data.filter(_._1 == r.getString(0)).map(_._2).distinct.size
      assert(math.abs(est - exact) <= 0.05 * exact + 2, s"grp=${r.getString(0)}")
    }
  }
}
