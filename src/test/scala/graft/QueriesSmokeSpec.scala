package graft

import graft.multimodal.Multimodal

/** Every driver-contract query runs without error at sf0.001 (the driver's
  * smoke scale) and the flagship returns rows. */
class QueriesSmokeSpec extends SparkTestBase {

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf("sf0.001")).count()
      assert(n >= 0, name)
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("multimodal feature extraction is deterministic and schema-stable") {
    val a = Multimodal.featureCensus(spark, sf("sf0.001")).collect()
    val b = Multimodal.featureCensus(spark, sf("sf0.001")).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getAs[String]("modality")).toSet === Set("image", "audio", "video"))
    // frame sampling: videos contribute >1 frame on average
    val video = a.find(_.getAs[String]("modality") == "video").get
    assert(video.getAs[Long]("total_frames") > video.getAs[Long]("n_media"))
  }
}
