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

  test("stratified sample equals the naive full-stratum rank (q47)") {
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val got = graft.queries.TextQueries.stratifiedSample(spark, dir).collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc, col("doc_id").asc)
    val want = graft.queries.Tables.documents(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 20)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sample_chars"))
      .orderBy(col("lang")).collect()
    assert(got.toSeq === want.toSeq)
  }

  test("multimodal feature extraction is deterministic and schema-stable") {
    val a = Multimodal.featureCensusWithChecksum(spark, sf("sf0.001")).collect()
    val b = Multimodal.featureCensusWithChecksum(spark, sf("sf0.001")).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getAs[String]("modality")).toSet === Set("image", "audio", "video"))
    // frame sampling: videos contribute >1 frame on average
    val video = a.find(_.getAs[String]("modality") == "video").get
    assert(video.getAs[Long]("total_frames") > video.getAs[Long]("n_media"))
  }
}
