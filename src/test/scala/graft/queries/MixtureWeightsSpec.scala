package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * q76 contract: α-temperature mixture weights (p_s ∝ n_s^0.5) with the
 * effective-epochs diagnostic — hand-traced fixture, full driver-side
 * reference-model equivalence at sf0.001, and the flattening property
 * that is the operator's entire reason to exist.
 */
class MixtureWeightsSpec extends SparkTestBase {

  import spark.implicits._

  private def fixtureDir(rows: (Long, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-q76-").toString
    rows.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("hand-traced two-source fixture: weights, epochs, upsampled flag") {
    // srcA: 16 tokens, srcB: 1 token. terms = floor(sqrt(n)*1000) = 4000/1000;
    // weights = 800000/200000; total_tokens = 17, budget = 170;
    // epochsA = (800000*17*10) div 16000 = 8500 (downsampled vs 10 passes),
    // epochsB = (200000*17*10) div 1000  = 34000 (3.4x upsampled)
    val dir = fixtureDir(
      (1L, "srcA", "a b c d e f g h i j k l m n o p"),
      (2L, "srcB", "x"))
    val got = MixtureWeights.mixtureWeights(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got === Seq(
      ("srcA", 1L, 16L, 800000L, 8500L, false),
      ("srcB", 1L, 1L, 200000L, 34000L, true)))
  }

  test("equal-size sources share one injected term row and get equal weights") {
    val dir = fixtureDir(
      (1L, "srcA", "a b c"), (2L, "srcB", "d e f"), (3L, "srcC", "g h i"))
    assert(MixtureWeights.alphaTermLookup(spark, dir).size === 1)
    val w = MixtureWeights.mixtureWeights(spark, dir)
      .select(col("weight_micro")).as[Long].collect().toSet
    assert(w === Set(333333L))
  }

  test("sf0.001: full driver-side reference-model equivalence") {
    val dir = sf("sf0.001")
    val per = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("d"), sum(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val term = per.map { case (_, _, n) =>
      math.floor(math.pow(n.toDouble, 0.5) * 1000.0).toLong }
    val totalTerm = term.sum
    val totalTokens = per.map(_._3).sum
    val expected = per.zip(term).map { case ((s, d, n), t) =>
      val w = t * 1000000L / totalTerm
      val e = w * totalTokens * 10L / (n * 1000L)
      (s, d, n, w, e, e > 10000L)
    }
    val got = MixtureWeights.mixtureWeights(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(got === expected)
    // global invariants: the floor-div weights sum to 1e6 less at most S
    val wsum = got.map(_._4).sum
    assert(wsum > 1000000L - got.size && wsum <= 1000000L)
    assert(got.forall(_._4 > 0L))
  }

  test("alpha < 1 flattens: weight ratio strictly inside the token ratio") {
    // the operator's purpose — the max/min sampling ratio must be LESS
    // skewed than the raw size ratio (and still ordered the same way)
    val dir = fixtureDir(
      (1L, "big", Seq.fill(400)("w").mkString(" ")),
      (2L, "mid", Seq.fill(100)("w").mkString(" ")),
      (3L, "small", "w w w w"))
    val rows = MixtureWeights.mixtureWeights(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (nBig, wBig) = rows("big"); val (nSmall, wSmall) = rows("small")
    assert(wBig > rows("mid")._2 && rows("mid")._2 > wSmall) // order kept
    val tokenRatio = nBig.toDouble / nSmall
    val weightRatio = wBig.toDouble / wSmall
    assert(weightRatio < tokenRatio / 2,
      s"alpha=0.5 should halve the log-skew: $weightRatio vs $tokenRatio")
    assert(math.abs(weightRatio - math.sqrt(tokenRatio.toDouble)) < 0.5)
  }
}
