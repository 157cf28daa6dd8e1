package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** q74 (DSIR importance selection): the cross-engine bucket hash pinned
  * against DuckDB-computed constants, a full scala reference-model
  * equivalence on the sf0.001 corpus, and the <2-token dropout rule. */
class DsirSpec extends SparkTestBase {

  import spark.implicits._

  private val B = 4093L

  /** The reference fold — chars of the string, (h·131 + code) mod 4093. */
  private def refBucket(g: String): Long =
    g.foldLeft(0L)((acc, c) => (acc * 131L + c.toLong) % B)

  test("q74: bucket hash matches DuckDB's list_reduce/unicode fold") {
    // expected values computed in DuckDB:
    //   list_reduce(list_prepend(0, list_transform(string_split(g,''),
    //     c -> unicode(c))), (acc,x) -> (acc*131+x) % 4093)
    val expected = Seq(
      "the quick" -> 3032L,
      "a" -> 97L,
      "hello world xy" -> 135L,
      "ümlaut test" -> 2693L)
    val got = expected.map(_._1).toDF("g")
      .select(col("g"), TextQueries.dsirBucket(col("g")).as("b"))
      .as[(String, Long)].collect().toMap
    for ((g, b) <- expected) {
      assert(got(g) === b, s"spark bucket for '$g'")
      assert(refBucket(g) === b, s"scala ref bucket for '$g'")
    }
  }

  test("q74: census matches a driver-side reference model at sf0.001") {
    val dir = sf("sf0.001")
    // reference model over the collected corpus
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, src, text) =>
        val t = text.split(" ", -1)
        (id, src, t.sliding(2).filter(_.length == 2)
          .map(p => p(0) + " " + p(1)).toArray)
      }
      .filter(_._3.nonEmpty)
    val cb = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val ct = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((_, src, bgs) <- docs; g <- bgs) {
      val b = refBucket(g)
      cb(b) += 1
      if (src == TextQueries.DsirTargetSource) ct(b) += 1
    }
    val nb = cb.values.sum
    val nt = ct.values.sum
    def w(b: Long): Long =
      TextQueries.dsirTermMicro(ct(b), nt) - TextQueries.dsirTermMicro(cb(b), nb)
    val scores = docs
      .map { case (_, src, bgs) => (src, bgs.map(g => w(refBucket(g))).sum) }
    val mean = math.floor(
      scores.map(_._2).sum.toDouble / scores.length).toLong
    val expected = scores
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> ((rows.length.toLong,
          rows.count(_._2 > mean).toLong, rows.map(_._2).sum))
      }
    val got = TextQueries.dsirSelect(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    for ((src, e) <- expected) assert(got(src) === e, s"source $src")
    // the selection must be non-trivial on the gate corpus: some but not
    // all documents more target-like than the pool
    val sel = got.values.map(_._2).sum
    val all = got.values.map(_._1).sum
    assert(sel > 0L && sel < all, s"selected $sel of $all")
    spark.catalog.clearCache()
  }

  test("q74: docs under 2 tokens drop from the census") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-fx").toString
    Seq(
      (0L, "only", "src0"),
      (1L, "two tokens", "src0"),
      (2L, "three tokens here", "src1"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextQueries.dsirSelect(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("src0" -> 1L, "src1" -> 1L))
    spark.catalog.clearCache()
  }
}
