package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** q73 (cross-source overlap matrix): hand-computed trigram fixture —
  * within-source duplicate shingles must count once, sub-trigram docs
  * must drop a source from the matrix entirely on both engines — plus
  * gate-corpus invariants at sf0.001. */
class SourceOverlapSpec extends SparkTestBase {

  import spark.implicits._

  test("q73: hand-computed Jaccard; within-source dups count once; short docs drop out") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ovl-fx").toString
    Seq(
      // src_a: {"w1 w2 w3", "w2 w3 w4"} ∪ {"w1 w2 w3", "w2 w3 w5"} → n=3
      (0L, "w1 w2 w3 w4", "src_a"),
      (3L, "w1 w2 w3 w5", "src_a"),
      // src_b: {"w1 w2 w3", "w2 w3 x"} → n=2, inter=1, union=4
      (1L, "w1 w2 w3 x", "src_b"),
      // src_c: under 3 tokens → no shingles → absent from the matrix
      (2L, "a b", "src_c"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextQueries.sourceOverlap(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "src_a")
    assert(r.getString(1) === "src_b")
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      === ((3L, 2L, 1L, 4L, 250000L)))
    spark.catalog.clearCache()
  }

  test("q73: gate-corpus invariants (sf0.001)") {
    val out = TextQueries.sourceOverlap(spark, sf("sf0.001")).collect()
    // 20 sources, all with >= 1 trigram → the full 190-pair matrix
    assert(out.length === 190)
    for (r <- out) {
      val (na, nb, inter, uni, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(inter >= 0L && inter <= math.min(na, nb))
      assert(uni === na + nb - inter)
      assert(j === inter * 1000000L / uni)
      assert(j >= 0L && j <= 1000000L)
    }
    spark.catalog.clearCache()
  }
}
