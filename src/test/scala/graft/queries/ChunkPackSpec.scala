package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q71 (concat-and-chunk packing census): hand-computed cross-bucket
  * fixture (the two-phase prefix sum must stitch bucket offsets exactly),
  * plus an equivalence proof on the driver corpus — the two-phase cumsum
  * must match the naive single-partition global window value-for-value. */
class ChunkPackSpec extends SparkTestBase {

  test("q71: census matches hand arithmetic across bucket boundaries") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk-fx").toString
    import spark.implicits._
    Seq(
      (0L, "a b c", "src_x"),
      (1L, "d e f g h", "src_y"),
      (2L, "i j k l m n", "src_x"),
      (3L, "o p", "src_y"),
      (4L, "q r s t u v w x y z", "src_x"),
      (5L, "z", "src_y"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // bucketDocs=2 → 3 buckets; seqTokens=8; cumulative ends 3,8,14,16,26,27
    val out = TextQueries.chunkPackCensus(spark, dir,
      seqTokens = 8L, bucketDocs = 2L).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // (n_docs, tokens, straddling_docs, doc_seq_spans, max_seq)
    // src_x: doc4 spans tokens [16,26) → seqs 2..3, the one straddler
    assert(out("src_x") === ((3L, 19L, 1L, 4L, 4L)))
    // src_y: docs 1/3/5 all land inside one sequence each
    assert(out("src_y") === ((3L, 8L, 0L, 3L, 4L)))
  }

  test("q71: two-phase prefix sum == naive global window on the driver corpus") {
    val dir = sf("sf0.001")
    val twoPhase = TextQueries.chunkPackCensus(spark, dir).collect()
    // the naive form (single-partition global window — correct, unscalable)
    val naive = graft.queries.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("cum_end",
        sum(col("n_tok")).over(Window.orderBy(col("doc_id"))))
      .withColumn("first_seq",
        floor((col("cum_end") - col("n_tok")) / lit(512L)))
      .withColumn("last_seq", floor((col("cum_end") - 1) / lit(512L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tokens"),
        sum(when(col("last_seq") > col("first_seq"), 1L).otherwise(0L))
          .as("straddling_docs"),
        sum(col("last_seq") - col("first_seq") + 1).as("doc_seq_spans"),
        (max(col("last_seq")) + 1).as("max_seq"))
      .orderBy(col("source"))
      .collect()
    assert(twoPhase.toSeq === naive.toSeq)
    // and the census isn't vacuous: some docs straddle at this scale
    assert(twoPhase.map(_.getLong(3)).sum > 0L)
  }
}
