package graft.data

import graft.SparkTestBase
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** JSONL interchange: lossless round-trip of the documents table, explicit
  * schema (no inference pass), and corrupt-line quarantine. */
class CorpusIOSpec extends SparkTestBase {

  test("documents round-trip parquet -> jsonl -> rows is lossless") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    CorpusIO.writeDocumentsJsonl(docs, s"$dir/docs.jsonl")
    val back = CorpusIO.readDocumentsJsonl(spark, s"$dir/docs.jsonl")
    assert(CorpusIO.corruptCount(back) === 0L)
    val rows = CorpusIO.documentsRows(back)
    assert(rows.schema === docs.select(
      CorpusIO.DocumentsSchema.fieldNames.map(col).toSeq: _*).schema)
    // value-lossless: identical row multisets via per-row hash aggregation
    def sig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df
        .select(xxhash64(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(sig(rows) === sig(docs))
  }

  test("malformed lines are quarantined, not fatal, and well-formed survive") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    val p = java.nio.file.Paths.get(dir, "mixed.jsonl")
    java.nio.file.Files.writeString(p,
      """{"doc_id":1,"text":"alpha beta","lang":"en","source":"s0","n_chars":10}
        |this line is not json
        |{"doc_id":2,"text":"gamma","lang":"en","source":"s0","n_chars":5}
        |""".stripMargin)
    val back = CorpusIO.readDocumentsJsonl(spark, p.toString)
    assert(CorpusIO.corruptCount(back) === 1L)
    val rows = CorpusIO.documentsRows(back)
    assert(rows.count() === 2L)
    assert(rows.agg(sum("doc_id")).head().getLong(0) === 3L)
  }
}
