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
    // value-lossless: identical row MULTISETS — sorted per-row hashes, so
    // even-multiplicity duplicate/drop pairs can't cancel as they would
    // under an xor/sum signature
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select(xxhash64(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars")).as("h")).collect().map(_.getLong(0)).sorted.toSeq
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

  test("partial corruption counts the same in narrow and wide plans") {
    // n_chars carries a string: only a full-width parse flags the row.
    // The wellFormed predicate anchors every plan to the full parse, so
    // corruptCount, documentsRows.count() and a materialized collect all
    // agree — the row set must not depend on downstream projection.
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-part").toString
    val p = java.nio.file.Paths.get(dir, "partial.jsonl")
    java.nio.file.Files.writeString(p,
      """{"doc_id":1,"text":"good","lang":"en","source":"s0","n_chars":4}
        |{"doc_id":7,"text":"bad","lang":"en","source":"s0","n_chars":"oops"}
        |""".stripMargin)
    val back = CorpusIO.readDocumentsJsonl(spark, p.toString)
    assert(CorpusIO.corruptCount(back) === 1L)
    val rows = CorpusIO.documentsRows(back)
    assert(rows.count() === 1L)                       // narrow plan
    assert(rows.select("doc_id").collect().map(_.getLong(0)).toSeq
      === Seq(1L))                                    // projected plan
    assert(rows.collect().length === 1)               // full materialization
  }

  test("q68 jsonl census gate: planted corruption counted, clean chars conserved") {
    val sfDir = sf("sf0.001")
    val census = CorpusIO.jsonlCensusGate(spark, sfDir).collect()
    // independent expectation straight from the parquet table: doc_id % 7
    // == 0 rows were written text/n_chars-less (contract-corrupt), the
    // rest must round-trip with their chars intact
    val expect = Tables.documents(spark, sfDir)
      .groupBy(col("source"))
      .agg(
        sum(when(col("doc_id") % 7 =!= 0, 1L).otherwise(0L)).as("n_rows"),
        sum(when(col("doc_id") % 7 === 0, 1L).otherwise(0L)).as("n_corrupt"),
        coalesce(sum(when(col("doc_id") % 7 =!= 0, col("n_chars"))), lit(0L))
          .as("total_chars"))
      .orderBy(col("source")).collect()
    assert(census.length === expect.length)
    census.zip(expect).foreach { case (c, e) =>
      assert(c.getString(0) === e.getString(0))
      assert(c.getLong(1) === e.getLong(1), s"n_rows @ ${c.getString(0)}")
      assert(c.getLong(2) === e.getLong(2), s"n_corrupt @ ${c.getString(0)}")
      assert(c.getLong(3) === e.getLong(3), s"total_chars @ ${c.getString(0)}")
    }
    assert(census.map(_.getLong(2)).sum > 0L, "fixture must plant some corruption")
  }

  test("writer fails loudly on ANY null field instead of emitting a corrupt line") {
    import spark.implicits._
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-null").toString
    // null key field
    val badId = Seq((java.lang.Long.valueOf(1L), "t", "en", "s0", java.lang.Long.valueOf(1L)),
      (null.asInstanceOf[java.lang.Long], "u", "en", "s0", java.lang.Long.valueOf(1L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e1 = intercept[Exception] {
      CorpusIO.writeDocumentsJsonl(badId, s"$dir/bad1.jsonl")
    }
    assert(chain(e1).exists(_.contains("all fields are required")), chain(e1).mkString(" | "))
    // null NON-key field: ignoreNullFields would silently drop the key
    // from the JSON line and the reader would quarantine the row — the
    // writer must refuse it up front, not just a null doc_id
    val badText = Seq((java.lang.Long.valueOf(7L), null.asInstanceOf[String],
      "en", "s0", java.lang.Long.valueOf(0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e2 = intercept[Exception] {
      CorpusIO.writeDocumentsJsonl(badText, s"$dir/bad2.jsonl")
    }
    assert(chain(e2).exists(_.contains("doc_id=7")), chain(e2).mkString(" | "))
  }
}
