package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/**
 * JSONL interchange for the documents table — the format every public
 * text-corpus release actually ships (one JSON object per line, splittable
 * when uncompressed, streamable). Parquet stays the PRODUCTION format
 * (columnar pruning + predicate pushdown, which JSON scans cannot offer);
 * JSONL is the ingest/egress edge of the pipeline.
 *
 * Scale posture:
 *  - the read takes an EXPLICIT schema — schema inference scans the data
 *    once before the real read (2× IO at 100 TB) and silently widens
 *    types on dirty rows;
 *  - `columnNameOfCorruptRecord` routes malformed lines into a
 *    `_corrupt_record` column under PERMISSIVE mode instead of killing
 *    the job on one bad line (real corpus dumps always carry a few) —
 *    callers decide whether to count, quarantine, or drop them;
 *  - the writer lays out one object per line with stable column order,
 *    so downstream line-oriented tooling (dedup by line hash, sharding
 *    by byte range) behaves deterministically.
 */
object CorpusIO {

  /** The documents-table schema (TESTDATA.md), explicit for JSON IO. */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val CorruptCol = "_corrupt_record"

  /** Read a JSONL documents dump with the explicit schema; malformed
    * lines survive as non-null [[CorruptCol]] instead of failing the
    * scan. */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(DocumentsSchema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** The well-formed rows of a JSONL read, in table column order.
    * Well-formed = the line parsed AND carries the required `doc_id` key
    * (the interchange contract: a document without an id is unusable
    * downstream). The doc_id predicate also keeps every counting query
    * legal on the raw file scan: Spark refuses plans whose referenced
    * columns prune down to ONLY the internal corrupt column (the pruning
    * would skip the very parse that populates it), and
    * `documentsRows(df).count()` would do exactly that on a
    * corrupt-only filter. */
  def documentsRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.filter(col(CorruptCol).isNull && col("doc_id").isNotNull)
      .select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
  }

  /** Count of malformed/id-less lines in a JSONL read: total minus
    * well-formed — two count jobs, no caching. */
  def corruptCount(df: DataFrame): Long =
    df.count() - documentsRows(df).count()

  /** Write documents rows as JSONL with stable column order. */
  def writeDocumentsJsonl(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
      .write.mode("overwrite").json(path)
  }
}
