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

  /** Read a JSONL documents dump (one or more paths; explicit literal
    * paths rather than a brace glob, whose un-expanded form Spark's
    * streaming-sink metadata probe stats and noisily warns about) with
    * the explicit schema; malformed lines survive as non-null
    * [[CorruptCol]] instead of failing the scan. */
  def readDocumentsJsonl(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(DocumentsSchema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)

  /** Well-formedness predicate: the line parsed AND every schema field
    * is present with its declared type (the interchange contract — the
    * documents table has no optional columns).
    *
    * Requiring EVERY field non-null is also what makes corruption mean
    * the same thing in every plan: PERMISSIVE corruption is judged
    * against the columns the plan actually parses, so a predicate that
    * checked only `_corrupt_record` would let column pruning skip a
    * type-corrupt unreferenced field — the row would count as
    * well-formed in a bare `.count()` yet vanish from a full-width
    * materialization. Referencing all five fields forces the full parse
    * into any plan built on this predicate (a non-foldable reference,
    * unlike a constant-true anchor, which Catalyst would eliminate and
    * re-prune). It also satisfies Spark's rule that raw-file plans may
    * not reference ONLY the internal corrupt column. */
  private def wellFormed: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.col
    DocumentsSchema.fieldNames.foldLeft(col(CorruptCol).isNull) {
      (acc, f) => acc && col(f).isNotNull
    }
  }

  /** The well-formed rows of a JSONL read, in table column order. */
  def documentsRows(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.filter(wellFormed)
      .select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
  }

  /** Count of malformed/incomplete lines in a JSONL read — ONE full-width
    * pass (a conditional count over the same [[wellFormed]] predicate
    * [[documentsRows]] filters on), not a total-minus-rows double scan. */
  def corruptCount(df: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    df.agg(count(when(!wellFormed, lit(1)))).head().getLong(0)
  }

  /** Deterministic on-disk location of the q68 JSONL round-trip artifact
    * for a given source sf directory — under the build's target/ so the
    * gate never writes outside the repo; absolute so the DuckDB oracle
    * (which receives this path as an injected literal) reads the same
    * files regardless of its own working directory. */
  def jsonlGatePath(sfDir: String): String =
    new java.io.File(
      "target/q68_jsonl/" + sfDir.replaceAll("[^A-Za-z0-9._-]", "_"))
      .getAbsolutePath

  /** q68: the JSONL interchange gate — write the documents table out as
    * JSONL, read it back through the explicit-schema PERMISSIVE reader,
    * and census well-formed vs contract-broken lines per source block.
    *
    * Corruption is PLANTED deterministically (the q67 fixture
    * discipline): every doc_id ≡ 0 (mod 7) is written as a VALID JSON
    * line that omits the `text` and `n_chars` fields — the
    * missing-required-field face of the [[wellFormed]] contract, which
    * both engines can count identically (explicit-schema readers resolve
    * a missing field to NULL in Spark and DuckDB alike). The
    * syntactically-malformed face (`_corrupt_record` non-null) stays
    * spec-covered in CorpusIOSpec: DuckDB's `read_json` has no corrupt-
    * record channel, so unparseable lines can't cross the oracle, only
    * contract-broken ones. The oracle reads THE SAME FILES with its own
    * JSON reader — the round-trip (writer layout, reader schema,
    * missing-field semantics, census arithmetic) is what's checked.
    *
    * Scale shape: one write pass, one read pass, groupBy(source)
    * partial-agg census — no joins, nothing wider than the text column
    * moves, and the corruption census shares the single read (the
    * [[corruptCount]] one-pass discipline). */
  def jsonlCensusGate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = jsonlGatePath(sfDir)
    val docs = graft.queries.Tables.documents(spark, sfDir)
      .filter(DocumentsSchema.fieldNames.map(col(_).isNotNull).reduce(_ && _))
    writeDocumentsJsonl(docs.filter(col("doc_id") % 7 =!= 0), s"$base/clean")
    docs.filter(col("doc_id") % 7 === 0)
      .select(to_json(struct(col("doc_id"), col("lang"), col("source")))
        .as("value"))
      .write.mode("overwrite").text(s"$base/broken")
    val back = readDocumentsJsonl(spark, s"$base/clean", s"$base/broken")
    back.groupBy(col("source"))
      .agg(
        count(when(wellFormed, lit(1))).as("n_rows"),
        count(when(!wellFormed, lit(1))).as("n_corrupt"),
        coalesce(sum(when(wellFormed, col("n_chars"))), lit(0L))
          .as("total_chars"))
      .orderBy(col("source"))
  }

  /** Write documents rows as JSONL with stable column order. A null in
    * ANY field fails LOUDLY (raise_error): the JSON writer drops null
    * fields, so such a row would read back as corrupt under the reader's
    * all-fields-required [[wellFormed]] contract — the writer enforces
    * the SAME contract, keeping round-trips lossless by construction.
    * (The guard is embedded in the emitted doc_id column: a detached
    * guard column would be pruned away unevaluated.) */
  def writeDocumentsJsonl(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    val allNonNull = DocumentsSchema.fieldNames.map(col(_).isNotNull)
      .reduce(_ && _)
    df.select(DocumentsSchema.fieldNames.map(col).toSeq: _*)
      .withColumn("doc_id",
        when(allNonNull, col("doc_id"))
          .otherwise(raise_error(concat(
            lit("writeDocumentsJsonl: all fields are required; " +
              "null field in row doc_id="),
            coalesce(col("doc_id").cast("string"), lit("null"))))
            .cast("long")))
      .write.mode("overwrite").json(path)
  }
}
