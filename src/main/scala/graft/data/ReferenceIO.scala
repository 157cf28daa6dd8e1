package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Reference-compatible ingestion and sink formats (SURVEY.md §2.3):
 *
 * - IO2 coflow JSON: `{"flows":[{"path":[int,...],"traffic":double},...]}`
 *   (/root/reference/Simulation/FlowJson.cs:9-25; sample
 *   /root/reference/data/Spine_1000.json). [[readCoflowJson]] loads it into
 *   a (flow_id, path, key, traffic) DataFrame — key = the path rendered as a
 *   string, the analogue of the reference's per-object flow identity.
 * - IO4 reroute JSON: the same schema plus `origtraffic`
 *   (/root/reference/Simulation/FlowJson.cs:27-40, written at
 *   /root/reference/Simulator/Program.cs:324-330). [[writeRerouteJson]]
 *   emits it for a (path, traffic, origtraffic) DataFrame. Reroute outputs
 *   are top-θ flow subsets (small by construction), so the single-document
 *   shape is written from one final coalesced task.
 * - IO5 TSV metric dump: label + tab-separated metric columns
 *   (/root/reference/Simulator/Program.cs:644-711 `PrintToTxt`).
 */
object ReferenceIO {

  /** Load a reference-format coflow JSON into (flow_id, path, key, traffic). */
  def readCoflowJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(posexplode(col("flows")).as(Seq("flow_id", "f")))
      .select(
        col("flow_id"),
        col("f.path").as("path"),
        concat_ws("-", col("f.path")).as("key"),
        col("f.traffic").as("traffic"))

  /** Write (path: array<int>, traffic, origtraffic) rows as one
    * reference-shaped `{"flows":[...]}` document. */
  def writeRerouteJson(df: DataFrame, outFile: String): Unit = {
    val doc = df
      .select(to_json(struct(col("path"), col("traffic"), col("origtraffic"))).as("j"))
      .agg(concat(lit("{\"flows\":["), concat_ws(",", collect_list(col("j"))), lit("]}"))
        .as("doc"))
      .head().getString(0)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), doc)
  }

  /** Write a metrics DataFrame as the reference's TSV dump shape. */
  def writeMetricsTsv(df: DataFrame, outDir: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true").csv(outDir)
}
