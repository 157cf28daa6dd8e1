package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.SketchFunctions._
import graft.queries.Tables

/**
 * q78: the sketch layer's streaming face as a GATE query — heavy-hitter
 * build (CM + candidate heap, the flagship operator) run through
 * Structured Streaming micro-batches, sharing q02's oracle string
 * verbatim.
 *
 * Why this is exact: the sketch aggregates are mergeable MONOIDS, so a
 * complete-mode streaming aggregation — partial buffers merged into the
 * state store across micro-batches — must produce bit-identically the same
 * sketch as one batch pass, regardless of how the stream is sliced
 * (StreamingSpec pins the bit-parity; this gate pins the VALUES against
 * DuckDB). q02's sizing puts the gate in the deterministic regime
 * (capacity 4096 ≥ user keyspace → no heap trim; ε=1e-4 → collision-free
 * at the verify scale), so the streamed heavy-hitter listing equals exact
 * SQL counts.
 *
 * No watermark, no event-time: a global monoid aggregate is
 * order-insensitive, which is exactly the property that makes the sketch
 * library streaming-ready for free — this gate is the driver-checked proof.
 * Scale: state = ONE sketch buffer (KB–MB), constant in stream length;
 * complete-mode re-emission cost is the sketch size, not the data.
 */
object StreamSketch {

  private val Slices = 3

  /** One global sketch buffer — a single state partition IS the layout. */
  private val StatePartitions = "1"

  /** Progress of the most recent run (test evidence only). */
  @volatile private[graft] var lastRunBatches: Int = 0

  /** q78: top-20 heavy-hitter users via a streamed cm_topk build —
    * identical output contract (and oracle string) to q02. */
  def streamTopKUsers(spark: SparkSession, sfDir: String,
      slices: Int = Slices): DataFrame = {
    val root = SliceReplay.freshRoot("q78")
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("string").as("k"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    val schema = SliceReplay.stage(spark, ev, slices, root)
    val sketch = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in")
      .agg(cm_topk(col("k"), lit(1L), capacity = 4096, eps = 1e-4).as("sk"))
    val q = SliceReplay.startSized(spark, StatePartitions) {
      sketch.writeStream.outputMode("complete")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          // complete mode re-emits the full (one-row) aggregate each
          // micro-batch; last write wins = the final merged sketch
          df.write.mode("overwrite").parquet(s"$root/out")
        }
        .start()
    }
    lastRunBatches = SliceReplay.runToCompletion(q).batches
    spark.read.parquet(s"$root/out")
      .select(explode(topk_entries(col("sk"), 20)).as("e"))
      .select(col("e.key").as("user_id"), col("e.est").as("est_count"))
      .orderBy(desc("est_count"), asc("user_id"))
  }
}
