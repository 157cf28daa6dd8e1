package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.queries.{Sessionize, Tables}

/**
 * q75: sessionization run THROUGH Structured Streaming — the q54 operator
 * as an incremental event-time job, oracle-pinned end-to-end.
 *
 * The plan is the idiomatic streaming form of the 30-min-gap rule:
 * `readStream` (file source, one [[SliceReplay]] slice per micro-batch) →
 * watermark → `groupBy(session_window(ts, 30 min), user_id)` → append-mode
 * session log (parquet, via foreachBatch) → one batch aggregate over the
 * log for the global stats. Spark's session_window merges two events into
 * one session iff their gap is ≤ the gap duration (verified: events
 * exactly 30 min apart merge, +1 s splits) — the SAME boundary rule as the
 * batch operator's `ts - lag(ts) > GapUs` new-session flag, so this gate
 * shares `SessionizeOracleSql` verbatim with q54/q57 (the twin discipline:
 * one oracle string pins the window path, the salted path, and the
 * streaming path against DuckDB's independent window implementation).
 *
 * Determinism: [[SliceReplay]]'s disjoint ordered slices mean no event is
 * ever late and no emitted session can retro-merge (an emitted session's
 * end is below the watermark, and every future event is ≥ gap beyond it),
 * so the emitted session log equals the batch session set exactly, for any
 * slice count. A sentinel event at max(ts) + gap + watermark + margin
 * arrives last to push the watermark past every real session's end; its
 * user id is DATA-DERIVED (max(user_id) + 1 — no reserved value stolen
 * from the key domain, so negative or any other user ids sessionize
 * identically to batch), its session has nothing behind it to close it so
 * it never reaches the log, and it is filtered defensively anyway.
 *
 * Scale: session state is per-user open sessions only (closed sessions are
 * evicted by the watermark — bounded state on an unbounded firehose); the
 * sink is an append-only distributed parquet session log; the stats pass
 * is one batch aggregate over that log. No driver-side collect anywhere.
 */
object StreamSessionize {

  private val Slices = 3
  private val WatermarkDelay = "30 minutes"
  private val WatermarkUs = 1800000000L

  /** State-store layout width for the gate (see SliceReplay.startSized):
    * sized to the gate's resident state (hundreds of rows), not the batch
    * engine's shuffle width — every micro-batch pays one state-store
    * commit PER PARTITION per stateful operator, so oversized layouts are
    * pure fixed cost (interleaved A/B at sf0.1: 8 -> 2 partitions cut the
    * gate 12-29% with identical results). A 100 TB run sizes this up to
    * ~executor cores via SPARK_GRAFT_STATE_PARTITIONS. */
  private def StatePartitions: String =
    sys.props.getOrElse("graft.q75.state.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STATE_PARTITIONS", "2"))

  /** Progress of the most recent [[runStream]] (test evidence only). */
  @volatile private[graft] var lastRunBatches: Int = 0
  @volatile private[graft] var lastRunStateRows: Long = 0L

  /** Stream the staged arrivals through session_window and return the
    * per-session log as a DataFrame (user_id, n_events, dur_us). */
  private def runStream(spark: SparkSession, root: String,
      schema: StructType, sentinelUser: Long): DataFrame = {
    val sessions = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in")
      .withWatermark("ts", WatermarkDelay)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"))
      .select(col("user_id"), col("n_events"), col("dur_us"))
    val q = SliceReplay.startSized(spark, StatePartitions) {
      sessions.writeStream.outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$root/sessions")
        }
        .start()
    }
    val stats = SliceReplay.runToCompletion(q)
    lastRunBatches = stats.batches
    lastRunStateRows = stats.stateRows
    val logSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("n_events", LongType),
      StructField("dur_us", LongType)))
    spark.read.schema(logSchema).parquet(s"$root/sessions")
      .filter(col("user_id") =!= sentinelUser)
  }

  /** The streaming session log over `ev` (user_id, event_id, ts, tus) via
    * `slices` time-range micro-batches — exposed for the spec's
    * boundary-straddle fixtures. */
  private[graft] def sessionLog(spark: SparkSession, ev: DataFrame,
      slices: Int = Slices): DataFrame = {
    val root = SliceReplay.freshRoot("q75")
    val staged = ev.select(col("user_id").cast("long"),
      col("event_id").cast("long"), col("ts").cast("timestamp").as("ts"),
      col("tus").cast("long"))
    // ONE bounds pass feeds both the slice ranges and the sentinel: a
    // far-future event advancing the watermark past every real session
    // end (its own session can never close, so it never reaches the log),
    // owned by the data-derived user max(user_id) + 1
    val b = staged.agg(min(col("tus")), max(col("tus")),
      max(col("user_id"))).head()
    val (minTus, maxTus, sentinelUser) =
      (b.getLong(0), b.getLong(1), b.getLong(2) + 1L)
    val sentinelTus = maxTus + Sessionize.GapUs + WatermarkUs + 7200000000L
    import spark.implicits._
    val sentinel = Seq((sentinelUser, -1L, sentinelTus))
      .toDF("user_id", "event_id", "tus")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tus")).as("ts"), col("tus"))
    val schema = SliceReplay.stage(spark, staged, slices, root,
      Some(sentinel), Some((minTus, maxTus)))
    runStream(spark, root, schema, sentinelUser)
  }

  /** q75: global session statistics — identical output contract (and
    * oracle string) to q54/q57, computed through the streaming path. */
  def streamSessionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    Sessionize.statsFromSessions(sessionLog(spark, ev))
  }
}
