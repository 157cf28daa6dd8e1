package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.queries.{Sessionize, Tables}

/**
 * q75: sessionization run THROUGH Structured Streaming — the q54 operator
 * as an incremental event-time job, oracle-pinned end-to-end.
 *
 * The plan is the idiomatic streaming form of the 30-min-gap rule:
 * `readStream` (file source, one file per micro-batch) → watermark →
 * `groupBy(session_window(ts, 30 min), user_id)` → append-mode session log
 * (parquet, via foreachBatch) → one batch aggregate over the log for the
 * global stats. Spark's session_window merges two events into one session
 * iff their gap is ≤ the gap duration (verified: events exactly 30 min
 * apart merge, +1 s splits) — the SAME boundary rule as the batch
 * operator's `ts - lag(ts) > GapUs` new-session flag, so this gate shares
 * `SessionizeOracleSql` verbatim with q54/q57 (the twin discipline: one
 * oracle string pins the window path, the salted path, and the streaming
 * path against DuckDB's independent window implementation).
 *
 * Determinism: a static table has no arrival order, so the gate synthesizes
 * one — the events table is sliced into time-RANGE-disjoint parquet files
 * with increasing modification times, and the file source replays them
 * oldest-first. Disjoint ordered slices mean no event is ever late (every
 * new file's events exceed the prior watermark) and no emitted session can
 * retro-merge (an emitted session's end is below the watermark, and every
 * future event is ≥ gap beyond it), so the emitted session log equals the
 * batch session set exactly, for any slice count. A sentinel event at
 * max(ts) + gap + watermark + margin arrives last to push the watermark
 * past every real session's end; the sentinel's own session has nothing
 * behind it to close it, so it never reaches the log (and is filtered
 * defensively anyway).
 *
 * Scale: the slice-writer exists only to synthesize arrival from a static
 * gate table — production points the identical readStream plan at the real
 * landing zone (files/Kafka). Session state is per-user open sessions only
 * (closed sessions are evicted by the watermark — bounded state on an
 * unbounded firehose); the sink is an append-only distributed parquet
 * session log; the stats pass is one batch aggregate over that log. No
 * driver-side collect anywhere in the path.
 */
object StreamSessionize {

  private val Slices = 3
  private val WatermarkDelay = "30 minutes"
  private val WatermarkUs = 1800000000L

  /** State-store partition count for the streaming job. Stateful operators
    * inherit `spark.sql.shuffle.partitions` at query start and every
    * micro-batch pays a per-partition state commit, so the gate sizes the
    * state layout to its key cardinality (150–1500 users) instead of the
    * batch engine's 32 — the same independent-sizing knob a 100 TB run
    * turns UP (state partitions ≈ executor cores, not batch shuffle width). */
  private val StatePartitions = "8"

  /** Progress of the most recent [[runStream]] (test evidence only). */
  @volatile private[graft] var lastRunBatches: Int = 0
  @volatile private[graft] var lastRunStateRows: Long = 0L

  /** Move the single parquet part file of `stageDir` to `dest` and stamp
    * `modMs` so the file source replays slices oldest-first. No part file
    * (empty slice) is fine — the slice is just skipped. */
  private def promotePartFile(stageDir: String, dest: String, modMs: Long): Unit = {
    val parts = Option(new File(stageDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    require(parts.length <= 1, s"expected one part file in $stageDir")
    parts.foreach { p =>
      Files.move(p.toPath, Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
      new File(dest).setLastModified(modMs)
    }
  }

  /** Stream the staged arrivals through session_window and return the
    * per-session log as a DataFrame (user_id, n_events, dur_us). */
  private def runStream(spark: SparkSession, root: String,
      schema: StructType): DataFrame = {
    val sessions = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/in")
      .withWatermark("ts", WatermarkDelay)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"))
      .select(col("user_id"), col("n_events"), col("dur_us"))
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", StatePartitions)
    val q = try {
      sessions.writeStream.outputMode("append")
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(s"$root/sessions")
        }
        .start()
    } finally { spark.conf.set("spark.sql.shuffle.partitions", saved) }
    try {
      q.processAllAvailable()
      // spec-visible evidence that the run was genuinely incremental and
      // stateful (a silent rewrite into one batch job must fail CI)
      val progress = q.recentProgress
      lastRunBatches = progress.count(_.numInputRows > 0)
      lastRunStateRows = progress.flatMap(_.stateOperators.map(_.numRowsUpdated)).sum
    } finally { q.stop() }
    val logSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("n_events", LongType),
      StructField("dur_us", LongType)))
    spark.read.schema(logSchema).parquet(s"$root/sessions")
      .filter(col("user_id") >= 0L)
  }

  /** The streaming session log over `ev` (user_id, event_id, ts, tus) via
    * `slices` time-range micro-batches — exposed for the spec's
    * boundary-straddle fixtures. */
  private[graft] def sessionLog(spark: SparkSession, ev: DataFrame,
      slices: Int = Slices): DataFrame = {
    val root = Files.createTempDirectory("graft-q75-").toString
    new File(s"$root/in").mkdirs()
    val staged = ev.select(col("user_id").cast("long"),
      col("event_id").cast("long"), col("ts").cast("timestamp").as("ts"),
      col("tus").cast("long"))
    val (minTus, maxTus) = {
      val r = staged.agg(min(col("tus")), max(col("tus"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val width = math.max(1L, (maxTus - minTus) / slices + 1)
    val baseMs = System.currentTimeMillis() - (slices + 2) * 4000L
    (0 until slices).foreach { i =>
      staged.filter(floor((col("tus") - lit(minTus)) / lit(width)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
      promotePartFile(s"$root/stage", s"$root/in/slice_$i.parquet",
        baseMs + i * 4000L)
    }
    // sentinel: one far-future event advancing the watermark past every
    // real session end (its own session can never close, so it never
    // reaches the log)
    val sentinelTus = maxTus + Sessionize.GapUs + WatermarkUs + 7200000000L
    import spark.implicits._
    Seq((-1L, -1L, sentinelTus)).toDF("user_id", "event_id", "tus")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("tus")).as("ts"), col("tus"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/stage")
    promotePartFile(s"$root/stage", s"$root/in/slice_sentinel.parquet",
      baseMs + (slices + 1) * 4000L)
    runStream(spark, root, staged.schema)
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
