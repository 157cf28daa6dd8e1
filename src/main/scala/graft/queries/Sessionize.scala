package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Sessionization — the canonical event-pipeline operator: per-user events
 * split into sessions at inactivity gaps > 30 min. One keyed window pass
 * (lag → new-session flag → running sum = session index), then per-session
 * and global aggregates; a single shuffle on the user key, identical skew
 * behavior to any keyed window. The whole derivation is window-function
 * SQL, so the DuckDB oracle replays it operator-for-operator with the same
 * (ts, event_id) tie-break; aggregates stay integer-exact until the one
 * double division.
 */
object Sessionize {

  private val GapUs = 1800000000L // 30 min

  /** q54: global session statistics over `events`. */
  def sessionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("tus").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = ev.withColumn("ns",
      when(lag(col("tus"), 1).over(wOrd).isNull ||
        col("tus") - lag(col("tus"), 1).over(wOrd) > GapUs, 1L).otherwise(0L))
    val sessions = flagged
      .withColumn("sid", sum(col("ns")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"))
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("singleton_sessions"),
      floor(sum(col("n_events")).cast("double") * 1000.0
        / count(lit(1)).cast("double")).cast("long").as("avg_events_milli"),
      max(col("dur_us")).as("max_duration_us"),
      floor(sum(col("dur_us")).cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("avg_duration_us"))
  }
}
