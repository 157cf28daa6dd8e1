package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Sessionization — the canonical event-pipeline operator: per-user events
 * split into sessions at inactivity gaps > 30 min. One keyed window pass
 * (lag → new-session flag → running sum = session index), then per-session
 * and global aggregates; a single shuffle on the user key. The whole
 * derivation is window-function SQL, so the DuckDB oracle replays it
 * operator-for-operator with the same (ts, event_id) tie-break; aggregates
 * stay integer-exact until the one double division.
 *
 * Hot-key hardening: a keyed window serializes each key on one task, so a
 * key holding >1% of a 100 TB stream is a straggler. [[sessionIdsSalted]]
 * is the two-level variant — salt by coarse TIME BUCKET (the salt must be
 * monotone in the window's sort order, so a time prefix is the one correct
 * salt), sessionize within (user, bucket), then stitch boundary sessions
 * with one window over the per-(user, bucket) summary table (rows per user
 * = number of buckets, not events — the straggler is gone). Results are
 * row-identical to the unsalted pass (HotKeySpec).
 */
object Sessionize {

  private[graft] val GapUs = 1800000000L // 30 min

  /** Events with per-user session ids (`sid`, 1-based) — single keyed
    * window. Input must carry (user_id, event_id, tus). */
  def sessionIds(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("tus").asc, col("event_id").asc)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("ns",
      when(lag(col("tus"), 1).over(wOrd).isNull ||
        col("tus") - lag(col("tus"), 1).over(wOrd) > GapUs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(wRun))
      .drop("ns")
  }

  /** Hot-key-safe twin of [[sessionIds]]: identical output, but the
    * per-event window partitions on (user, time-bucket) so no single task
    * owns a hot user's full history.
    *
    * Stitching math: within bucket b a local pass yields `local_sid`
    * (1-based) and `n_local` sessions; `merge(b)` = 1 when the bucket's
    * first event continues the previous existing bucket's last session
    * (gap ≤ G — buckets partition time monotonically, so that previous
    * event IS the global predecessor). Each bucket then contributes
    * `n_local − merge` NEW sessions, and the global id of local session s
    * in bucket b is Σ_{b'<b}(n_local(b') − merge(b')) + s − merge(b). The
    * stitch window runs over the per-(user, bucket) summary only. */
  def sessionIdsSalted(ev: DataFrame, bucketUs: Long): DataFrame = {
    require(bucketUs > GapUs, s"bucket width must exceed the session gap")
    val bucketed = ev.withColumn("__tb", floor(col("tus") / bucketUs))
    val wLoc = Window.partitionBy(col("user_id"), col("__tb"))
      .orderBy(col("tus").asc, col("event_id").asc)
    val wLocRun = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__ns",
      when(lag(col("tus"), 1).over(wLoc).isNull ||
        col("tus") - lag(col("tus"), 1).over(wLoc) > GapUs, 1L).otherwise(0L))
      .withColumn("__lsid", sum(col("__ns")).over(wLocRun))
      .drop("__ns")
    // per-(user, bucket) summary: one row per bucket — the stitch table
    val summary = local.groupBy(col("user_id"), col("__tb"))
      .agg(min(col("tus")).as("__first"), max(col("tus")).as("__last"),
        max(col("__lsid")).as("__nloc"))
    val wB = Window.partitionBy(col("user_id")).orderBy(col("__tb").asc)
    val wBRun = wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stitched = summary.withColumn("__merge",
      when(lag(col("__last"), 1).over(wB).isNotNull &&
        col("__first") - lag(col("__last"), 1).over(wB) <= GapUs, 1L)
        .otherwise(0L))
      .withColumn("__base",
        sum(col("__nloc") - col("__merge")).over(wBRun)
          - (col("__nloc") - col("__merge")))
      .select(col("user_id"), col("__tb"), col("__merge"), col("__base"))
    local.join(stitched, Seq("user_id", "__tb"))
      .withColumn("sid", col("__base") + col("__lsid") - col("__merge"))
      .drop("__tb", "__lsid", "__merge", "__base")
  }

  /** Global statistics over a per-session frame carrying (n_events,
    * dur_us) — shared verbatim by the batch window path (q54/q57) and the
    * Structured Streaming session_window path (q75), so the three gates
    * cannot desynchronize on the stat math. */
  private[graft] def statsFromSessions(sessions: DataFrame): DataFrame =
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("singleton_sessions"),
      floor(sum(col("n_events")).cast("double") * 1000.0
        / count(lit(1)).cast("double")).cast("long").as("avg_events_milli"),
      max(col("dur_us")).as("max_duration_us"),
      floor(sum(col("dur_us")).cast("double") / count(lit(1)).cast("double"))
        .cast("long").as("avg_duration_us"))

  private def statsOver(withSid: DataFrame): DataFrame =
    statsFromSessions(withSid
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("tus")) - min(col("tus"))).as("dur_us")))

  private def eventsWithTus(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))

  /** q54: global session statistics over `events`. */
  def sessionStats(spark: SparkSession, sfDir: String): DataFrame =
    statsOver(sessionIds(eventsWithTus(spark, sfDir)))

  /** Salted-path session statistics (same output as [[sessionStats]]);
    * 6-hour buckets by default. */
  def sessionStatsSalted(spark: SparkSession, sfDir: String,
      bucketUs: Long = 21600000000L): DataFrame =
    statsOver(sessionIdsSalted(eventsWithTus(spark, sfDir), bucketUs))
}
