package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed band/range join — pairs of rows whose timestamps fall within
 * a band of each other per key (the interval-join Spark has no native
 * operator for; the second Spark-gap join the task brief names).
 *
 * Spark-first shape: bucket time into band-width bins and equi-join on
 * (key, bin), replicating ONE side to its three adjacent bins — a pair
 * within the band always lands in adjacent bins, and is matched EXACTLY
 * once (the replicated probe bins are distinct, and only one equals the
 * other side's bin). Shuffle volume is 3× one side on narrow keys; no
 * theta-join, no per-key quadratic task. The exact band predicate runs on
 * the equi-matched candidates only. The DuckDB oracle runs the same query
 * as a native inequality join (IEJoin) — an independent implementation.
 */
object RangeJoin {

  /** q53: per-user pairs of events within 60 s of each other, counted per
    * (earlier-id type, later-id type) — the nearby-event correlation census
    * (pair identity by event_id order, so equal-time pairs are stable). */
  def nearbyEventPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val BandUs = 60000000L // 60 s in microseconds
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("bin", floor(col("tus") / BandUs.toDouble).cast("long"))
    val a = ev.select(col("user_id"), col("bin"),
      col("event_id").as("id_a"), col("event_type").as("type_a"), col("tus").as("ta"))
    val b = ev
      .select(col("user_id"),
        explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("bin"),
        col("event_id").as("id_b"), col("event_type").as("type_b"), col("tus").as("tb"))
    a.join(b, Seq("user_id", "bin"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("ta") - col("tb")) <= BandUs)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("type_a"), col("type_b"))
  }
}
