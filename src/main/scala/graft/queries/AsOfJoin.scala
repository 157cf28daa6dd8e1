package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Distributed AS-OF join — for each left row, the right row with the
 * greatest timestamp ≤ the left timestamp within the same key (the
 * time-series attribution/enrichment join the task brief names as a
 * Spark-gap operator).
 *
 * Spark-first shape (preference tier (a): composition of built-ins): tag
 * the two inputs, union them, and run ONE per-key window pass —
 * `last(right_payload, ignoreNulls)` over rows `unboundedPreceding →
 * currentRow` ordered by (ts, tag) with right rows first at equal
 * timestamps (inclusive ≤ semantics). Cost = one shuffle on the key + one
 * per-partition sort: no time-range join explosion, no per-key loop, skew
 * behavior identical to any keyed window. The DuckDB oracle is the
 * engine's NATIVE `ASOF LEFT JOIN`, so the gate cross-checks our
 * composition against an independent first-class implementation.
 */
object AsOfJoin {

  /** Left rows enriched with `asof` = struct of `payload` columns from the
    * latest right row at-or-before the left row's `tsCol` per `keyCol`
    * (null when no such row). Left columns pass through unchanged (the
    * name `asof` must be free on the left). Right rows tied on
    * (key, ts) resolve deterministically to the GREATEST payload struct —
    * without that final sort key, `last()` would return whichever tied row
    * the shuffle happened to order last. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payload: Seq[String]): DataFrame = {
    require(!left.columns.contains("asof"),
      "asOf appends an `asof` column; rename the left frame's existing one")
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct.as("p")).schema("p").dataType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType
    val r = right.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(0).as("_tag"), pStruct.as("_p"), lit(null).cast(lType).as("_l"))
    val l = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(1).as("_tag"), lit(null).cast(pType).as("_p"), lStruct.as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_tag").asc, col("_p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("_l.*"), col("_asof").as("asof"))
  }

  /** Hot-key-safe twin of [[asOf]]: identical output, but the per-event
    * window partitions on (key, time-bucket) so no single task owns a hot
    * key's full history. Time is the one correct salt for an as-of join
    * (monotone in the sort order): buckets partition time, so a left row's
    * answer is either the in-bucket window result or — when the bucket has
    * no right row at-or-before it — the greatest right row of any EARLIER
    * bucket, carried in via one window over the per-(key, bucket) summary
    * (rows per key = number of buckets, not events). `tsCol` must be
    * bucketable by long division after `unix_micros`-style casting — here
    * it is bucketed on the raw column's microseconds. */
  def asOfSalted(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payload: Seq[String], bucketUs: Long): DataFrame = {
    require(!left.columns.contains("asof"),
      "asOf appends an `asof` column; rename the left frame's existing one")
    val pStruct = struct(payload.map(col): _*)
    val pType = right.select(pStruct.as("p")).schema("p").dataType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType
    def tb(c: Column): Column =
      floor(unix_micros(c.cast("timestamp")) / bucketUs)
    val r = right.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(0).as("_tag"), pStruct.as("_p"), lit(null).cast(lType).as("_l"))
      .withColumn("_b", tb(col("_ts")))
    val l = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(1).as("_tag"), lit(null).cast(pType).as("_p"), lStruct.as("_l"))
      .withColumn("_b", tb(col("_ts")))
    val u = r.unionByName(l)
    val w = Window.partitionBy(col("_k"), col("_b"))
      .orderBy(col("_ts").asc, col("_tag").asc, col("_p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("_local", last(col("_p"), ignoreNulls = true).over(w))
    // per-(key, bucket) greatest right row, over EVERY bucket present on
    // either side (a left-only bucket still needs the carry-in); running
    // max over EARLIER buckets = the carry for rows whose bucket-local
    // window found nothing. max() skips the nulls of right-less buckets.
    val wB = Window.partitionBy(col("_k")).orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.groupBy(col("_k"), col("_b"))
      .agg(max(when(col("_tag") === 0, struct(col("_ts"), col("_p")))).as("_best"))
      .withColumn("_carry", max(col("_best")).over(wB))
      .select(col("_k").as("_ck"), col("_b").as("_cb"), col("_carry._p").as("_cp"))
    local.filter(col("_tag") === 1)
      .join(carry, col("_k") === col("_ck") && col("_b") === col("_cb"), "left")
      .select(col("_l.*"), coalesce(col("_local"), col("_cp")).as("asof"))
  }

  /** q52: purchase→click attribution over `events` — each purchase joined
    * as-of to the user's latest prior-or-equal click. The gate aggregates
    * are integer-exact and tie-insensitive (equal-timestamp click ties
    * share the same gap): attribution rate and gap statistics in exact
    * microsecond longs, summed as longs before the single double division. */
  def purchaseAttribution(spark: SparkSession, sfDir: String): DataFrame =
    purchaseAttributionVia(spark, sfDir, asOf(_, _, "user_id", "ts", Seq("ts")))

  /** q58: the same attribution through the hot-key-safe salted as-of path
    * (6-hour buckets) — same oracle as q52 because the result is
    * row-identical by construction (HotKeySpec pins the general property;
    * the gate pins it against DuckDB's native ASOF join end-to-end). */
  def purchaseAttributionSalted(spark: SparkSession, sfDir: String): DataFrame =
    purchaseAttributionVia(spark, sfDir,
      asOfSalted(_, _, "user_id", "ts", Seq("ts"), bucketUs = 21600000000L))

  private def purchaseAttributionVia(spark: SparkSession, sfDir: String,
      join: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val joined = join(purchases, clicks)
      .select(col("ts"), col("asof.ts").as("cts"))
      .withColumn("gap_us",
        // events.ts is TIMESTAMP_NTZ; the cast is identity under the
        // session's UTC timezone and unix_micros requires TIMESTAMP
        when(col("cts").isNotNull,
          unix_micros(col("ts").cast("timestamp"))
            - unix_micros(col("cts").cast("timestamp"))))
    joined.agg(
      count(lit(1)).as("n_purchases"),
      count(col("cts")).as("n_attributed"),
      floor(sum(col("gap_us")).cast("double") / count(col("cts")).cast("double"))
        .cast("long").as("avg_gap_us"),
      max(col("gap_us")).as("max_gap_us"))
  }
}
