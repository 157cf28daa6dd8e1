package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Event-sequence and co-occurrence analytics — the product-analytics face
 * of the engine next to the sessionize family: ordered conversion funnels
 * over the event stream and market-basket pair mining over order lines.
 */
object AnalyticsQueries {

  /** q110's per-stage conversion horizon (24 h in µs). */
  private val FunnelHorizonUs = 86400000000L

  /** q110: the ordered conversion funnel view → click → purchase — each
    * stage is the FIRST qualifying event at or after the previous stage's
    * timestamp and within the 24 h horizon (first-touch semantics, the
    * industry-standard funnel rule). Horizons make the stages genuinely
    * selective on this corpus (150 → 60 → 25 users at sf0.01) instead of
    * saturating.
    *
    * Plan: three keyed censuses, each ONE groupBy(user) aggregate over a
    * filtered scan joined to the previous stage's (user, ts) frame — all
    * joins and groupBys share the user_id key, so after the first
    * exchange the stages stay co-partitioned (no re-shuffle under AQE).
    * Every timestamp is epoch µs; lags sum exactly in bigint. Full value
    * oracle: DuckDB replays the same three-CTE chain. */
  def conversionFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(
      col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    def stage(prev: DataFrame, prevCol: String, et: String, out: String) =
      ev.filter(col("event_type") === et)
        .join(prev, "user_id")
        .filter(col("us") >= col(prevCol) &&
          col("us") <= col(prevCol) + lit(FunnelHorizonUs))
        .groupBy(col("user_id")).agg(min(col("us")).as(out))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
    val t2 = stage(t1, "t1", "click", "t2")
    val t3 = stage(t2, "t2", "purchase", "t3")
    ev.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(t1.agg(count(lit(1)).as("n_viewed")))
      .crossJoin(t2.agg(count(lit(1)).as("n_clicked")))
      .crossJoin(t3.agg(count(lit(1)).as("n_purchased")))
      .crossJoin(t3.join(t1, "user_id")
        .agg(coalesce(sum(col("t3") - col("t1")), lit(0L)).as("total_lag_us")))
  }

  /** q111: frequent co-occurring part pairs within orders (the A-priori
    * support census, Agrawal & Srikant 1994) — which parts sell together.
    *
    * Scale shape: pair enumeration NEVER self-joins the line table —
    * one groupBy(order) collects each order's distinct sorted parts
    * (basket size is bounded by lines-per-order, ~7 here, so the arrays
    * are tiny by construction), then the C(m,2) pairs expand IN-PLAN via
    * a nested HOF transform: one shuffle total, fan-out bounded per row,
    * versus the self-join's two shuffles of the full table. Census +
    * support floor + TakeOrdered(20) with a total tie-break. */
  def frequentPartPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val baskets = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
    baskets
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |    y -> struct(x AS part_a, y AS part_b))))""".stripMargin)).as("pr"))
      .select(col("pr.part_a"), col("pr.part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .orderBy(desc("support"), asc("part_a"), asc("part_b"))
      .limit(20)
  }

  // ---- q113: RFM quartile segmentation ----

  /** q113: RFM customer segmentation (Hughes' recency/frequency/monetary
    * scoring) — per-user purchase census, each axis bucketed into
    * QUARTILES whose boundaries come from ONE KLL aggregate over the
    * three axes: the sketch layer feeding a classic analytics operator.
    * Quartiles sit exactly on the q99-verified i/8 rank-rule grid, so at
    * the gate k the boundaries ARE `quantile_disc`'s — the whole 4³-cell
    * census is a full value oracle, not a bound verdict. Monetary sums
    * are micro-floored at the row (the q100 discipline); recency derives
    * from the corpus's own max purchase time, all epoch-µs bigints.
    *
    * Scale shape: one keyed census shuffle (the per-user RFM frame,
    * persisted for its two consumers), one O(sketch)-state aggregate, a
    * 9-value driver collect, then one codegen bucketing pass into a
    * ≤64-group census. No window, no sort, no join on the data path —
    * at production k the buckets degrade gracefully under the 2/k rank
    * bound (q64's audited envelope). */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.agg.SketchFunctions.kll_sketch
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === lit("purchase"))
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        floor(col("value") * lit(1000000L)).cast("long").as("v"))
    val rfm = p.groupBy(col("user_id"))
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("f"),
        sum(col("v")).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = rfm.agg(max(col("last_us"))).head().getLong(0)
    val r = rfm.select((lit(mx) - col("last_us")).as("r_us"), col("f"), col("m"))
    val skRow = r.agg(
      kll_sketch(col("r_us").cast("double"), k = 65536).as("skr"),
      kll_sketch(col("f").cast("double"), k = 65536).as("skf"),
      kll_sketch(col("m").cast("double"), k = 65536).as("skm")).head()
    def quartiles(name: String): Seq[Long] = {
      val sk = graft.sketch.KllSketch.deserialize(skRow.getAs[Array[Byte]](name))
      Seq(0.25, 0.5, 0.75).map(q => sk.quantile(q).toLong)
    }
    def bucket(x: org.apache.spark.sql.Column, bs: Seq[Long]) =
      bs.foldLeft(lit(1L)) { (acc, b) =>
        acc + when(x > lit(b), 1L).otherwise(0L)
      }
    r.select(
      bucket(col("r_us"), quartiles("skr")).as("rb"),
      bucket(col("f"), quartiles("skf")).as("fb"),
      bucket(col("m"), quartiles("skm")).as("mb"))
      .groupBy(col("rb"), col("fb"), col("mb"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("rb"), col("fb"), col("mb"))
  }
}
