package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Classic OLAP aggregates over the TPC-H-shaped tables — the "plain
 * analytics" face of the engine next to the sketch/curation stacks.
 */
object OlapQueries {

  /** TPC-H Q1's delta-90 cutoff (1998-09-02 UTC), as epoch µs so the
    * filter is timezone-parse-free in BOTH engines (Spark `unix_micros`
    * vs DuckDB `epoch_us` — the established q52/q85 discipline). */
  private val ShipCutoffUs = 904694400000000L

  /** q100: the TPC-H Q1 pricing summary, extended with ROLLUP — one pass
    * over lineitem producing the per-(returnflag, linestatus) groups PLUS
    * the per-flag subtotals and the grand total (grouping-sets support,
    * exercised through Spark's `rollup` and DuckDB's `GROUP BY ROLLUP`).
    *
    * Cross-engine exactness: every money term is floored to a micro
    * BIGINT at the ROW — ⌊price·(1−disc)·(1+tax)·10⁶⌋ is the same IEEE
    * double product in both engines — and all sums/averages downstream
    * are bigint adds and truncating integral division (the q65/q81
    * discipline). Rollup NULL keys are mapped to '<all>' AFTER grouping
    * (the flag domains are non-null single chars, so the mapping is
    * unambiguous).
    *
    * Scale shape: ONE scan with the filter and all row terms codegen'd,
    * one partial-aggregating rollup (map-side combine over ≤ G·3 groups),
    * no joins, no windows — the canonical 100 TB reporting aggregate. */
  def pricingRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(unix_micros(col("l_shipdate").cast("timestamp")) <= lit(ShipCutoffUs))
      .select(col("l_returnflag").as("rf0"), col("l_linestatus").as("ls0"),
        floor(col("l_quantity") * lit(1000000L)).cast("long").as("qty_micro"),
        floor(col("l_extendedprice") * lit(1000000L)).cast("long")
          .as("base_micro"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(1000000L)).cast("long").as("disc_micro"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")) * lit(1000000L)).cast("long")
          .as("charge_micro"),
        floor(col("l_discount") * lit(1000000L)).cast("long")
          .as("discount_micro"))
      .rollup(col("rf0"), col("ls0"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("qty_micro")).as("sum_qty_micro"),
        sum(col("base_micro")).as("sum_base_micro"),
        sum(col("disc_micro")).as("sum_disc_micro"),
        sum(col("charge_micro")).as("sum_charge_micro"),
        sum(col("discount_micro")).as("sum_discount_micro"))
      .select(coalesce(col("rf0"), lit("<all>")).as("rf"),
        coalesce(col("ls0"), lit("<all>")).as("ls"),
        col("n_rows"), col("sum_qty_micro"), col("sum_base_micro"),
        col("sum_disc_micro"), col("sum_charge_micro"),
        expr("sum_qty_micro div n_rows").as("avg_qty_micro"),
        expr("sum_base_micro div n_rows").as("avg_price_micro"),
        expr("sum_discount_micro div n_rows").as("avg_disc_micro"))
      .orderBy(col("rf"), col("ls"))
}
