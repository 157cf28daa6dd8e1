package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's evaluation metrics as reusable DataFrame operators, plus
 * their gate instantiations.
 *
 * - [[relativeErrorOfTop]] ⇔ `RelativeErrorOfTop`
 *   (/root/reference/Simulator/Program.cs:724-730): sort desc by true value,
 *   take the top θ·N keys, average |est−true|/true.
 * - [[elephantCover]] ⇔ `ElephantCover` (/root/reference/Simulator/Program.cs:715-722):
 *   |topK(true) ∩ topK(est)| / K.
 * - [[hhFilter]] ⇔ `HHFilter` (/root/reference/Simulator/Program.cs:732-740):
 *   keys with true > φ·total, average relative error over them.
 *
 * Double-valued metrics are emitted as `floor(x·10⁶)` BIGINTs so the
 * DuckDB-vs-Spark comparison is exact (floor semantics agree; round modes
 * don't).
 *
 * The gate queries instantiate the metrics over two *exact* per-key measures
 * (so the oracle can reproduce them); the sketch-vs-exact instantiations —
 * where `est` comes from a narrow CM — are asserted in ScalaTest at the
 * reference's thresholds (θ ∈ {0.005, 0.01}, φ ∈ {1/1000, 1/2000, 1/10000}).
 */
object MetricQueries {

  private def microFloor(c: Column): Column = floor(c * lit(1000000.0)).cast("long")

  /** Avg relative error |est−true|/true over the top ⌈θ·N⌉ keys by true.
    * Top-k via [[SketchSelect.topK]] — at θ·10⁹ keys a plain
    * `orderBy().limit(k)` funnels ~10⁷ rows through one TakeOrdered heap;
    * the sketch-guided exact selection never converges O(k) rows anywhere. */
  def relativeErrorOfTop(perKey: DataFrame, theta: Double): DataFrame = {
    val n = perKey.count()
    val k = math.ceil(theta * n).toLong.max(1L)
    SketchSelect.topK(perKey, "true_count", "k", k, knownN = n)
      .agg(lit(k).as("k"),
        microFloor(avg(abs(col("est").cast("double") - col("true_count").cast("double")) /
          col("true_count").cast("double"))).as("avg_rel_err_micro"))
  }

  /** Hit rate |topK(true) ∩ topK(est)| / K (both sets sketch-selected). */
  def elephantCover(perKey: DataFrame, theta: Double): DataFrame = {
    val n = perKey.count()
    val k = math.ceil(theta * n).toLong.max(1L)
    val topTrue = SketchSelect.topK(perKey, "true_count", "k", k, knownN = n).select(col("k"))
    val topEst = SketchSelect.topK(perKey, "est", "k", k, knownN = n).select(col("k"))
    val hits = topTrue.join(topEst, Seq("k"), "left_semi").count()
    perKey.sparkSession.range(1).select(
      lit(k).as("k"),
      lit(hits).as("hits"),
      microFloor(lit(hits.toDouble / k)).as("hit_rate_micro"))
  }

  /** Keys with true > total/φ⁻¹; avg relative error over them. φ is passed
    * as its inverse and the threshold divides in-plan, so the float result
    * is bit-identical to the oracle's `total / N` expression. */
  def hhFilter(perKey: DataFrame, phiInverse: Double): DataFrame = {
    val total = perKey.agg(sum(col("true_count"))).head().getLong(0)
    perKey.filter(col("true_count").cast("double") >
      lit(total.toDouble) / lit(phiInverse))
      .agg(count(lit(1)).as("hh_keys"),
        microFloor(avg(abs(col("est").cast("double") - col("true_count").cast("double")) /
          col("true_count").cast("double"))).as("avg_rel_err_micro"))
  }

  // ---- gate instantiations (both measures exact → oracle-reproducible)

  /** Per-user (true=all events, est=click events) — metric machinery input.
    * Cached: the sketch-guided selection makes several cheap passes over the
    * per-key aggregate; caching it re-aggregates the raw events only once. */
  private def eventsPerUser(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id").cast("string").as("k"))
      .agg(count(lit(1)).as("true_count"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("est"))
      .cache()

  /** q11: RelativeErrorOfTop at θ=0.05 over events per-user measures. */
  def relErrTopGate(spark: SparkSession, sfDir: String): DataFrame =
    relativeErrorOfTop(eventsPerUser(spark, sfDir), 0.05)

  /** q12: ElephantCover at θ=0.01 over lineitem per-partkey
    * (true=row count, est=integral Σ l_quantity). */
  def elephantCoverGate(spark: SparkSession, sfDir: String): DataFrame = {
    val perKey = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").cast("string").as("k"))
      .agg(count(lit(1)).as("true_count"),
        sum(col("l_quantity")).cast("long").as("est"))
      .cache()
    elephantCover(perKey, 0.01)
  }

  /** q13: HHFilter at φ=1/200 over events per-user measures. */
  def hhFilterGate(spark: SparkSession, sfDir: String): DataFrame =
    hhFilter(eventsPerUser(spark, sfDir), 200.0)

  /** q36: the reference's link-load aggregation statistics (Q6,
    * /root/reference/Simulation/Topology.cs:52-59 + max/avg/stddev folds at
    * /root/reference/Simulator/Program.cs:428-431): per-supplier load from
    * the top-order flows, then max / avg / stddev over loads. Stddev uses
    * the explicit two-pass formula over exact integral sums so both engines
    * compute bit-identical doubles (built-in stddev implementations differ
    * in accumulation order). */
  def linkLoadStats(spark: SparkSession, sfDir: String): DataFrame = {
    val loads = rerouteTopGateAll(spark, sfDir)
    loads.agg(
      count(lit(1)).as("n_links"),
      max(col("load")).as("max_load"),
      floor(sum(col("load")).cast("double") / count(lit(1)).cast("double")
        * lit(1000000.0)).cast("long").as("avg_load_micro"),
      floor(
        sqrt((sum(col("load") * col("load")).cast("double")
          - sum(col("load")).cast("double") * sum(col("load")).cast("double")
            / count(lit(1)).cast("double"))
          / (count(lit(1)).cast("double") - lit(1.0)))
        * lit(1000000.0)).cast("long").as("stddev_load_micro"))
  }

  /** Per-supplier loads from the top-1% orders (shared by q14/q36).
    * Top-order selection via [[SketchSelect.topK]]; the selected 1% is still
    * small relative to lineitem, so the join stays broadcast. */
  private def rerouteTopGateAll(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val nOrders = ord.count()
    val k = math.ceil(0.01 * nOrders).toLong.max(1L)
    val top = SketchSelect.topK(
      ord.select(col("o_orderkey"), col("o_totalprice")), "o_totalprice", "o_orderkey", k,
      knownN = nOrders)
      .select(col("o_orderkey"))
    li.join(broadcast(top), li("l_orderkey") === top("o_orderkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("load"))
  }

  /** q44: the reference's two-scenario RerouteEval comparison
    * (/root/reference/Simulator/Program.cs:620-642 — max link load of the
    * ORIGINAL routing vs after the heavy flows are rerouted): per-supplier
    * loads over all orders vs with the top-1% orders removed (the rerouted
    * traffic), reporting both maxima and the relative reduction. */
  def rerouteDeltaGate(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val nOrders = ord.count()
    val k = math.ceil(0.01 * nOrders).toLong.max(1L)
    val top = SketchSelect.topK(
      ord.select(col("o_orderkey"), col("o_totalprice")), "o_totalprice", "o_orderkey", k,
      knownN = nOrders)
      .select(col("o_orderkey"))
    def maxLoad(rows: DataFrame): DataFrame = rows
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("long").as("load"))
      .agg(max(col("load")).as("m"))
    val before = maxLoad(li).select(col("m").as("max_load_before"))
    val after = maxLoad(li.join(broadcast(top),
        li("l_orderkey") === top("o_orderkey"), "left_anti"))
      .select(col("m").as("max_load_after"))
    before.crossJoin(after).select(
      col("max_load_before"), col("max_load_after"),
      floor((col("max_load_before").cast("double") - col("max_load_after").cast("double"))
        / col("max_load_before").cast("double") * lit(1000000.0))
        .cast("long").as("reduction_micro"))
  }

  /** q46: RelativeError2 (Q4, /root/reference/Simulator/Program.cs:361-376)
    * as a runnable gate operator: the Q1 metric where the estimate is the
    * MAX over several sketches — composed exactly as the reference does,
    * metric ∘ max-combine, by feeding q43's HalfSketch greatest-of-halves
    * estimates into [[relativeErrorOfTop]]. Collision-free regime at gate
    * scale ⇒ est is exact ⇒ the oracle reproduces the metric
    * (deterministically 0) and independently checks the k/selection/avg
    * plumbing — the same discipline as q03/q40's zero-violation bounds. */
  def relErr2Gate(spark: SparkSession, sfDir: String): DataFrame = {
    val est = SketchQueries.halfSketchMax(spark, sfDir)
    val truth = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("true_count"))
    val perKey = truth.join(est, Seq("event_type")).select(
      col("event_type").as("k"), col("true_count"), col("est_count").as("est"))
      .cache() // the selection makes several passes; build the sketches once
    relativeErrorOfTop(perKey, 0.4)
  }

  /** q14: the reference's heavy-hitter → downstream-action pipeline shape
    * (/root/reference/Simulator/Program.cs:769-785 → link-load aggregation
    * /root/reference/Simulation/Topology.cs:52-59): take the top-1% orders
    * by value, explode their lineitems, aggregate per-supplier load, report
    * the 10 most loaded suppliers. Top-order set is tiny → broadcast join. */
  def rerouteTopGate(spark: SparkSession, sfDir: String): DataFrame =
    rerouteTopGateAll(spark, sfDir)
      .orderBy(desc("load"), asc("l_suppkey"))
      .limit(10)
}
