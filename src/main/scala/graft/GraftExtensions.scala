package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.agg.{CmQuerySketch, CmTotalSketch, HllCountSketch, KllQuantileSketch, NativeCountMinAgg, NativeHllAgg, NativeTopKAgg, TopKEntriesSketch}
import graft.sketch.CountMinSketch

/**
 * SparkSessionExtensions entry point — the idiomatic spark-submit wiring
 * for the native sketch surface:
 *
 * {{{
 * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * injects the SQL functions
 *  - `cm_sketch_fast(key, weight[, eps[, delta[, seed]]])` → BINARY
 *    (the [[graft.agg.NativeCountMinAgg]] build aggregate; eps/delta/seed
 *    as foldable numeric literals),
 *  - `topk_sketch_fast(key, weight[, capacity[, eps[, delta[, seed]]]])` →
 *    BINARY (the [[graft.agg.NativeTopKAgg]] heavy-hitter build),
 *  - `cm_query_sketch(sketch, key)` → BIGINT point estimate,
 *  - `cm_total_sketch(sketch)` → BIGINT total weight N,
 *  - `topk_entries_sketch(sketch, k)` → ARRAY<STRUCT<key, est>> listing,
 * so pure-SQL users (thriftserver, SQL files) get the sketch library with
 * no Scala imports. [[GraftExtensions.install]] registers the same
 * builders into an already-running session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functionDescriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def foldNum(e: Expression, name: String): Double = {
    require(e.foldable, s"cm_sketch_fast: $name must be a literal")
    e.eval() match {
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"cm_sketch_fast: $name must be numeric, got $other")
    }
  }

  private def buildCmSketchFast(exprs: Seq[Expression]): Expression = {
    require(exprs.length >= 2 && exprs.length <= 5,
      "usage: cm_sketch_fast(key, weight[, eps[, delta[, seed]]])")
    val eps = if (exprs.length > 2) foldNum(exprs(2), "eps") else 1e-4
    val delta = if (exprs.length > 3) foldNum(exprs(3), "delta") else 0.01
    val seed = if (exprs.length > 4) foldNum(exprs(4), "seed").toLong
      else CountMinSketch.DefaultSeed
    NativeCountMinAgg(exprs.head, exprs(1), eps, delta, seed)
  }

  /** (identifier, info, builder) triples — shared by the extensions path
    * (injectFunction at session build) and [[install]] (live session). */
  val functionDescriptions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cm_sketch_fast"),
      new ExpressionInfo(classOf[NativeCountMinAgg].getName, "cm_sketch_fast"),
      buildCmSketchFast _),
    (FunctionIdentifier("cm_query_sketch"),
      new ExpressionInfo(classOf[CmQuerySketch].getName, "cm_query_sketch"),
      exprs => {
        require(exprs.length == 2, "usage: cm_query_sketch(sketch, key)")
        CmQuerySketch(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("cm_total_sketch"),
      new ExpressionInfo(classOf[CmTotalSketch].getName, "cm_total_sketch"),
      exprs => {
        require(exprs.length == 1, "usage: cm_total_sketch(sketch)")
        CmTotalSketch(exprs.head)
      }),
    (FunctionIdentifier("hll_count_sketch"),
      new ExpressionInfo(classOf[HllCountSketch].getName, "hll_count_sketch"),
      exprs => {
        require(exprs.length == 1, "usage: hll_count_sketch(sketch)")
        HllCountSketch(exprs.head)
      }),
    (FunctionIdentifier("kll_quantile_sketch"),
      new ExpressionInfo(classOf[KllQuantileSketch].getName, "kll_quantile_sketch"),
      exprs => {
        require(exprs.length == 2, "usage: kll_quantile_sketch(sketch, q)")
        KllQuantileSketch(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("topk_sketch_fast"),
      new ExpressionInfo(classOf[NativeTopKAgg].getName, "topk_sketch_fast"),
      exprs => {
        require(exprs.length >= 2 && exprs.length <= 6,
          "usage: topk_sketch_fast(key, weight[, capacity[, eps[, delta[, seed]]]])")
        val capacity = if (exprs.length > 2)
          foldNum(exprs(2), "capacity").toInt else 4096
        val eps = if (exprs.length > 3) foldNum(exprs(3), "eps") else 1e-4
        val delta = if (exprs.length > 4) foldNum(exprs(4), "delta") else 0.01
        val seed = if (exprs.length > 5) foldNum(exprs(5), "seed").toLong
          else CountMinSketch.DefaultSeed
        NativeTopKAgg(exprs.head, exprs(1), capacity, eps, delta, seed)
      }),
    (FunctionIdentifier("hll_sketch_fast"),
      new ExpressionInfo(classOf[NativeHllAgg].getName, "hll_sketch_fast"),
      exprs => {
        require(exprs.length >= 1 && exprs.length <= 3,
          "usage: hll_sketch_fast(key[, p[, seed]])")
        val p = if (exprs.length > 1) foldNum(exprs(1), "p").toInt else 14
        val seed = if (exprs.length > 2) foldNum(exprs(2), "seed").toLong
          else graft.sketch.HyperLogLog.DefaultSeed
        NativeHllAgg(exprs.head, p, seed)
      }),
    (FunctionIdentifier("topk_entries_sketch"),
      new ExpressionInfo(classOf[TopKEntriesSketch].getName, "topk_entries_sketch"),
      exprs => {
        require(exprs.length == 2, "usage: topk_entries_sketch(sketch, k)")
        TopKEntriesSketch(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("cosine_micro"),
      new ExpressionInfo(classOf[graft.agg.CosineMicro].getName, "cosine_micro"),
      graft.agg.VectorExpressions.cosineMicroBuilder),
    (FunctionIdentifier("dot_range"),
      new ExpressionInfo(classOf[graft.agg.DotRange].getName, "dot_range"),
      graft.agg.VectorExpressions.dotRangeBuilder),
    (FunctionIdentifier("intersect_count_sorted"),
      new ExpressionInfo(classOf[graft.agg.IntersectCountSorted].getName,
        "intersect_count_sorted"),
      graft.agg.VectorExpressions.intersectCountBuilder),
    (FunctionIdentifier("cdc_cuts"),
      new ExpressionInfo(classOf[graft.agg.CdcCuts].getName, "cdc_cuts"),
      graft.agg.StringExpressions.cdcCutsBuilder))

  /** Register the same functions into an already-running session, plus the
    * full udaf build surface via [[graft.agg.SketchFunctions.register]]
    * (`hll_sketch`, `kll_sketch`, `bloom_sketch`, … — Aggregator
    * registration needs a live UDFRegistration, so those are install-only;
    * the CM build is available on both paths as `cm_sketch_fast`). */
  def install(spark: SparkSession): Unit = {
    functionDescriptions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
    graft.agg.SketchFunctions.register(spark)
  }
}
