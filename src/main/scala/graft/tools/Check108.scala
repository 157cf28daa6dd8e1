package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench

/** One-shot: q108 verdict census at an arbitrary sf (round-7 estimator
  * family re-audit surface). */
object Check108 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val r = graft.queries.TextQueries.minhashEstimator(spark, dir)
      .agg(count(lit(1)).as("pairs"),
        sum(when(col("est_within_bound"), 0L).otherwise(1L)).as("violations"))
      .head()
    println(s"[check108] dir=$dir pairs=${r.getLong(0)} violations=${r.getLong(1)}")
    spark.stop()
  }
}
