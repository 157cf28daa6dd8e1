package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test data (TESTDATA.md). */
object Tables {

  /** Widen a small scan to the scheduler's width before an expensive
    * per-row pass (round 7): a gate parquet file is a single input split,
    * so a kernel UDF / HOF tower downstream of it runs in ONE task no
    * matter how many cores the session has (measured: q39's k-means
    * passes 3.6 s -> 1.7 s at sf0.1 once widened). Only widens — when the
    * scan already has at least defaultParallelism splits (any production
    * table) this is a no-op, so no extra exchange appears at scale. */
  def widen(df: DataFrame): DataFrame = {
    if (sys.props.get("graft.widen.off").contains("1")) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def events(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "events")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
