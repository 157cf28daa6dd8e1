package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * q37: duplicate-cluster assignment — the step after near-dup pair detection
 * in a training-data pipeline ("keep one doc per duplicate cluster").
 * Connected components over the near-dup pair graph via iterative min-label
 * propagation: each round, every node takes the min label among itself and
 * its neighbors; converges in O(component diameter) rounds (components here
 * are tiny; at corpus scale this is the standard large-graph CC loop, one
 * shuffle per round, label state O(nodes-in-pairs) ≪ corpus).
 */
object DedupClusterQuery {

  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = TextQueries.dedupMinhash(spark, sfDir)
      .select(col("id_a"), col("id_b"))
      .cache()
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .toDF("src", "dst")
      .cache()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .cache()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val viaNeighbors = edges
        .join(labels, edges("dst") === labels("node"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      // localCheckpoint (not just cache) TRUNCATES the lineage: without it
      // the plan doubles every round and round ~15's DAG alone stalls the
      // driver at corpus scale
      val next = labels
        .join(viaNeighbors, labels("node") === viaNeighbors("src"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("node"))
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
      rounds += 1
    }
    val out = labels
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("is_keeper", col("doc_id") === col("cluster_id"))
      .orderBy(col("cluster_id"), col("doc_id"))
    edges.unpersist()
    pairs.unpersist()
    out
  }
}
