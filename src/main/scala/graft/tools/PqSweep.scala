package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench
import graft.queries.{AnnQueries, Tables}

/**
 * q81 recall/resolution curve (the IvfSweep discipline): PQ recall on the
 * NEAR-ISOTROPIC sf embeddings is expected to be poor at the gate's 4-bit
 * codes — quantization error per subspace is a large fraction of the
 * distance variance when there is no cluster structure to absorb it — and
 * the lever is codebook resolution (k per subspace). This sweep measures
 * avg recall@5 across the 5 gate queries for k ∈ {16, 64, 256}
 * (4/6/8-bit codes; seeds every ⌊n/k⌋-th vector), grounding the gate's
 * recall_hits VALUES (the oracle re-derives them — they are agreement
 * evidence, not a quality claim) and the documented tuning surface.
 * PqAnnSpec's planted-cluster fixture shows the same operator at high
 * recall on PQ's actual domain.
 */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = Tables.embeddings(spark, dir).cache()
    val n = emb.count()
    for (k <- Seq(16, 64, 256)) {
      val stride = math.max(1L, n / k)
      val (rows, sec) = Bench.time(
        AnnQueries.pqAnnOn(emb, k, stride, nQueries = 5)
          .groupBy(col("query_id")).agg(max(col("recall_hits")).as("h"))
          .agg(sum(col("h")), count(lit(1))).head())
      spark.catalog.clearCache()
      val (hits, q) = (rows.getLong(0), rows.getLong(1))
      println(f"[pq-sweep] k=$k%3d (stride $stride): recall@5 = " +
        f"${hits.toDouble / (q * 5)}%.2f ($hits/${q * 5} hits), $sec%.1f s")
    }
    spark.stop()
  }
}
