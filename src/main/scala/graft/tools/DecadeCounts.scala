package graft.tools

import graft.Bench
import graft.queries.TextQueries

/**
 * Companion probe to [[ScaleDecade]]: the surviving-pair and candidate
 * cardinalities needed to INTERPRET the decade growth table. An exact
 * set-similarity join is Ω(output) on any plan, so a measured decade
 * exponent only separates "the algorithm grew" from "the answer grew"
 * once the answer size at each scale is on the record — this prints it
 * (result pairs at the decade t=0.3, per corpus family and scale, plus
 * the testdata sf0.1 row the round-4 grid was keyed on).
 */
object DecadeCounts {

  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val corpora = Seq(
      "gen1x" -> "target/scale10/gen1x",
      "gen10x" -> "target/scale10/gen10x",
      "sf0.1" -> "/root/testdata/sf0.1")
    for ((name, dir) <- corpora) {
      val docs = graft.queries.Tables.documents(spark, dir).count()
      val pairs = TextQueries
        .ngramJaccardPath(spark, dir, 300000L, usePrefix = false).count()
      spark.catalog.clearCache()
      println(s"[counts] $name: docs=$docs result_pairs_t0.3=$pairs " +
        f"pairs_per_doc=${pairs.toDouble / docs}%.1f")
    }
    spark.stop()
  }
}
