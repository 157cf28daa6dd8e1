package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, data}

/** Diagnostic: does a pure whole-stage-codegen scan+hash aggregate scale
  * 8→32 cores? Separates cache-scan/codegen scaling from sketch-aggregate
  * scaling. */
object ScanScale {
  def main(args: Array[String]): Unit = {
    val rows = 160000000L
    for (cpus <- Seq(32, 8, 32)) { // first 32 = burn-in
      val spark = Bench.session(cpus.toString)
      spark.sparkContext.setLogLevel("WARN")
      val corpus = data.CorpusGenerator.keyed(spark, rows, cpus)
        .select(col("token"), col("weight")).cache()
      corpus.count()
      System.gc()
      val scanSec = Bench.timeBest {
        corpus.agg(expr("bit_xor(xxhash64(token))")).head()
      }
      val genSec = Bench.timeBest { // no cache: generate+hash in flight
        data.CorpusGenerator.keyed(spark, rows, cpus)
          .agg(expr("bit_xor(xxhash64(token))")).head()
      }
      println(f"[scanscale] cpus=$cpus cached_scan=${rows / scanSec / 1e6}%.1f Mrows/s in_flight=${rows / genSec / 1e6}%.1f Mrows/s")
      corpus.unpersist()
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
