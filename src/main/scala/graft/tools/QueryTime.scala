package graft.tools

import graft.{Bench, SparkEntry}

/** Ad-hoc single-query timing at an arbitrary sf dir — interleaved
  * best-of-3 over the named gate queries (args: sfDir, query names...). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val paths: Seq[(String, () => Unit)] = names.map { n =>
      n -> (() => { SparkEntry.queries(n)(spark, dir).count(): Unit })
    }
    // clearCache between samples, outside the timed region (gate discipline)
    Bench.timeAllInterleaved(paths,
        teardown = () => spark.catalog.clearCache()).toSeq.sortBy(_._1).foreach {
      case (n, s) => println(f"[qtime] $n $s%.3f s")
    }
    spark.stop()
  }
}
