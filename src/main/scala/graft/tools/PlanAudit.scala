package graft.tools

import org.apache.spark.sql.SparkSession

/** Print formatted physical plans for selected driver-contract queries —
  * the explain-and-iterate loop (pushdown, broadcast, codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val which = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (which.isEmpty || which.contains(name)) {
        println(s"\n========== $name ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
