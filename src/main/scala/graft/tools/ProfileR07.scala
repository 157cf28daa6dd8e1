package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench

/** Round-7 phase profiler and A/B surface (guide §1: decide WHERE the time
  * goes before changing anything). Two disciplines this round's numbers
  * relied on, kept runnable for future rounds:
  *
  *  - PHASE SPLIT: time a query's sub-stages in isolation with noop-sink /
  *    count actions (e.g. the q107 pair-derivation vs PageRank-machinery
  *    split below).
  *  - INTERLEAVED A/B: this VM's external load arrives in multi-minute
  *    bursts (the q00/q20 anchors swung 2.5x on unchanged code), so
  *    cross-JVM before/after timing is unreliable — toggle the variant via
  *    a system property and alternate both arms across cycles inside ONE
  *    JVM (`Bench.timeAllInterleaved`), e.g. `graft.widen.off` for the
  *    Tables.widen sites.
  *
  * Ad-hoc measurement surface, not part of the bench contract.
  * args: sfDir. */
object ProfileR07 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      spark.catalog.clearCache()
      val s = Seq.fill(2) { val x = Bench.time(f)._2; spark.catalog.clearCache(); x }.min
      println(f"[prof] $name $s%.3f s")
    }

    // ---- q107 phase split: pair derivation vs PageRank machinery ----
    t("q107.pairs_only") {
      val pr = graft.queries.TextQueries.ngramJaccard(spark, dir)
        .select(col("id_a"), col("id_b")).persist()
      pr.count()
      pr.unpersist(); ()
    }
    t("q107.full") {
      graft.SparkEntry.queries("q107_pagerank")(spark, dir).count(): Unit
    }

    // ---- streaming phase split: staging cost vs stream machinery ----
    t("q90.stage_only") {
      val root = graft.streaming.SliceReplay.freshRoot("prof90")
      val li = graft.queries.Tables.lineitem(spark, dir)
        .select(col("l_extendedprice").as("x"),
          col("l_orderkey").cast("long").as("tus"))
      graft.streaming.SliceReplay.stage(spark, li, 3, root)
    }
    t("q90.full") {
      graft.streaming.StreamSketch.streamKllPrice(spark, dir).count(): Unit
    }

    // ---- interleaved widen A/B over the sites that keep it ----
    def ab(name: String, q: String): Seq[(String, () => Unit)] = Seq(
      s"$name.wideOFF" -> (() => { sys.props("graft.widen.off") = "1"
        graft.SparkEntry.queries(q)(spark, dir).count(): Unit }),
      s"$name.wideON" -> (() => { sys.props.remove("graft.widen.off")
        graft.SparkEntry.queries(q)(spark, dir).count(): Unit }))
    val abPaths =
      ab("q16", "q16_dedup_minhash") ++ ab("q39", "q39_ann_ivf") ++
        ab("q73", "q73_source_overlap") ++ ab("q108", "q108_minhash_estimator")
    Bench.timeAllInterleaved(abPaths, cycles = 3,
        teardown = () => spark.catalog.clearCache())
      .toSeq.sortBy(_._1)
      .foreach { case (n, s) => println(f"[prof] $n $s%.3f s") }
    sys.props.remove("graft.widen.off")

    spark.stop()
  }
}
