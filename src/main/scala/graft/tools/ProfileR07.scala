package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench

/** Round-7 phase profiler: time the sub-stages of the expensive gate
  * queries in isolation (guide §1: decide WHERE the time goes before
  * changing anything). Ad-hoc measurement surface, not part of the bench
  * contract. args: sfDir. */
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

    val all = args.drop(1).headOption.forall(_ == "all")

    // ---- q73/q108 substrate: the distinct shingle census ----
    def srcSh() = graft.queries.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"),
        explode(array_distinct(expr(
          """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
            |  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""".stripMargin)))
          .as("g"))
      .select(col("source"),
        xxhash64(col("g")).as("h1"), xxhash64(lit("g2"), col("g")).as("h2"))
      .distinct()
    if (all) {
    t("q73.srcSh_distinct_census") {
      srcSh().write.format("noop").mode("overwrite").save()
    }
    t("q73.census_plus_selfjoin_inter") {
      val s = srcSh().persist()
      val inter = s.select(col("source").as("source_a"), col("h1"), col("h2"))
        .join(s.select(col("source").as("source_b"), col("h1"), col("h2")),
          Seq("h1", "h2"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("i"))
      inter.write.format("noop").mode("overwrite").save()
      s.unpersist()
    }
    // q108's 128-min signature pass over the same census
    t("q108.sig128_pass") {
      val s = srcSh().withColumn("g2", col("h1")).persist()
      val sigCols = (0 until 128).map(i => min(xxhash64(lit(i), col("g2"))).as(s"m$i"))
      s.groupBy(col("source")).agg(sigCols.head, sigCols.tail: _*)
        .write.format("noop").mode("overwrite").save()
      s.unpersist()
    }

    // ---- q63 phases ----
    val GridN = 16
    def flowsDf() = graft.queries.Tables.lineitem(spark, dir)
      .select(
        pmod(col("l_suppkey"), lit(GridN)).cast("int").as("s"),
        pmod(col("l_partkey"), lit(GridN)).cast("int").as("d"),
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("long").as("lid"),
        floor(col("l_extendedprice")).cast("long").as("t"))
      .filter(col("s") =!= col("d"))
      .groupBy(col("lid"), col("s"), col("d"))
      .agg(sum(col("t")).as("traffic"))
      .withColumn("fid",
        col("lid") * 256L + col("s").cast("long") * 16L + col("d"))
    t("q63.flows_groupby") {
      flowsDf().write.format("noop").mode("overwrite").save()
    }
    t("q63.flows_count_plus_topk_iter") {
      import scala.jdk.CollectionConverters._
      val f = flowsDf().persist()
      val n = f.count()
      val kTop = math.max(1L, math.ceil(0.01 * n).toLong)
      val it = graft.queries.SketchSelect.topK(f, "traffic", "fid", kTop, knownN = n)
        .select(col("fid"), col("s"), col("d"), col("traffic"))
        .orderBy(col("traffic").desc, col("fid").asc)
        .toLocalIterator().asScala
      var c = 0L
      it.foreach(_ => c += 1)
      f.unpersist()
      println(s"  [prof] q63 topk rows: $c")
    }

    }

    // real q73/q108 vs substrate replica, one JVM
    t("q73.real_count") {
      graft.queries.TextQueries.sourceOverlap(spark, dir).count(): Unit
    }
    t("q73.replica_census_noop") {
      srcSh().write.format("noop").mode("overwrite").save()
    }
    t("q108.real_count") {
      graft.queries.TextQueries.minhashEstimator(spark, dir).count(): Unit
    }

    // ---- streaming phase split (q90 shape: stage + stream + read) ----
    t("q90.stage_only") {
      val root = graft.streaming.SliceReplay.freshRoot("prof90")
      val li = graft.queries.Tables.lineitem(spark, dir)
        .select(col("l_extendedprice").as("x"),
          col("l_orderkey").cast("long").as("tus"))
      graft.streaming.SliceReplay.stage(spark, li, 3, root)
    }
    // scratch-medium A/B, interleaved in ONE JVM (cross-run load bursts on
    // this shared VM poison cross-JVM comparisons)
    def ab(name: String)(f: => Unit): Seq[(String, () => Unit)] = Seq(
      s"$name.wideOFF" -> (() => { sys.props("graft.widen.off") = "1"; f }),
      s"$name.wideON" -> (() => { sys.props.remove("graft.widen.off"); f }))
    val qnames = Seq("q17_dedup_simhash", "q61_dedup_clusters_star",
      "q73_source_overlap", "q81_pq_ann", "q84_quality_keeper",
      "q108_minhash_estimator")
    val abPaths = qnames.flatMap { n =>
      ab(n.takeWhile(_ != '_')) {
        graft.SparkEntry.queries(n)(spark, dir).count(): Unit
      }
    }
    Bench.timeAllInterleaved(abPaths, cycles = 3,
        teardown = () => spark.catalog.clearCache())
      .toSeq.sortBy(_._1)
      .foreach { case (n, s) => println(f"[prof] $n $s%.3f s") }
    sys.props.remove("graft.widen.off")

    val paths: Seq[(String, () => Unit)] = Seq(
      "q93.state8" -> (() => {
        sys.props("graft.q93.state.partitions") = "8"
        graft.streaming.StreamJoin.streamAttribution(spark, dir).count(): Unit
      }),
      "q93.state2" -> (() => {
        sys.props("graft.q93.state.partitions") = "2"
        graft.streaming.StreamJoin.streamAttribution(spark, dir).count(): Unit
      }),
      "q75.state8" -> (() => {
        sys.props("graft.q75.state.partitions") = "8"
        graft.streaming.StreamSessionize.streamSessionStats(spark, dir).count(): Unit
      }),
      "q75.state2" -> (() => {
        sys.props("graft.q75.state.partitions") = "2"
        graft.streaming.StreamSessionize.streamSessionStats(spark, dir).count(): Unit
      }))
    Bench.timeAllInterleaved(paths, cycles = 3,
        teardown = () => spark.catalog.clearCache())
      .toSeq.sortBy(_._1)
      .foreach { case (n, s) => println(f"[prof] $n $s%.3f s") }
    sys.props.remove("graft.stream.scratch")

    spark.stop()
  }
}
