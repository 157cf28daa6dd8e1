package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Co-located joins via bucketing and partition pruning — the shuffle-control
 * techniques the 100TB layout relies on, asserted at the plan level.
 */
class BucketingSpec extends SparkTestBase {

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    val li = Tables.lineitem(spark, sf("sf0.001"))
    val ord = Tables.orders(spark, sf("sf0.001"))
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    // both sides bucketed on the join key: no Exchange below the join
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SMJ in:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning"),
      s"shuffle below bucketed join:\n$plan")
    assert(joined.count() > 0)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q117: bucketed gate values equal the plain join, and a rerun overwrites cleanly") {
    val dir = sf("sf0.001")
    val plain = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        floor(col("l_quantity") * lit(1000000L)).cast("long").as("q"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .orderBy(col("o_orderstatus")).collect().map(_.toSeq).toSeq
    val got = OlapQueries.bucketedJoinRevenue(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(got === plain)
    // rerun must overwrite the tables without a location flake
    val again = OlapQueries.bucketedJoinRevenue(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(again === plain)
    spark.catalog.clearCache()
  }

  test("partitioned parquet scan prunes partitions for a lang filter") {
    val dir = Files.createTempDirectory("part").toString + "/docs"
    Tables.documents(spark, sf("sf0.001"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
      .agg(count(lit(1)))
    val scan = q.queryExecution.executedPlan.toString
    // partition filter must reach the scan (pruned read, not post-filter)
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"no partition pruning in:\n$scan")
    val n = q.head().getLong(0)
    val exact = Tables.documents(spark, sf("sf0.001"))
      .filter(col("lang") === "en").count()
    assert(n === exact)
  }

  test("filter pushdown reaches the parquet scan (PushedFilters)") {
    val q = Tables.lineitem(spark, sf("sf0.001"))
      .filter(col("l_partkey") === 42L)
      .select(col("l_quantity"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_partkey"),
      s"no pushed filter in:\n$scan")
    // column pruning: read schema limited to the needed columns
    assert(scan.contains("ReadSchema") && !scan.contains("l_comment"))
  }
}
