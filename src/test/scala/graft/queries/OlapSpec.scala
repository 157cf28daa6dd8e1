package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q100: the rollup pricing summary against a driver-side JVM reference
  * and the grouping-sets additivity invariants. */
class OlapSpec extends SparkTestBase {

  import spark.implicits._

  test("q100: gate output equals the JVM reference rollup at sf0.001") {
    val dir = sf("sf0.001")
    val cutoff = 904694400000000L
    val rows = Tables.lineitem(spark, dir)
      .filter(unix_micros(col("l_shipdate").cast("timestamp")) <= cutoff)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .as[(String, String, Double, Double, Double, Double)].collect()
    val agg = scala.collection.mutable.Map
      .empty[(String, String), Array[Long]]
    def acc(key: (String, String), r: (String, String, Double, Double, Double, Double)): Unit = {
      val a = agg.getOrElseUpdate(key, Array.fill(6)(0L))
      val (_, _, q, p, d, t) = r
      a(0) += 1
      a(1) += math.floor(q * 1e6).toLong
      a(2) += math.floor(p * 1e6).toLong
      a(3) += math.floor(p * (1 - d) * 1e6).toLong
      a(4) += math.floor(p * (1 - d) * (1 + t) * 1e6).toLong
      a(5) += math.floor(d * 1e6).toLong
    }
    rows.foreach { r =>
      acc((r._1, r._2), r); acc((r._1, "<all>"), r); acc(("<all>", "<all>"), r)
    }
    val ref = agg.toSeq.sortBy(_._1).map { case ((rf, ls), a) =>
      (rf, ls, a(0), a(1), a(2), a(3), a(4),
        a(1) / a(0), a(2) / a(0), a(5) / a(0))
    }
    val got = OlapQueries.pricingRollup(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === ref)
    spark.catalog.clearCache()
  }

  test("q100: subtotals are additive and the grand total closes the cube") {
    val got = OlapQueries.pricingRollup(spark, sf("sf0.001")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(6))).toMap
    val base = got.filter { case ((rf, ls), _) => rf != "<all>" && ls != "<all>" }
    val flags = base.keys.map(_._1).toSet
    flags.foreach { rf =>
      val sub = got((rf, "<all>"))
      val parts = base.filter(_._1._1 == rf).values
      assert(sub._1 === parts.map(_._1).sum, s"row subtotal for $rf")
      assert(sub._2 === parts.map(_._2).sum, s"charge subtotal for $rf")
    }
    val total = got(("<all>", "<all>"))
    assert(total._1 === base.values.map(_._1).sum)
    assert(total._2 === base.values.map(_._2).sum)
    spark.catalog.clearCache()
  }

  test("q102: bloom runtime-filter join == the plain join, and the filter genuinely reduces the fact side") {
    val dir = sf("sf0.001")
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag").as("rf"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(1000000L)).cast("long")).as("revenue_micro"))
      .orderBy(col("l_returnflag")).collect().toSeq
    val got = OlapQueries.bloomJoinRevenue(spark, dir).collect().toSeq
    assert(got.map(_.toSeq) === plain.map(_.toSeq))
    // no false negatives + a real reduction: bloom positives sit between
    // the true joining lines and the table size
    import graft.agg.SketchFunctions._
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bf = urgent.agg(bloom_sketch(col("o_orderkey").cast("string"),
      expectedItems = 1 << 16, fpp = 1e-3).as("bf"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    val total = li.count()
    val positives = li.crossJoin(broadcast(bf))
      .filter(bloom_contains(col("bf"), col("l_orderkey").cast("string")))
      .count()
    val trueLines = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(positives >= trueLines, "a bloom false negative is impossible")
    assert(positives < total, "the runtime filter must reduce the fact side")
    spark.catalog.clearCache()
  }

  test("q103: gate output equals the JVM reference top-10 at sf0.001") {
    val dir = sf("sf0.001")
    val cutoff = 896659200000000L
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).as[Long].collect().toSet
    val ords = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        unix_micros(col("o_orderdate").cast("timestamp")),
        col("o_orderpriority"))
      .as[(Long, Long, Long, String)].collect()
      .filter { case (_, ck, d, _) => d < cutoff && building(ck) }
      .map { case (ok, _, d, pr) => ok -> (d, pr) }.toMap
    val lis = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long"),
        unix_micros(col("l_shipdate").cast("timestamp")),
        col("l_extendedprice"), col("l_discount"))
      .as[(Long, Long, Double, Double)].collect()
      .filter { case (ok, sd, _, _) => sd > cutoff && ords.contains(ok) }
    val ref = lis.groupBy(_._1).toSeq.map { case (ok, rows) =>
      val (d, pr) = ords(ok)
      (ok, d, pr, rows.map(r => math.floor(r._3 * (1 - r._4) * 1e6).toLong).sum,
        rows.size.toLong)
    }.sortBy { case (ok, _, _, rev, _) => (-rev, ok) }.take(10)
    val got = OlapQueries.shippingPriority(spark, dir)
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(got === ref)
    spark.catalog.clearCache()
  }

  test("q104: cube cells equal the JVM reference, margins close, all HLL verdicts hold") {
    val dir = sf("sf0.001")
    val rows = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("(unix_micros(cast(ts as timestamp)) div 3600000000) % 24"),
        col("user_id").cast("string"))
      .as[(String, Long, String)].collect()
    def cell(f: ((String, Long, String)) => (String, String)) =
      rows.groupBy(f).map { case (k, rs) =>
        k -> (rs.length.toLong, rs.map(_._3).distinct.length.toLong)
      }
    val ref = cell(r => (r._1, r._2.toString)) ++
      cell(r => (r._1, "<all>")) ++
      cell(r => ("<all>", r._2.toString)) ++
      cell(_ => ("<all>", "<all>"))
    val got = OlapQueries.cubeDistinctUsers(spark, dir).collect()
    assert(got.length === ref.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert((r.getLong(2), r.getLong(3)) === ref(k), k.toString)
      assert(r.getBoolean(4), s"HLL verdict failed for $k")
    }
    // margin closure: the grand total's event count is the sum of the
    // base cells', and its distinct-user count is the global distinct
    val base = got.filter(r => r.getString(0) != "<all>" && r.getString(1) != "<all>")
    val grand = got.find(r => r.getString(0) == "<all>" && r.getString(1) == "<all>").get
    assert(grand.getLong(2) === base.map(_.getLong(2)).sum)
    assert(grand.getLong(3) === rows.map(_._3).distinct.length.toLong)
    spark.catalog.clearCache()
  }

  /** JVM Morton reference: interleave the low 8 bits of x (even positions)
    * and y (odd positions). */
  private def morton(x: Long, y: Long): Long =
    (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) |
      (((y >> i) & 1L) << (2 * i + 1))).sum

  test("q114: the arithmetic interleave equals the JVM bit interleave on the full grid") {
    val zSql = OlapQueries.ZInterleaveSql
    val grid = spark.range(0, 65536)
      .selectExpr("id % 256 AS px", "id div 256 AS sy")
      .selectExpr("px", "sy", s"($zSql) AS zv")
      .collect()
    grid.foreach { r =>
      assert(r.getLong(2) === morton(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    spark.catalog.clearCache()
  }

  test("q114: gate equals the JVM zone-map replay at sf0.001 and z prunes better on every probe") {
    val dir = sf("sf0.001")
    val rows = Tables.lineitem(spark, dir)
      .select(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
      .as[(Long, Long)].collect()
    val npart = rows.map(_._1).max + 1
    val nsupp = rows.map(_._2).max + 1
    val pts = rows.map { case (p, s) => (p * 256 / npart, s * 256 / nsupp) }
    def zones(key: ((Long, Long)) => Long) =
      pts.groupBy(key).map { case (_, ps) =>
        (ps.length.toLong, ps.map(_._1).min, ps.map(_._1).max,
          ps.map(_._2).min, ps.map(_._2).max)
      }
    val zm = zones { case (px, sy) => morton(px, sy) / 1024 }
    val rm = zones { case (px, _) => px / 4 }
    def scanned(zs: Iterable[(Long, Long, Long, Long, Long)], x0: Long, y0: Long) =
      zs.collect { case (n, mnx, mxx, mny, mxy)
        if mxx >= x0 && mnx <= x0 + 31 && mxy >= y0 && mny <= y0 + 31 => n }.sum
    val ref = OlapQueries.ZProbeBoxes.zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, scanned(zm, x, y), scanned(rm, x, y))
    }
    val got = OlapQueries.zOrderLayout(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) === ref)
    got.foreach(t => assert(t._4, s"probe ${t._1} must prune at least as well"))
    spark.catalog.clearCache()
  }

  test("q116: gate equals the JVM six-table replay at sf0.001") {
    val dir = sf("sf0.001")
    val asia = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
      .select(col("r_regionkey").cast("long")).as[Long].collect().toSet
    val nations = Tables(spark, dir, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .as[(Long, String, Long)].collect()
      .filter(n => asia(n._3)).map(n => n._1 -> n._2).toMap
    val custN = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .as[(Long, Long)].collect()
      .filter(c => nations.contains(c._2)).toMap
    val suppN = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").cast("long"), col("s_nationkey").cast("long"))
      .as[(Long, Long)].collect()
      .filter(s => nations.contains(s._2)).toMap
    val ordC = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        unix_micros(col("o_orderdate").cast("timestamp")))
      .as[(Long, Long, Long)].collect()
      .filter(o => o._3 >= 820454400000000L && o._3 < 852076800000000L)
      .map(o => o._1 -> o._2).toMap
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long"),
        col("l_extendedprice"), col("l_discount"))
      .as[(Long, Long, Double, Double)].collect()
      .foreach { case (ok, sk, px, dc) =>
        for {
          ck <- ordC.get(ok)
          cn <- custN.get(ck)
          sn <- suppN.get(sk)
          if cn == sn
        } {
          val name = nations(cn)
          val (r, c) = agg.getOrElse(name, (0L, 0L))
          agg(name) = (r + math.floor(px * (1 - dc) * 1e6).toLong, c + 1)
        }
      }
    val ref = agg.toSeq.map { case (n, (r, c)) => (n, r, c) }
      .sortBy { case (n, r, _) => (-r, n) }
    val got = OlapQueries.localSupplierVolume(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === ref)
    assert(got.nonEmpty)
    spark.catalog.clearCache()
  }
}
