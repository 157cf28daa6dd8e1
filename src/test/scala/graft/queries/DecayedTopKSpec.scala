package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q106: time-decayed heavy hitters — the decay semantics on a hand
  * fixture and JVM-reference equality of the gate at sf0.001. */
class DecayedTopKSpec extends SparkTestBase {

  import spark.implicits._

  test("a fresh burst outranks an old drip (the decay contract)") {
    // user A: 100 events in the oldest quarter (w=1 -> 100)
    // user B:  20 events in the newest quarter (w=8 -> 160)
    // span anchors so the quarter split is exact: us in [0, 4000)
    val rows = (1 to 100).map(i => ("A", i.toLong % 999)) ++
      (1 to 20).map(i => ("B", 3000L + i)) ++
      Seq(("C", 0L), ("C", 3999L)) // pins mn=0, mx=3999
    val got = SketchQueries.decayedTopKOn(rows.toDF("k", "us")).collect()
    val decayed = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(decayed("A") === 100L)
    assert(decayed("B") === 160L)
    assert(decayed("C") === 9L) // one event at w=1, one at w=8
    assert(got.head.getString(0) === "B", "the fresh burst must rank first")
    spark.catalog.clearCache()
  }

  test("q106: gate equals the exact weighted census at sf0.001") {
    val dir = sf("sf0.001")
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("string"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(String, Long)].collect()
    val mn = ev.map(_._2).min
    val mx = ev.map(_._2).max
    val ref = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map { case (_, us) =>
        1L << (((us - mn) * 4) / (mx - mn + 1)).toInt
      }.sum
    }.toSeq.sortBy { case (u, d) => (-d, u) }.take(20)
    val got = SketchQueries.decayedTopKUsers(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got === ref)
    spark.catalog.clearCache()
  }
}
