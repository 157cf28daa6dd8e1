package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Hot-key hardening for the keyed-window operators (VERDICT r2 item 6): a
 * fixture where ONE user owns 50% of all events must (a) produce results
 * row-identical to the unsalted pass and (b) plan its per-event window
 * partitioned on (key, time-bucket) — so no single task serializes the hot
 * key's full history.
 */
class HotKeySpec extends SparkTestBase {
  import spark.implicits._

  // deterministic skewed fixture: user "hot" gets every other event; times
  // jitter across ~12 hours with gaps straddling the 30-min session cut and
  // the 1-hour salt-bucket edges (incl. exact-boundary and tie timestamps)
  private lazy val events = (1 to 4000).map { i =>
    val user = if (i % 2 == 0) "hot" else s"u${i % 37}"
    val tus = (i.toLong * 662999L + (i % 7) * 1799000000L) % 43200000000L
    (user, i.toLong, tus)
  }.toDF("user_id", "event_id", "tus").repartition(8).cache()

  private val BucketUs = 3600000000L // 1 hour

  test("salted sessionization is row-identical to the unsalted pass") {
    val plain = Sessionize.sessionIds(events)
      .select("user_id", "event_id", "sid").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val salted = Sessionize.sessionIdsSalted(events, BucketUs)
      .select("user_id", "event_id", "sid").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted sessionization plans its per-event window on (user, bucket)") {
    val plan = Sessionize.sessionIdsSalted(events, BucketUs)
      .queryExecution.executedPlan.toString
    // the per-event sort/partition must carry the salt column — a plan that
    // hash-partitions on user_id alone re-serializes the hot key
    assert(plan.contains("__tb"), s"salt column missing from plan:\n$plan")
    assert(plan.matches("(?s).*hashpartitioning\\([^)]*user_id[^)]*__tb.*"),
      s"per-event exchange not salted:\n$plan")
  }

  test("salted as-of join is row-identical to the unsalted pass") {
    val base = events.withColumn("ts", timestamp_micros(col("tus")))
    val left = base.filter(col("event_id") % 3 =!= 0)
      .select(col("user_id"), col("event_id"), col("ts"))
    val right = base.filter(col("event_id") % 3 === 0)
      .select(col("user_id"), col("ts"))
    val plain = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("ts"))
      .select(col("user_id"), col("event_id"), col("asof.ts").as("ats"))
      .as[(String, Long, Option[java.sql.Timestamp])]
      .collect().sortBy(r => (r._1, r._2))
    val salted = AsOfJoin.asOfSalted(left, right, "user_id", "ts", Seq("ts"), BucketUs)
      .select(col("user_id"), col("event_id"), col("asof.ts").as("ats"))
      .as[(String, Long, Option[java.sql.Timestamp])]
      .collect().sortBy(r => (r._1, r._2))
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted as-of edge cases: keys with no right rows, rights after lefts") {
    val left = Seq(
      ("norights", 1L, 1000000L),     // key with zero right rows anywhere
      ("lateright", 2L, 1000000L),    // left precedes the key's only right
      ("lateright", 3L, 9000000000L), // left after the right (different bucket)
      ("carry", 4L, 7200000001L)      // right sits 2 buckets earlier
    ).toDF("user_id", "event_id", "tus")
      .withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
    val right = Seq(
      ("lateright", 5000000L),
      ("carry", 500000L)
    ).toDF("user_id", "rtus")
      .withColumn("ts", timestamp_micros(col("rtus"))).drop("rtus")
    for (out <- Seq(
        AsOfJoin.asOf(left, right, "user_id", "ts", Seq("ts")),
        AsOfJoin.asOfSalted(left, right, "user_id", "ts", Seq("ts"), BucketUs))) {
      val got = out.select(col("event_id"), col("asof.ts").as("ats"))
        .as[(Long, Option[java.sql.Timestamp])].collect().sortBy(_._1)
      assert(got.length === 4)
      assert(got(0)._2.isEmpty, "no-right key must get null asof")
      assert(got(1)._2.isEmpty, "left before the only right must get null asof")
      assert(got(2)._2.map(_.getTime) === Some(5000L), "left after right joins it")
      assert(got(3)._2.map(_.getTime) === Some(500L), "carry-in across empty buckets")
    }
  }

  test("randomized parity: salted == unsalted over seeded boundary-heavy fixtures") {
    // 8 seeded random fixtures, timestamps biased onto bucket edges and
    // exact 30-min session gaps (the stitch math's boundary cases), with
    // duplicate timestamps per user
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed * 7919)
      val rows = (1 to 800).map { i =>
        val user = s"u${rnd.nextInt(5)}"
        val base = rnd.nextInt(12) * BucketUs // bucket edge
        val off = rnd.nextInt(5) match {
          case 0 => 0L                         // exactly on the edge
          case 1 => 1800000000L                // exactly one gap width in
          case 2 => BucketUs - 1L              // last micro of the bucket
          case _ => math.abs(rnd.nextLong()) % BucketUs
        }
        (user, i.toLong, base + off)
      }.toDF("user_id", "event_id", "tus").repartition(7)
      val plain = Sessionize.sessionIds(rows)
        .select("user_id", "event_id", "sid").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      val salted = Sessionize.sessionIdsSalted(rows, BucketUs)
        .select("user_id", "event_id", "sid").as[(String, Long, Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(salted === plain, s"sessionize seed=$seed")

      val base = rows.withColumn("ts", timestamp_micros(col("tus")))
      val left = base.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("event_id"), col("ts"))
      val right = base.filter(col("event_id") % 2 === 1).select(col("user_id"), col("ts"))
      val p = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("ts"))
        .select(col("event_id"), col("asof.ts").as("ats"))
        .as[(Long, Option[java.sql.Timestamp])].collect().sortBy(_._1).toSeq
      val sl = AsOfJoin.asOfSalted(left, right, "user_id", "ts", Seq("ts"), BucketUs)
        .select(col("event_id"), col("asof.ts").as("ats"))
        .as[(Long, Option[java.sql.Timestamp])].collect().sortBy(_._1).toSeq
      assert(sl === p, s"asof seed=$seed")
    }
  }

  test("salted as-of join plans its per-event window on (key, bucket)") {
    val base = events.withColumn("ts", timestamp_micros(col("tus")))
    val left = base.select(col("user_id"), col("event_id"), col("ts"))
    val right = base.filter(col("event_id") % 3 === 0).select(col("user_id"), col("ts"))
    val plan = AsOfJoin.asOfSalted(left, right, "user_id", "ts", Seq("ts"), BucketUs)
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*hashpartitioning\\([^)]*_k[^)]*_b.*"),
      s"per-event exchange not salted:\n$plan")
  }
}
