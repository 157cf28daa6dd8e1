package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("asOf picks the latest right row at-or-before, per key") {
    val left = Seq(
      (1L, t("10:00:00"), "p1"),
      (1L, t("12:00:00"), "p2"),
      (2L, t("09:00:00"), "p3") // key 2 has no clicks at all
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, t("09:30:00"), "c1"),
      (1L, t("10:00:00"), "c2"), // equal timestamp: inclusive (<=) wins
      (1L, t("11:59:00"), "c3"),
      (1L, t("12:01:00"), "c4"), // after p2 — must not attribute backward
      (3L, t("08:00:00"), "c5")  // other key — never crosses
    ).toDF("user_id", "ts", "name")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("name", "ts"))
      .select(col("tag"), col("asof.name"))
      .as[(String, Option[String])].collect().toMap
    assert(got === Map(
      "p1" -> Some("c2"), // equal ts beats the earlier c1
      "p2" -> Some("c3"), // c4 is in the future
      "p3" -> None))      // no right rows for the key
  }

  test("left columns pass through unchanged and row count is preserved") {
    val left = Seq((1L, t("10:00:00"), 42.0)).toDF("user_id", "ts", "value")
    val right = spark.emptyDataset[(Long, Timestamp)].toDF("user_id", "ts")
    val out = AsOfJoin.asOf(left, right, "user_id", "ts", Seq("ts"))
    assert(out.columns.toSeq === Seq("user_id", "ts", "value", "asof"))
    val row = out.head()
    assert(row.getAs[Double]("value") === 42.0)
    assert(row.getAs[Any]("asof") == null)
    // cardinality: one output row per LEFT row even when many right rows
    // match — a regression to per-pair emission must fail here, not dedup
    // away in a collect().toMap
    val left2 = Seq((1L, t("12:00:00"), 1.0), (1L, t("13:00:00"), 2.0))
      .toDF("user_id", "ts", "value")
    val right2 = (1 to 5).map(i => (1L, t(f"11:00:0$i")))
      .toDF("user_id", "ts")
    assert(AsOfJoin.asOf(left2, right2, "user_id", "ts", Seq("ts")).count() === 2L)
  }

  test("equal-timestamp right ties resolve deterministically to the greatest payload") {
    val left = Seq((1L, t("10:00:00"), "p")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, t("09:00:00"), "cA"), (1L, t("09:00:00"), "cB"))
      .toDF("user_id", "ts", "name")
    val got = (1 to 5).map { _ =>
      AsOfJoin.asOf(left, right, "user_id", "ts", Seq("name"))
        .select(col("asof.name")).head().getString(0)
    }
    assert(got.forall(_ == "cB"), got.toString) // greatest payload struct wins
  }
}
