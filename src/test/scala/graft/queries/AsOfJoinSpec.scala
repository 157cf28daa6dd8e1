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
  }
}
