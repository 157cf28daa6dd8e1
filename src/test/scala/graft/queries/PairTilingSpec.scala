package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** PairTiling is shared infrastructure (q18 tiled path + the q17/q26/q56
  * brute-force twins): the tiling must enumerate every unordered in-block
  * pair exactly once for any group count, and pairParity must detect both
  * missing and extra pairs. */
class PairTilingSpec extends SparkTestBase {
  import spark.implicits._

  test("allPairs enumerates each in-block pair exactly once, any G") {
    val df = (1L to 97L).map(i => (i, s"b${i % 3}", s"p$i")).toDF("id", "blk", "payload")
    for (g <- Seq(1, 2, 8, 16)) {
      val pairs = PairTiling.allPairs(df, "id", Seq("blk"), g = g)
        .select("blk", "id_a", "id_b", "payload_a", "payload_b")
        .as[(String, Long, Long, String, String)].collect()
      // expected: all i<j with i ≡ j (mod 3)
      val want = for {
        i <- 1L to 97L; j <- (i + 1) to 97L; if i % 3 == j % 3
      } yield (s"b${i % 3}", i, j)
      assert(pairs.length === want.size, s"g=$g count")
      assert(pairs.map(p => (p._1, p._2, p._3)).sorted.toSeq === want.sorted.toSeq, s"g=$g set")
      // payload columns follow the id order (a = smaller id side)
      assert(pairs.forall(p => p._4 == s"p${p._2}" && p._5 == s"p${p._3}"), s"g=$g payload")
    }
  }

  test("allPairs with no block columns spans the whole frame") {
    val df = (1L to 20L).map(i => (i, i * 10)).toDF("id", "v")
    val n = PairTiling.allPairs(df, "id", Nil, g = 4).count()
    assert(n === 20L * 19 / 2)
  }

  test("pairParity: 1 iff pair sets are equal, 0 on missing or extra") {
    val a = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val same = Seq((5L, 6L), (1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val missing = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val extra = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    def p(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame): Long =
      PairTiling.pairParity(x, y, "ok").head().getAs[Long]("ok")
    assert(p(a, same) === 1L)
    assert(p(a, missing) === 0L)
    assert(p(a, extra) === 0L)
  }
}
