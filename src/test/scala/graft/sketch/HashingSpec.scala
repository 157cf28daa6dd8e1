package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class HashingSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("xxh64 matches Spark's reference XXH64 on longs and ints") {
    // Sanity anchor: our from-scratch implementation against the xxHash64
    // implementation that ships inside Spark (test-only dependence).
    for (_ <- 0 until 2000) {
      val v = rnd.nextLong()
      val seed = rnd.nextLong()
      assert(XxHash64.hashLong(v, seed) ===
        org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, seed))
      val iv = rnd.nextInt()
      assert(XxHash64.hashInt(iv, seed) ===
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(iv, seed))
    }
  }

  test("xxh64 matches Spark's reference XXH64 on byte arrays of all sizes") {
    val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    for (len <- 0 to 200) {
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val seed = rnd.nextLong()
      assert(XxHash64.hashBytes(bytes, seed) ===
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, off, len, seed))
    }
  }

  test("hashString is deterministic and seed-sensitive") {
    assert(XxHash64.hashString("spark", 1L) === XxHash64.hashString("spark", 1L))
    assert(XxHash64.hashString("spark", 1L) !== XxHash64.hashString("spark", 2L))
    assert(XxHash64.hashString("spark", 1L) !== XxHash64.hashString("sparl", 1L))
  }

  test("Hash128 row hashes are distinct across rows") {
    val h = Hash128.ofString("somekey", 7L)
    val rows = (0 until 16).map(h.row).toSet
    assert(rows.size === 16)
    assert(h.bucket(3, 1023) >= 0 && h.bucket(3, 1023) < 1024)
  }

  test("bucket distribution is roughly uniform") {
    val width = 64
    val counts = new Array[Int](width)
    for (i <- 0 until 64000) {
      counts(Hash128.ofLong(i.toLong, 0L).bucket(0, width - 1)) += 1
    }
    // expected 1000 per bucket; loose uniformity check
    assert(counts.min > 800 && counts.max < 1200, s"skewed: min=${counts.min} max=${counts.max}")
  }
}
