package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class CountMinSpec extends AnyFunSuite {

  private def build(stream: Iterable[(String, Long)], eps: Double, delta: Double) = {
    val cm = CountMinSketch.fromErrorBounds(eps, delta)
    stream.foreach { case (k, w) => cm.update(k, w) }
    cm
  }

  test("sizing: width ≥ e/eps rounded to pow2, depth = ceil(ln 1/delta)") {
    val cm = CountMinSketch.fromErrorBounds(0.001, 0.01)
    assert(cm.depth === 5) // ceil(ln 100) = 5
    assert(cm.width >= math.ceil(math.E / 0.001)) // 2719 → 4096
    assert((cm.width & (cm.width - 1)) === 0)
    assert(cm.epsilon <= 0.001)
    assert(cm.delta <= 0.01)
  }

  test("never underestimates (deterministic CM property)") {
    val stream = StreamFixtures.weightedZipfStream(20000, 2000)
    val truth = StreamFixtures.exactCounts(stream)
    val cm = build(stream, 0.01, 0.01)
    truth.foreach { case (k, t) => assert(cm.query(k) >= t, s"underestimated $k") }
  }

  test("ε·N additive bound holds for ≥ 1−δ of keys (zipf stream)") {
    val stream = StreamFixtures.zipfStream(100000, 5000)
    val truth = StreamFixtures.exactCounts(stream)
    val eps = 0.001
    val delta = 0.01
    val cm = build(stream, eps, delta)
    val n = cm.totalWeight
    assert(n === 100000L)
    val bound = eps * n
    val violations = truth.count { case (k, t) => cm.query(k) > t + bound }
    val passRate = 1.0 - violations.toDouble / truth.size
    assert(passRate >= 1.0 - delta, s"pass rate $passRate < ${1 - delta}")
  }

  test("exact in the collision-free regime (few keys, wide sketch)") {
    val stream = StreamFixtures.zipfStream(10000, 50)
    val truth = StreamFixtures.exactCounts(stream)
    val cm = CountMinSketch(5, 1 << 16)
    stream.foreach { case (k, w) => cm.update(k, w) }
    truth.foreach { case (k, t) => assert(cm.query(k) === t) }
  }

  test("update linearity: chunked weights ≡ single weighted update (ref 500-byte chunking)") {
    // the reference chunks big values into 500-unit packets
    // (/root/reference/Simulation/CountMax.cs:245-252); CM is linear so the
    // result must be identical
    val a = CountMinSketch(4, 1024)
    val b = CountMinSketch(4, 1024)
    a.update("k1", 12345L)
    var rem = 12345L
    while (rem > 0) { val c = math.min(500L, rem); b.update("k1", c); rem -= c }
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
  }

  test("merge of disjoint partitions == single-pass sketch, bit-exact") {
    val stream = StreamFixtures.weightedZipfStream(30000, 3000)
    val single = build(stream, 0.005, 0.01)
    val parts = StreamFixtures.split(stream, 7)
    val merged = parts.map(p => build(p, 0.005, 0.01)).reduce(_ merge _)
    assert(java.util.Arrays.equals(single.serialize(), merged.serialize()))
  }

  test("merge is associative and commutative (bit-exact, shuffled orders)") {
    val stream = StreamFixtures.zipfStream(12000, 1000)
    val parts = StreamFixtures.split(stream, 6).map(p => build(p, 0.01, 0.05))
    val rnd = new scala.util.Random(7)
    val baseline = parts.map(_.copySketch()).reduce(_ merge _).serialize()
    for (_ <- 0 until 10) {
      val shuffled = rnd.shuffle(parts).map(_.copySketch())
      // random association: fold left vs fold right alternating
      val left = shuffled.reduce(_ merge _).serialize()
      assert(java.util.Arrays.equals(left, baseline))
    }
    val rightFold = parts.map(_.copySketch()).reduceRight(_ merge _).serialize()
    assert(java.util.Arrays.equals(rightFold, baseline))
  }

  test("serialize round-trip preserves state and answers") {
    val stream = StreamFixtures.weightedZipfStream(5000, 500)
    val cm = build(stream, 0.01, 0.01)
    val back = CountMinSketch.deserialize(cm.serialize())
    assert(back.depth === cm.depth && back.width === cm.width && back.seed === cm.seed)
    assert(back.totalWeight === cm.totalWeight)
    StreamFixtures.exactCounts(stream).keys.foreach { k =>
      assert(back.query(k) === cm.query(k))
    }
    assert(java.util.Arrays.equals(back.serialize(), cm.serialize()))
  }

  test("incompatible merge is rejected") {
    val a = CountMinSketch(4, 1024)
    val b = CountMinSketch(5, 1024)
    intercept[IllegalArgumentException] { a.merge(b) }
  }
}
