package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class HllBloomSpec extends AnyFunSuite {

  test("HLL estimate within 3·stderr across cardinalities") {
    for (trueCard <- Seq(100, 1000, 10000, 100000)) {
      val hll = HyperLogLog(14)
      (0 until trueCard).foreach(i => hll.add(s"item_$i"))
      val est = hll.estimate()
      val tolerance = 3 * hll.standardError * trueCard
      assert(math.abs(est - trueCard) <= math.max(tolerance, 2.0),
        s"card=$trueCard est=$est tol=$tolerance")
    }
  }

  test("HLL duplicate inserts do not change the estimate (idempotent adds)") {
    val a = HyperLogLog(12)
    val b = HyperLogLog(12)
    (0 until 5000).foreach(i => a.add(i.toLong))
    (0 until 5000).foreach { i => b.add(i.toLong); b.add(i.toLong); b.add(i.toLong) }
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
  }

  test("HLL merge of disjoint partitions == single-pass, bit-exact; order-invariant") {
    val keys = (0 until 40000).map(i => s"k$i")
    val single = HyperLogLog(13)
    keys.foreach(single.add)
    val parts = StreamFixtures.split(keys, 8).map { slice =>
      val h = HyperLogLog(13)
      slice.foreach(h.add)
      h
    }
    val rnd = new scala.util.Random(3)
    for (_ <- 0 until 5) {
      val merged = rnd.shuffle(parts).map(_.copySketch()).reduce(_ merge _)
      assert(java.util.Arrays.equals(merged.serialize(), single.serialize()))
    }
    // overlapping merge is also fine (idempotent max)
    val overlapped = parts.map(_.copySketch()).reduce(_ merge _).merge(parts.head.copySketch())
    assert(java.util.Arrays.equals(overlapped.serialize(), single.serialize()))
  }

  test("HLL serialize round-trip") {
    val h = HyperLogLog(10)
    (0 until 1234).foreach(i => h.add(i.toLong))
    val back = HyperLogLog.deserialize(h.serialize())
    assert(back.estimate() === h.estimate())
  }

  test("Bloom has no false negatives") {
    val bf = BloomFilter.fromExpected(10000, 0.01)
    val keys = (0 until 10000).map(i => s"member_$i")
    keys.foreach(bf.add)
    keys.foreach(k => assert(bf.mightContain(k), s"false negative: $k"))
  }

  test("Bloom FPP close to target") {
    val n = 20000
    val fpp = 0.01
    val bf = BloomFilter.fromExpected(n, fpp)
    (0 until n).foreach(i => bf.add(s"in_$i"))
    val probes = 50000
    val fps = (0 until probes).count(i => bf.mightContain(s"out_$i"))
    val observed = fps.toDouble / probes
    assert(observed < fpp * 2.5, s"observed FPP $observed >> target $fpp")
    assert(bf.expectedFpp < fpp * 1.5)
  }

  test("Bloom merge OR == single-pass; order-invariant; no false negatives after merge") {
    val keys = (0 until 30000).map(i => s"k$i")
    val single = BloomFilter.fromExpected(30000, 0.001)
    keys.foreach(single.add)
    val parts = StreamFixtures.split(keys, 6).map { slice =>
      val b = BloomFilter.fromExpected(30000, 0.001)
      slice.foreach(b.add)
      b
    }
    val rnd = new scala.util.Random(9)
    for (_ <- 0 until 5) {
      val merged = rnd.shuffle(parts).map(_.copySketch()).reduce(_ merge _)
      assert(java.util.Arrays.equals(merged.serialize(), single.serialize()))
    }
  }

  test("Bloom serialize round-trip") {
    val bf = BloomFilter.fromExpected(500, 0.01)
    (0 until 500).foreach(i => bf.add(i.toLong))
    val back = BloomFilter.deserialize(bf.serialize())
    assert(back.numBits === bf.numBits && back.numHashes === bf.numHashes)
    (0 until 500).foreach(i => assert(back.mightContain(i.toLong)))
    assert(java.util.Arrays.equals(back.serialize(), bf.serialize()))
  }
}
