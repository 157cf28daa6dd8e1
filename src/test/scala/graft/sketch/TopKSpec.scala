package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {

  test("exact regime: wide CM + capacity ≥ distinct keys → exact top-k") {
    val stream = StreamFixtures.zipfStream(50000, 200, s = 1.2)
    val truth = StreamFixtures.exactCounts(stream)
    val sk = TopKSketch(capacity = 512, eps = 0.0001, delta = 0.01)
    stream.foreach { case (k, w) => sk.update(k, w) }
    val expected = truth.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
    val got = sk.topK(20).toSeq
    assert(got === expected)
  }

  test("heavy hitters above ε·N are always in the candidate set (zipf)") {
    val stream = StreamFixtures.zipfStream(200000, 10000, s = 1.1)
    val truth = StreamFixtures.exactCounts(stream)
    val eps = 0.001
    val sk = TopKSketch(capacity = 2000, eps = eps, delta = 0.01)
    stream.foreach { case (k, w) => sk.update(k, w) }
    val n = sk.totalWeight
    val heavy = truth.filter { case (_, c) => c > eps * n }
    val candidates = sk.topK(2000).map(_._1).toSet
    val missed = heavy.keys.filterNot(candidates.contains)
    assert(missed.isEmpty, s"missed heavy keys: ${missed.take(5)}")
    // and estimates respect the CM bound
    heavy.foreach { case (k, t) =>
      val est = sk.estimate(k)
      assert(est >= t && est <= t + (eps * n).toLong, s"$k true=$t est=$est")
    }
  }

  test("ElephantCover-style hit rate vs reference ballpark (top-1% of 200k-update zipf stream)") {
    // reference reports 0.95+ hit rate for CM-variant top-1% at k=1000
    // (/root/reference/data/hy_k_hit_200000.txt; metric ElephantCover at
    // /root/reference/Simulator/Program.cs:715-722)
    val stream = StreamFixtures.zipfStream(200000, 20000, s = 1.0)
    val truth = StreamFixtures.exactCounts(stream)
    val k = math.ceil(truth.size * 0.01).toInt
    val sk = TopKSketch(capacity = 4 * k, eps = 0.0005, delta = 0.01)
    stream.foreach { case (kk, w) => sk.update(kk, w) }
    val trueTop = truth.toSeq.sortBy { case (kk, c) => (-c, kk) }.take(k).map(_._1).toSet
    val estTop = sk.topK(k).map(_._1).toSet
    val hitRate = trueTop.intersect(estTop).size.toDouble / k
    assert(hitRate >= 0.95, s"hit rate $hitRate")
  }

  test("merge of disjoint partitions: exact regime result equals single-pass") {
    val stream = StreamFixtures.weightedZipfStream(40000, 150)
    val single = TopKSketch(capacity = 256, eps = 0.0001, delta = 0.01)
    stream.foreach { case (k, w) => single.update(k, w) }
    val parts = StreamFixtures.split(stream, 8).map { p =>
      val s = TopKSketch(capacity = 256, eps = 0.0001, delta = 0.01)
      p.foreach { case (k, w) => s.update(k, w) }
      s
    }
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 3) {
      val merged = rnd.shuffle(parts)
        .map(p => TopKSketch.deserialize(p.serialize())) // deep copy
        .reduce(_ merge _)
      assert(merged.topK(25).toSeq === single.topK(25).toSeq)
    }
  }

  test("serialize round-trip") {
    val stream = StreamFixtures.zipfStream(10000, 300)
    val sk = TopKSketch(capacity = 128, eps = 0.001, delta = 0.05)
    stream.foreach { case (k, w) => sk.update(k, w) }
    val back = TopKSketch.deserialize(sk.serialize())
    assert(back.topK(50).toSeq === sk.topK(50).toSeq)
    assert(back.totalWeight === sk.totalWeight)
  }
}
