package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class QuantileSpec extends AnyFunSuite {

  private def exactDiscreteQuantile(sorted: Array[Double], q: Double): Double = {
    val target = math.max(1L, math.ceil(q * sorted.length).toLong).toInt
    sorted(target - 1)
  }

  private def exactRank(sorted: Array[Double], x: Double): Double =
    sorted.count(_ < x).toDouble / sorted.length

  private val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  test("KLL exact regime: no compaction → quantiles equal exact discrete quantiles") {
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(5000)(rnd.nextDouble() * 1000)
    val kll = KllSketch(8192)
    xs.foreach(kll.update)
    val sorted = xs.sorted
    probs.foreach { q =>
      assert(kll.quantile(q) === exactDiscreteQuantile(sorted, q), s"q=$q")
    }
  }

  test("KLL compaction regime: rank error within bound (uniform + lognormal)") {
    val rnd = new scala.util.Random(13)
    for (dist <- Seq("uniform", "lognormal")) {
      val xs = Array.fill(200000)(dist match {
        case "uniform" => rnd.nextDouble()
        case _ => math.exp(rnd.nextGaussian() * 2)
      })
      val kll = KllSketch(200)
      xs.foreach(kll.update)
      val sorted = xs.sorted
      probs.foreach { q =>
        val est = kll.quantile(q)
        val trueRank = exactRank(sorted, est)
        // k=200 → ~1.65% normalized rank error (99% conf); allow 3%
        assert(math.abs(trueRank - q) <= 0.03, s"$dist q=$q rankErr=${math.abs(trueRank - q)}")
      }
    }
  }

  test("KLL merge preserves rank bound; merged n is the sum") {
    val rnd = new scala.util.Random(17)
    val xs = Array.fill(100000)(rnd.nextGaussian())
    val parts = StreamFixtures.split(xs.toIndexedSeq, 8)
    val merged = parts.map { p =>
      val k = KllSketch(200)
      p.foreach(k.update)
      k
    }.reduce(_ merge _)
    assert(merged.n === xs.length.toLong)
    val sorted = xs.sorted
    probs.foreach { q =>
      val est = merged.quantile(q)
      assert(math.abs(exactRank(sorted, est) - q) <= 0.04, s"q=$q")
    }
  }

  test("KLL determinism: same input order → bit-identical serialization") {
    val xs = (0 until 50000).map(i => (XxHash64.hashLong(i.toLong, 5L) % 1000).toDouble)
    val a = KllSketch(128)
    val b = KllSketch(128)
    xs.foreach(a.update)
    xs.foreach(b.update)
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
  }

  test("KLL serialize round-trip") {
    val xs = (0 until 30000).map(_.toDouble)
    val kll = KllSketch(256)
    xs.foreach(kll.update)
    val back = KllSketch.deserialize(kll.serialize())
    assert(back.n === kll.n)
    probs.foreach(q => assert(back.quantile(q) === kll.quantile(q)))
  }

  test("t-digest rank accuracy, tails tighter than middle") {
    val rnd = new scala.util.Random(19)
    val xs = Array.fill(200000)(math.exp(rnd.nextGaussian()))
    val td = TDigest(200)
    xs.foreach(td.update)
    val sorted = xs.sorted
    probs.foreach { q =>
      val est = td.quantile(q)
      val rankErr = math.abs(exactRank(sorted, est) - q)
      assert(rankErr <= 0.02, s"q=$q rankErr=$rankErr")
    }
    // tail quantiles: very tight
    for (q <- Seq(0.001, 0.999)) {
      val est = td.quantile(q)
      assert(math.abs(exactRank(sorted, est) - q) <= 0.005, s"tail q=$q")
    }
  }

  test("t-digest merge preserves accuracy; total weight sums") {
    val rnd = new scala.util.Random(23)
    val xs = Array.fill(120000)(rnd.nextDouble() * 100)
    val parts = StreamFixtures.split(xs.toIndexedSeq, 6)
    val merged = parts.map { p =>
      val t = TDigest(200)
      p.foreach(t.update)
      t
    }.reduce(_ merge _)
    assert(merged.totalWeight === xs.length.toDouble)
    val sorted = xs.sorted
    probs.foreach { q =>
      assert(math.abs(exactRank(sorted, merged.quantile(q)) - q) <= 0.03, s"q=$q")
    }
  }

  test("t-digest bounded size: centroids ~ O(compression) at large n") {
    val td = TDigest(100)
    val rnd = new scala.util.Random(29)
    (0 until 500000).foreach(_ => td.update(rnd.nextDouble()))
    assert(td.centroidCount <= 2 * 100, s"centroids=${td.centroidCount}")
  }

  test("t-digest serialize round-trip") {
    val td = TDigest(100)
    (0 until 10000).foreach(i => td.update(math.sin(i.toDouble)))
    val back = TDigest.deserialize(td.serialize())
    assert(back.totalWeight === td.totalWeight)
    probs.foreach(q => assert(back.quantile(q) === td.quantile(q)))
  }
}
