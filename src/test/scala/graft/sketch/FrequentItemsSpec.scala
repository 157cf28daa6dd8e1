package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/** CountSketch / Misra-Gries / FSS / CountMax kernel semantics. */
class FrequentItemsSpec extends AnyFunSuite {

  private lazy val stream = StreamFixtures.zipfStream(100000, 5000, s = 1.1)
  private lazy val truth = StreamFixtures.exactCounts(stream)

  // ---- CountSketch

  test("CountSketch: unbiased-median error within 4·sqrt(F2/w)") {
    val cs = CountSketch(5, 2048)
    stream.foreach { case (k, w) => cs.update(k, w) }
    val f2 = truth.values.map(v => v.toDouble * v).sum
    val bound = 4 * math.sqrt(f2 / 2048)
    val bad = truth.count { case (k, t) => math.abs(cs.query(k) - t) > bound }
    assert(bad.toDouble / truth.size < 0.05, s"$bad of ${truth.size} beyond L2 bound")
  }

  test("CountSketch: heavy keys estimated tightly; merge == single pass bit-exact") {
    val single = CountSketch(5, 4096)
    stream.foreach { case (k, w) => single.update(k, w) }
    val top = truth.toSeq.sortBy(-_._2).take(20)
    top.foreach { case (k, t) =>
      assert(math.abs(single.query(k) - t) <= 0.05 * t + 50, s"$k true=$t est=${single.query(k)}")
    }
    val parts = StreamFixtures.split(stream, 8).map { p =>
      val s = CountSketch(5, 4096)
      p.foreach { case (k, w) => s.update(k, w) }
      s
    }
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 3) {
      val merged = rnd.shuffle(parts).map(_.copySketch()).reduce(_ merge _)
      assert(java.util.Arrays.equals(merged.serialize(), single.serialize()))
    }
  }

  test("CountSketch f2Estimate: exact when no row collides; AMS bound on the zipf stream") {
    // few keys, wide rows: whp every row places the 8 keys in distinct
    // cells, and then each row's sum of squares IS F2 exactly (signs
    // square away) — deterministic under the fixed seed
    val cs = CountSketch(5, 4096)
    val small = (1 to 8).map(i => s"key$i" -> i.toLong * 3)
    small.foreach { case (k, w) => (1L to w).foreach(_ => cs.update(k, 1L)) }
    val f2Small = small.map { case (_, w) => w * w }.sum
    assert(cs.f2Estimate === f2Small)
    // full zipf stream: the median estimate sits inside the sqrt(8/w) tail
    val big = CountSketch(5, 4096)
    stream.foreach { case (k, w) => big.update(k, w) }
    val f2 = truth.values.map(v => v.toDouble * v).sum
    assert(math.abs(big.f2Estimate - f2) <= math.sqrt(8.0 / 4096) * f2,
      s"est=${big.f2Estimate} exact=$f2")
    // merge linearity: counters add, so the merged estimate is bit-equal
    val halves = stream.zipWithIndex.partition(_._2 % 2 == 0)
    val (a, b) = (CountSketch(5, 4096), CountSketch(5, 4096))
    halves._1.foreach { case ((k, w), _) => a.update(k, w) }
    halves._2.foreach { case ((k, w), _) => b.update(k, w) }
    assert(a.merge(b).f2Estimate === big.f2Estimate)
  }

  test("CountSketch serialize round-trip") {
    val cs = CountSketch(3, 512)
    stream.take(5000).foreach { case (k, w) => cs.update(k, w) }
    val back = CountSketch.deserialize(cs.serialize())
    truth.keys.take(100).foreach(k => assert(back.query(k) === cs.query(k)))
  }

  // ---- Misra-Gries

  test("MisraGries: never overestimates; undercount ≤ N/(capacity+1)") {
    val mg = MisraGries(500)
    stream.foreach { case (k, w) => mg.update(k, w) }
    val n = mg.totalWeight
    assert(mg.errorBound <= n / 501 + 1, s"errorBound ${mg.errorBound} vs ${n / 501}")
    truth.foreach { case (k, t) =>
      val est = mg.query(k)
      assert(est <= t, s"$k overestimated: $est > $t")
      assert(est >= t - mg.errorBound, s"$k undercount beyond bound")
    }
  }

  test("MisraGries: exact when capacity ≥ distinct keys") {
    val small = StreamFixtures.zipfStream(20000, 300)
    val mg = MisraGries(1024)
    small.foreach { case (k, w) => mg.update(k, w) }
    StreamFixtures.exactCounts(small).foreach { case (k, t) =>
      assert(mg.query(k) === t)
    }
    assert(mg.errorBound === 0L)
  }

  test("MisraGries merge keeps the additive bound") {
    val parts = StreamFixtures.split(stream, 6).map { p =>
      val m = MisraGries(500)
      p.foreach { case (k, w) => m.update(k, w) }
      m
    }
    val merged = parts.reduce(_ merge _)
    val n = merged.totalWeight
    assert(n === stream.length.toLong)
    truth.foreach { case (k, t) =>
      val est = merged.query(k)
      assert(est <= t)
      assert(est >= t - merged.errorBound, s"$k: est=$est t=$t bound=${merged.errorBound}")
    }
    // bound still useful: ≤ sum of per-part bounds + merge trims
    assert(merged.errorBound <= 12 * (n / 501) + 12)
    // serialize round-trip
    val back = MisraGries.deserialize(merged.serialize())
    assert(back.entries === merged.entries)
  }

  // ---- Filtered Space-Saving

  test("FSS: f ≥ true ≥ f − e for monitored keys; heavy keys always monitored") {
    val fss = FilteredSpaceSaving(numEntries = 1000, numBuckets = 4096)
    stream.foreach { case (k, w) => fss.update(k, w) }
    val n = fss.totalWeight
    val heavy = truth.filter { case (_, t) => t > n / 1000 }
    heavy.foreach { case (k, t) =>
      val f = fss.query(k)
      assert(f > 0L, s"heavy key $k unmonitored")
      assert(f >= t, s"$k f=$f < true=$t")
      assert(fss.guaranteedCount(k) <= t, s"$k guaranteed > true")
    }
  }

  test("FSS: exact when entries ≥ distinct keys") {
    val small = StreamFixtures.zipfStream(20000, 300)
    val fss = FilteredSpaceSaving(numEntries = 1024)
    small.foreach { case (k, w) => fss.update(k, w) }
    StreamFixtures.exactCounts(small).foreach { case (k, t) =>
      assert(fss.query(k) === t)
      assert(fss.guaranteedCount(k) === t)
    }
  }

  test("FSS merge: bounds stay sound, heavy keys survive") {
    val parts = StreamFixtures.split(stream, 4).map { p =>
      val f = FilteredSpaceSaving(numEntries = 1000, numBuckets = 4096)
      p.foreach { case (k, w) => f.update(k, w) }
      f
    }
    val merged = parts.reduce(_ merge _)
    assert(merged.totalWeight === stream.length.toLong)
    val n = merged.totalWeight
    truth.filter(_._2 > n / 500).foreach { case (k, t) =>
      val f = merged.query(k)
      assert(f >= t, s"$k merged f=$f < true=$t")
      assert(merged.guaranteedCount(k) <= t)
    }
    val back = FilteredSpaceSaving.deserialize(merged.serialize())
    assert(back.entries.toSet === merged.entries.toSet)
  }

  // ---- CountMax (single-partition parity fixture)

  test("CountMax: hand-traced update rule parity (d=1, w=1 — pure majority vote)") {
    // One slot: the reference's update rule reduces to Boyer-Moore voting
    // (CountMax.cs:32-49). Trace: +a5 (a,5), +b3 (a,2), +b3 (b,1), +a1 (a,0->... )
    val cm = CountMax(1, 1)
    cm.update("a", 5) // slot: (a,5)
    assert(cm.query("a") === 5L)
    cm.update("b", 3) // counter 5>3 → (a,2)
    assert(cm.query("a") === 2L && cm.query("b") === 0L)
    cm.update("b", 3) // 2<3 → (b, 3-2=1)
    assert(cm.query("b") === 1L && cm.query("a") === 0L)
    cm.update("a", 1) // 1==1 → not > → (a, 1-1=0)
    assert(cm.query("a") === 0L && cm.query("b") === 0L)
    cm.update("a", 4) // 0<4 → (a, 4-0=4)
    assert(cm.query("a") === 4L)
    assert(cm.getAllKeys === Set("a"))
  }

  test("CountMax: heavy hitters recovered on zipf stream (reference accuracy role)") {
    val cmx = CountMax(2, 1024) // reference's d=2 config (hy_k experiments)
    stream.foreach { case (k, w) => cmx.update(k, w) }
    val k = 50
    val trueTop = truth.toSeq.sortBy { case (key, c) => (-c, key) }.take(k).map(_._1).toSet
    val candidates = cmx.getAllKeys
    val hit = trueTop.count(candidates.contains)
    assert(hit >= (0.9 * k).toInt, s"only $hit/$k heavy keys in candidate slots")
    // estimates for recovered heavy keys are in a sane band (majority-vote
    // estimates undershoot; reference evaluates relative error empirically)
    trueTop.filter(candidates.contains).foreach { key =>
      assert(cmx.query(key) <= truth(key) * 2, s"$key wildly overestimated")
    }
  }

  test("CountMax serialize round-trip") {
    val cmx = CountMax(2, 256)
    stream.take(10000).foreach { case (k, w) => cmx.update(k, w) }
    val back = CountMax.deserialize(cmx.serialize())
    assert(back.getAllKeys === cmx.getAllKeys)
    cmx.getAllKeys.foreach(k => assert(back.query(k) === cmx.query(k)))
  }
}
