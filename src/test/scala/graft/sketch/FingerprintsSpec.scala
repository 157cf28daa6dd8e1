package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

class FingerprintsSpec extends AnyFunSuite {

  private def tokens(s: String): Seq[String] = s.split("\\s+").toSeq

  test("MinHash signature estimates Jaccard within sampling error") {
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 2000).map(i => s"w$i")
    for (overlap <- Seq(0.2, 0.5, 0.8)) {
      val shared = rnd.shuffle(vocab).take((500 * overlap).toInt)
      val aOnly = rnd.shuffle(vocab).take(500 - shared.size).map(_ + "_a")
      val bOnly = rnd.shuffle(vocab).take(500 - shared.size).map(_ + "_b")
      val a = (shared ++ aOnly).toSet
      val b = (shared ++ bOnly).toSet
      val trueJ = MinHash.exactJaccard(a.map(_.toString), b.map(_.toString))
      val est = MinHash.estimateJaccard(
        MinHash.signature(a, 256), MinHash.signature(b, 256))
      // stderr ~ sqrt(J(1-J)/k) ≈ 0.03 at k=256; allow 4 sigma
      assert(math.abs(est - trueJ) <= 0.13, s"overlap=$overlap true=$trueJ est=$est")
    }
  }

  test("MinHash identical sets → identical signatures; band hashes collide") {
    val a = MinHash.signature(Set("x", "y", "z"), 64)
    val b = MinHash.signature(Set("z", "y", "x"), 64) // order-independent
    assert(a.toSeq === b.toSeq)
    assert(MinHash.bandHashes(a, 16, 4).toSeq === MinHash.bandHashes(b, 16, 4).toSeq)
  }

  test("SimHash: near-duplicate docs have small hamming distance, unrelated docs large") {
    val base = (0 until 200).map(i => s"token$i")
    val nearDup = base.updated(5, "changed1").updated(100, "changed2")
    val unrelated = (0 until 200).map(i => s"other$i")
    val h1 = SimHash.simhash64(base)
    val h2 = SimHash.simhash64(nearDup)
    val h3 = SimHash.simhash64(unrelated)
    assert(SimHash.hammingDistance(h1, h2) <= 8,
      s"near-dup dist ${SimHash.hammingDistance(h1, h2)}")
    assert(SimHash.hammingDistance(h1, h3) >= 20,
      s"unrelated dist ${SimHash.hammingDistance(h1, h3)}")
  }

  test("rolling hash: window fingerprints match direct substring fingerprints") {
    val s = "the quick brown fox jumps over the lazy dog repeatedly and often"
    val w = 8
    val fps = RollingHash.windowFingerprints(s, w)
    assert(fps.length === s.length - w + 1)
    for (i <- fps.indices) {
      assert(fps(i) === RollingHash.fingerprint(s.substring(i, i + w)), s"window $i")
    }
  }

  test("winnowing: shared fingerprints for overlapping docs, robust to local edit") {
    val doc1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val doc2 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val f1 = RollingHash.winnow(doc1, 6, 4).toSet
    val f2 = RollingHash.winnow(doc2, 6, 4).toSet
    val overlap = f1.intersect(f2).size.toDouble / math.max(f1.size, f2.size)
    assert(overlap >= 0.5, s"overlap=$overlap")
    val f3 = RollingHash.winnow("completely different content with nothing shared", 6, 4).toSet
    assert(f1.intersect(f3).isEmpty)
  }

  test("tokens helper sanity") {
    assert(tokens("a b  c").filter(_.nonEmpty) === Seq("a", "b", "c"))
  }
}
