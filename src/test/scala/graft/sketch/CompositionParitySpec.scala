package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

/**
 * SURVEY.md §2.2 composition-operator parity (C1/C3/S3/Q4): the reference's
 * replication-style compositions, reproduced kernel-side for fixture parity.
 * (In Spark, partitions see disjoint rows, so production uses merge — these
 * tests pin the *replication* semantics the reference used.)
 */
class CompositionParitySpec extends AnyFunSuite {

  private val stream = StreamFixtures.weightedZipfStream(20000, 500)
  private val truth = StreamFixtures.exactCounts(stream)

  test("S3 PeekUpdate returns the pre-update estimate then applies the update") {
    val a = CountMinSketch(4, 1024)
    val b = CountMinSketch(4, 1024)
    var lastPeek = -1L
    stream.take(1000).foreach { case (k, w) =>
      val pre = a.query(k)
      lastPeek = a.peekUpdate(k, w)
      assert(lastPeek === pre)
      b.update(k, w)
    }
    assert(java.util.Arrays.equals(a.serialize(), b.serialize()))
  }

  test("C1 per-switch manager: min over full replicas == any replica (CM)") {
    // every switch on the path sees the SAME full stream → replication;
    // global query = min over per-switch answers (CountMin.cs:126-143)
    val replicas = Seq.fill(3)(CountMinSketch(4, 2048))
    stream.foreach { case (k, w) => replicas.foreach(_.update(k, w)) }
    truth.keys.take(200).foreach { k =>
      val answers = replicas.map(_.query(k))
      assert(answers.min === answers.head) // identical replicas
    }
  }

  test("C3 HalfSketch: deterministic 2-way split, query = max of the two") {
    // reference splits ingress/egress with p=0.5 and answers max
    // (HalfSketch.cs:39-59); deterministic split by key-hash parity here
    val half1 = CountMinSketch(4, 4096)
    val half2 = CountMinSketch(4, 4096)
    stream.foreach { case (k, w) =>
      if ((XxHash64.hashString(k, 7L) & 1L) == 0L) half1.update(k, w)
      else half2.update(k, w)
    }
    truth.foreach { case (k, t) =>
      val est = math.max(half1.query(k), half2.query(k))
      // each key's whole mass landed in exactly one half → max ≥ true; and
      // in the collision-free regime max == true
      assert(est === t, s"$k")
    }
  }

  test("Q4 RelativeError2: est = max over several sketches (greatest)") {
    val narrow = CountMinSketch(3, 256) // collisions → overestimates
    val wide = CountMinSketch(5, 1 << 15) // exact
    stream.foreach { case (k, w) => narrow.update(k, w); wide.update(k, w) }
    truth.take(100).foreach { case (k, t) =>
      val est = math.max(narrow.query(k), wide.query(k))
      assert(est >= t) // max of never-underestimating sketches
      assert(est === math.max(narrow.query(k), t)) // wide is exact here
    }
  }
}
