package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/**
 * SketchVisor fast-path kernel (S12/S13): hand-traced kick-out semantics
 * against the reference algorithm (/root/reference/Simulation/SketchVisor.cs:33-105)
 * plus regime properties. (Rounding of ê uses round-half-up; the C# uses
 * banker's rounding — indistinguishable off the exact .5 midpoints, which
 * the irrational (1−δ)^(1/θ) factor essentially never hits.)
 */
class SketchVisorSpec extends AnyFunSuite {

  test("hand-traced kick-out rounds (K=2)") {
    val sv = new SketchVisor(2)
    assert(!sv.update("a", 30)) // insert {e=0,r=30,d=0}
    assert(!sv.update("b", 10)) // insert {e=0,r=10,d=0}
    // full; rs={30,10,90}: a1=90,a2=30,ak=10, b=89/29, ê=round(10·0.95^(1/θ))=11
    // a→(0,19,11); b→r=-1 evicted; c admitted (90>11) as {e=0,r=79,d=11}; E=11
    assert(sv.update("c", 90))
    assert(sv.query("a") === 30L)
    assert(sv.query("b") === 0L)
    assert(sv.query("c") === 90L)
    // rs={19,79,1}: ê=round(1·1.1146)=1; nobody dies; d (1 > 1 false) refused
    assert(sv.update("d", 1))
    assert(sv.query("a") === 30L)
    assert(sv.query("c") === 90L)
    assert(sv.query("d") === 0L)
    // rs={18,78,14}: ê=round(14·1.1183)=16; a→(0,2,28), c→(0,62,28); e refused
    assert(sv.update("e", 14))
    assert(sv.query("a") === 30L)
    assert(sv.query("c") === 90L)
    assert(sv.totalKickRounds === 3L)
    assert(sv.size === 2)
  }

  test("late insert carries e = E/2 compensation") {
    val sv = new SketchVisor(2)
    sv.update("a", 30); sv.update("b", 10)
    sv.update("c", 90) // kick round: E=11, b evicted, c admitted → full again
    // rs={19,79,25}: ê=round(19·1.0912)=21 → a (r=-2) evicted; y admitted in
    // the SAME round with e = PRE-round E = 11 → query = 4 + 21 + 11/2 = 30
    assert(sv.update("y", 25))
    assert(sv.query("y") === 30L)
    assert(sv.query("a") === 0L)
    assert(sv.query("c") === 90L)
  }

  test("all-monitored regime is exact (the q45 oracle regime)") {
    val rnd = new Random(42)
    val keys = (1 to 200).map(i => s"k$i")
    val stream = Seq.fill(20000)(keys(math.min(199, (-math.log(rnd.nextDouble()) * 30).toInt)))
    val sv = new SketchVisor(4096)
    val exact = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    stream.foreach { k => sv.update(k, 1L); exact(k) += 1L }
    assert(sv.totalKickRounds === 0L)
    exact.foreach { case (k, c) => assert(sv.query(k) === c, k) }
    assert(sv.query("never-seen") === 0L)
  }

  test("kick-out regime: heavy keys survive with sane estimates") {
    val rnd = new Random(7)
    val sv = new SketchVisor(64)
    val exact = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    // zipf-ish: key i with weight ~ 1/i over 2000 keys
    (1 to 200000).foreach { _ =>
      val i = math.max(1, math.min(2000, (1.0 / math.pow(rnd.nextDouble(), 1.3)).toInt))
      val k = s"k$i"
      sv.update(k, 1L)
      exact(k) += 1L
    }
    assert(sv.totalKickRounds > 0L)
    val top = exact.toSeq.sortBy(-_._2).take(8)
    top.foreach { case (k, c) =>
      val est = sv.query(k)
      assert(est >= 0L, s"$k negative")
      assert(est <= 2L * c + sv.totalWeight / 32,
        s"$k est $est way above true $c")
      assert(est >= c / 2, s"$k heavy key lost: est $est vs true $c")
    }
  }
}
