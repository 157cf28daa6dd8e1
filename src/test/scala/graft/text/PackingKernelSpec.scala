package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests (scalacheck) for the q48 packing kernel. */
class PackingKernelSpec extends AnyFunSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(300)
    .withInitialSeed(org.scalacheck.rng.Seed(0x5eedL))

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(params, prop)
    assert(res.passed, s"$name: $res")
  }

  private val sizesGen: Gen[(Array[Long], Long)] = for {
    cap <- Gen.choose(1L, 10000L)
    n <- Gen.choose(0, 200)
    sizes <- Gen.listOfN(n, Gen.choose(1L, cap * 2)) // includes oversized docs
  } yield (sizes.toArray, cap)

  test("window ids are contiguous from 0 and nondecreasing") {
    check("contiguous", Prop.forAll(sizesGen) { case (sizes, cap) =>
      val a = GreedyPacker.assign(sizes, cap)
      a.isEmpty || (a.head == 0 &&
        a.sliding(2).forall(p => p.length < 2 || p(1) - p(0) == 0 || p(1) - p(0) == 1))
    })
  }

  test("every window fits the capacity unless it is a single oversized doc") {
    check("fits", Prop.forAll(sizesGen) { case (sizes, cap) =>
      val a = GreedyPacker.assign(sizes, cap)
      sizes.indices.groupBy(a(_)).values.forall { idxs =>
        val total = idxs.map(sizes(_)).sum
        total <= cap || (idxs.length == 1 && sizes(idxs.head) > cap)
      }
    })
  }

  test("greedy tightness: the first doc of each window overflows the previous") {
    check("tight", Prop.forAll(sizesGen) { case (sizes, cap) =>
      val a = GreedyPacker.assign(sizes, cap)
      val firstOf = sizes.indices.groupBy(a(_)).map { case (w, idxs) => w -> idxs.min }
      val fillOf = sizes.indices.groupBy(a(_)).map { case (w, idxs) =>
        w -> idxs.map(sizes(_)).sum
      }
      (1 until fillOf.size).forall { w =>
        fillOf(w - 1) + sizes(firstOf(w)) > cap
      }
    })
  }

  test("window count is within 2x of the volume lower bound for in-capacity docs") {
    check("bound", Prop.forAll(sizesGen) { case (sizes, cap) =>
      val inCap = sizes.filter(_ <= cap)
      val wins = GreedyPacker.windowCount(inCap, cap)
      val lower = (inCap.sum + cap - 1) / cap
      // first-fit-in-order never uses more than 2x the fractional lower
      // bound: consecutive windows sum to > cap
      wins <= 2 * lower + 1 && wins >= lower
    })
  }

  test("empty input packs to zero windows") {
    assert(GreedyPacker.windowCount(Array.empty[Long], 100L) === 0L)
    assert(GreedyPacker.assign(Array.empty[Long], 100L).isEmpty)
  }
}
