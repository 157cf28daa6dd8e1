package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Bilinear resize (the one multimodal transform that is real math, not a
  * codec stub): identity, corner alignment, interpolation values, bounds. */
class ResizeSpec extends AnyFunSuite {

  private val grid2x2 = Array(0f, 1f, 2f, 3f) // rows: [0,1] / [2,3]

  test("identity resize returns the same grid") {
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 4))) {
      val g = Array.tabulate(w * h)(_.toFloat)
      assert(Multimodal.resizeBilinear(g, w, h, w, h).toSeq === g.toSeq)
    }
  }

  test("align-corners: output corners equal input corners") {
    val g = Array.tabulate(16)(i => (i * 7 % 13).toFloat) // 4x4
    val out = Multimodal.resizeBilinear(g, 4, 4, 9, 7)
    assert(out(0) === g(0))
    assert(out(8) === g(3))          // top-right
    assert(out(6 * 9) === g(12))     // bottom-left
    assert(out(6 * 9 + 8) === g(15)) // bottom-right
  }

  test("2x2 -> 3x3 midpoints are exact bilinear averages") {
    val out = Multimodal.resizeBilinear(grid2x2, 2, 2, 3, 3)
    assert(out.toSeq === Seq(0f, 0.5f, 1f, 1f, 1.5f, 2f, 2f, 2.5f, 3f))
  }

  test("downscale to 1x1 samples the top-left (align-corners degenerate)") {
    assert(Multimodal.resizeBilinear(grid2x2, 2, 2, 1, 1).toSeq === Seq(0f))
  }

  test("rejects mis-sized grids") {
    intercept[IllegalArgumentException] {
      Multimodal.resizeBilinear(grid2x2, 3, 2, 2, 2)
    }
  }
}
