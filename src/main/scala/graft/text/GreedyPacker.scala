package graft.text

/**
 * First-fit-in-order sequence packing kernel (the q48 inner loop, pure and
 * property-testable): items pack into the current window while they fit; an
 * item that would overflow starts a new window; an item larger than the
 * capacity gets its own (overfilled) window.
 */
object GreedyPacker {

  /** Window index (0-based, contiguous) per item. */
  def assign(sizes: Array[Long], capacity: Long): Array[Int] = {
    val out = new Array[Int](sizes.length)
    var fill = 0L
    var w = -1
    var i = 0
    while (i < sizes.length) {
      val n = sizes(i)
      if (w < 0 || fill + n > capacity) { w += 1; fill = n }
      else fill += n
      out(i) = w
      i += 1
    }
    out
  }

  /** Number of windows used (0 for an empty sequence). */
  def windowCount(sizes: Array[Long], capacity: Long): Long =
    if (sizes.isEmpty) 0L else assign(sizes, capacity).last.toLong + 1L
}
