package graft.sketch

import scala.collection.mutable

/**
 * SketchVisor fast path (Huang et al., "SketchVisor: Robust Network
 * Measurement for Software Packet Processing", SIGCOMM 2017) — the elastic
 * top-k buffer with adaptive kick-out that the reference runs per switch
 * (/root/reference/Simulation/SketchVisor.cs:33-112). Round 1 substituted
 * Misra-Gries for its ROLE (documented in COVERAGE.md); this is the actual
 * algorithm, re-derived from the paper + the reference's observable
 * semantics:
 *
 * - each monitored key holds (e, r, d): `e` = the global kick-out mass E at
 *   insertion time (compensates evictions the key missed), `r` = residual
 *   count since insertion, `d` = mass this key donated to kick-out rounds;
 * - a miss on a full buffer triggers a kick-out round: threshold
 *   ê = (1−δ)^(1/θ)·a_k with θ = log_b(1/2), b = (a₁−1)/(a₂−1) over the
 *   residuals {r} ∪ {v} (a₁ ≥ a₂ the two largest, a_k the smallest) — the
 *   paper's closed-form estimate of the cut that evicts ~half the tail;
 *   every entry pays ê from r into d, entries driven below zero are evicted,
 *   and the incoming key is admitted only if v > ê and a slot freed;
 * - query = r + d + e/2 for monitored keys, 0 otherwise
 *   (SketchVisor.cs:92-105).
 *
 * Divergence from the reference, stated: when a₂ = 1 the C# computes
 * b = x/0 = ∞, θ = −0, 0.95^(1/θ) = ∞ and ê = round(∞·a_k) — NaN for
 * a_k = 0, which the `checked` arithmetic then turns into an
 * OverflowException (a latent crash, like the C FSS fall-through UB round 1
 * declined to port). Here a non-finite ê is treated as 0 (a no-op kick-out
 * round), which keeps every invariant and never crashes.
 *
 * Order-sensitive like the reference's CountMax (SURVEY.md §7.5): runs
 * single-partition in gate queries; the mergeable production heavy-hitter
 * path remains CM+heap / Misra-Gries / FSS. In the all-monitored regime
 * (capacity ≥ distinct keys) no kick-out ever fires, E stays 0 and the
 * answer is exact — the q45 oracle regime.
 */
final class SketchVisor(val capacity: Int, val delta: Double = 0.05) {
  require(capacity >= 2, "capacity must be >= 2 (threshold needs two residuals)")

  private final class Entry(var e: Long, var r: Long, var d: Long)

  private val map = mutable.LinkedHashMap.empty[String, Entry]
  private var kickMass = 0L // the paper's E
  private var totalV = 0L
  private var kickRounds = 0L

  def size: Int = map.size
  def totalWeight: Long = totalV
  def totalKickRounds: Long = kickRounds

  /** ê over the residual list (reference ComputeThresh, SketchVisor.cs:33-45). */
  private def computeThresh(rs: Array[Long]): Long = {
    var a1 = Long.MinValue; var a2 = Long.MinValue; var ak = Long.MaxValue
    var i = 0
    while (i < rs.length) {
      val v = rs(i)
      if (v > a1) { a2 = a1; a1 = v } else if (v > a2) a2 = v
      if (v < ak) ak = v
      i += 1
    }
    val b = (a1 - 1).toDouble / (a2 - 1).toDouble
    val theta = if (b == 1.0) 1.0 else math.log(0.5) / math.log(b)
    val e = math.pow(1.0 - delta, 1.0 / theta) * ak
    if (!e.isFinite) 0L else math.round(e)
  }

  /** @return true iff this update triggered a kick-out round. */
  def update(key: String, v: Long): Boolean = {
    totalV += v
    map.get(key) match {
      case Some(entry) =>
        entry.r += v
        false
      case None if map.size < capacity =>
        map.put(key, new Entry(kickMass, v, 0L))
        false
      case None =>
        val rs = new Array[Long](map.size + 1)
        var i = 0
        map.valuesIterator.foreach { e => rs(i) = e.r; i += 1 }
        rs(i) = v
        val thresh = computeThresh(rs)
        val dead = mutable.ArrayBuffer.empty[String]
        map.foreach { case (k, e) =>
          e.r -= thresh
          e.d += thresh
          if (e.r < 0) dead += k
        }
        dead.foreach(map.remove)
        if (v > thresh && map.size < capacity)
          map.put(key, new Entry(kickMass, v - thresh, thresh))
        kickMass += thresh
        kickRounds += 1
        true
    }
  }

  /** r + d + e/2 for monitored keys; 0 otherwise (SketchVisor.cs:92-105). */
  def query(key: String): Long = map.get(key) match {
    case Some(e) => e.r + e.d + e.e / 2
    case None => 0L
  }

  /** All monitored keys with their estimates. */
  def entries: Iterator[(String, Long)] =
    map.keysIterator.map(k => (k, query(k)))
}
