package graft.sketch

/**
 * Document-fingerprint kernels for near-duplicate detection over text /
 * embedding corpora. These extend the engine beyond the reference's operator
 * set into the training-data-pipeline territory the north star targets; all
 * algorithms are the published ones (Broder 1997 MinHash; Charikar 2002
 * SimHash; Indyk–Motwani LSH; Karp–Rabin rolling hash).
 */
object MinHash {
  final val DefaultSeed = 0x5d1e9a3c7f2b8460L

  /** k-value MinHash signature over a token set, using h_i = h1 + i·h2
    * double hashing per token (one 128-bit hash per token total). */
  def signature(tokens: Iterable[String], k: Int, seed: Long = DefaultSeed): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val it = tokens.iterator
    while (it.hasNext) {
      val h = Hash128.ofString(it.next(), seed)
      var i = 0
      while (i < k) {
        val v = h.row(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Estimated Jaccard similarity from two signatures. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "signature length mismatch")
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** LSH banding: hash each of `bands` consecutive `rowsPerBand`-slices of
    * the signature to one 64-bit bucket key. Two docs collide in some band
    * with prob 1 − (1 − s^r)^b for Jaccard s. */
  def bandHashes(sig: Array[Long], bands: Int, rowsPerBand: Int,
      seed: Long = DefaultSeed): Array[Long] = {
    require(bands * rowsPerBand <= sig.length, "bands*rowsPerBand exceeds signature")
    val out = new Array[Long](bands)
    val buf = new Array[Byte](rowsPerBand * 8)
    var b = 0
    while (b < bands) {
      var r = 0
      while (r < rowsPerBand) {
        val v = sig(b * rowsPerBand + r)
        var j = 0
        while (j < 8) { buf(r * 8 + j) = ((v >>> (8 * j)) & 0xFF).toByte; j += 1 }
        r += 1
      }
      out(b) = XxHash64.hashBytes(buf, seed + b)
      b += 1
    }
    out
  }

  /** Exact Jaccard over two token sets (verification step after LSH). */
  def exactJaccard(a: Set[String], b: Set[String]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else (a intersect b).size.toDouble / (a union b).size
  }
}

object SimHash {
  final val DefaultSeed = 0x3c7a1f5e9b2d8c46L

  /** 64-bit SimHash of a token multiset: per bit, sum +1/−1 votes weighted
    * by token multiplicity; bit set iff the sum is positive. */
  def simhash64(tokens: Iterable[String], seed: Long = DefaultSeed): Long = {
    val votes = new Array[Int](64)
    val it = tokens.iterator
    while (it.hasNext) {
      val h = XxHash64.hashString(it.next(), seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

object RollingHash {
  /** Karp–Rabin polynomial rolling fingerprint over the whole string,
    * mod 2^61−1 (Mersenne prime; branch-free reduction). */
  final val Mod = (1L << 61) - 1
  final val Base = 262147L

  @inline private def mulMod(a: Long, b: Long): Long = {
    // 61-bit modular multiply via Math.multiplyHigh (JDK 9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // split product into (hi:lo); reduce mod 2^61-1
    var r = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    while (r >= Mod) r -= Mod
    r
  }

  def fingerprint(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = mulMod(h, Base) + s.charAt(i)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  /** Fingerprints of all w-length character windows (winnowing input). */
  def windowFingerprints(s: String, w: Int): Array[Long] = {
    if (s.length < w) return Array(fingerprint(s))
    val out = new Array[Long](s.length - w + 1)
    // precompute Base^(w-1) mod p
    var pw = 1L
    var i = 0
    while (i < w - 1) { pw = mulMod(pw, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) {
      h = mulMod(h, Base) + s.charAt(i)
      if (h >= Mod) h -= Mod
      i += 1
    }
    out(0) = h
    i = w
    while (i < s.length) {
      // remove leading char, add trailing
      val lead = mulMod(pw, s.charAt(i - w).toLong)
      h = h - lead
      if (h < 0) h += Mod
      h = mulMod(h, Base) + s.charAt(i)
      if (h >= Mod) h -= Mod
      out(i - w + 1) = h
      i += 1
    }
    out
  }

  /** Winnowing (Schleimer et al. 2003): min fingerprint of each window of
    * `windowSize` consecutive w-gram hashes, deduplicated — a compact
    * document fingerprint set robust to local edits. */
  def winnow(s: String, w: Int, windowSize: Int): Array[Long] = {
    val fps = windowFingerprints(s, w)
    if (fps.length <= windowSize) return Array(fps.min)
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var i = 0
    while (i + windowSize <= fps.length) {
      var m = fps(i)
      var j = i + 1
      while (j < i + windowSize) { if (fps(j) < m) m = fps(j); j += 1 }
      out += m
      i += 1
    }
    out.toArray
  }
}
