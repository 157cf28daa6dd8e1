package graft.sketch

/**
 * Deterministic weighted-key stream fixtures (FIXTURES.md F2): zipf-skewed
 * keys replayed in order, with an exact ground-truth map computed alongside —
 * the reference's pattern of carrying `flow.Traffic` as truth next to every
 * key (/root/reference/Simulation/Flow.cs:51; (true, est) pair collection at
 * /root/reference/Simulator/Program.cs:482-489).
 */
object StreamFixtures {

  /** Zipf(s) sampler over ranks 1..n via inverse-CDF on a seeded uniform. */
  final class Zipf(n: Int, s: Double, seed: Long) {
    private val cdf: Array[Double] = {
      val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1.0, s))
      val total = w.sum
      val out = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += w(i) / total; out(i) = acc; i += 1 }
      out(n - 1) = 1.0
      out
    }
    private var counter = 0L
    /** rank in [0, n) */
    def next(): Int = {
      counter += 1
      val u = (XxHash64.hashLong(counter, seed) >>> 11).toDouble / (1L << 53).toDouble
      val idx = java.util.Arrays.binarySearch(cdf, u)
      if (idx >= 0) idx else -(idx + 1)
    }
  }

  /** `count` (key, weight) pairs, zipf-skewed key ranks, weight 1. */
  def zipfStream(count: Int, keySpace: Int, s: Double = 1.1,
      seed: Long = 42L): IndexedSeq[(String, Long)] = {
    val z = new Zipf(keySpace, s, seed)
    (0 until count).map(_ => (s"key_${z.next()}", 1L))
  }

  /** Weighted variant: heavy-tailed weights, exercising weight chunking. */
  def weightedZipfStream(count: Int, keySpace: Int, seed: Long = 43L): IndexedSeq[(String, Long)] = {
    val z = new Zipf(keySpace, 1.1, seed)
    (0 until count).map { i =>
      val w = 1L + (XxHash64.hashLong(i.toLong, seed ^ 0xabcdL) & 0xFFL)
      (s"key_${z.next()}", w)
    }
  }

  def exactCounts(stream: Iterable[(String, Long)]): Map[String, Long] =
    stream.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }

  /** The reference generator's trace-resampling recipe as a pure kernel
    * (/root/reference/Generator/Program.cs:39-53, the NewGen loop): sort
    * the empirical traffic values descending, linearly interpolate to
    * `count` values with the near-integer snap at |m − round(m)| < 0.001
    * and int truncation. One definition shared by this kernel surface and
    * the Spark-expression twin `CorpusGenerator.traceShapedTotals` —
    * cross-checked value-equal in TraceShapeSpec. */
  def traceInterpolate(refTraffics: Array[Double], count: Int): Array[Long] = {
    require(refTraffics.length >= 2 && count >= 2)
    val sorted = refTraffics.sorted(Ordering[Double].reverse)
    val scale = (count - 1).toDouble / (sorted.length - 1)
    Array.tabulate(count) { i =>
      val m = i / scale
      if (math.abs(m - math.round(m)) < 0.001) sorted(math.round(m).toInt).toInt.toLong
      else {
        val a = math.floor(m).toInt
        val b = -math.floor(-m).toInt
        val c = m - a
        (c * sorted(b) + (1 - c) * sorted(a)).toInt.toLong
      }
    }
  }

  /** Per-key totals → packet-chunked update stream in flow order (the
    * reference's replay: each flow's value split into `chunk`-size packets,
    * /root/reference/Simulation/CountMax.cs:245-252), Σw preserved. */
  def chunkedTraceStream(totals: Array[Long], chunk: Long): IndexedSeq[(String, Long)] =
    totals.toIndexedSeq.zipWithIndex.flatMap { case (t, i) =>
      if (t <= 0) IndexedSeq.empty
      else {
        val full = (t / chunk).toInt
        val rem = t - full * chunk
        IndexedSeq.fill(full)((s"flow$i", chunk)) ++
          (if (rem > 0) IndexedSeq((s"flow$i", rem)) else IndexedSeq.empty)
      }
    }

  /** Traffic values of a committed reference coflow JSON (tiny file; naive
    * field scrape keeps the kernel surface Spark-free). */
  def coflowTraffics(path: String): Array[Double] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8)
    "\"traffic\":([0-9.eE+-]+)".r.findAllMatchIn(text)
      .map(_.group(1).toDouble).toArray
  }

  /** Split a stream into `parts` contiguous slices (partition simulation). */
  def split[T](stream: IndexedSeq[T], parts: Int): Seq[IndexedSeq[T]] = {
    val size = math.max(1, (stream.length + parts - 1) / parts)
    stream.grouped(size).toSeq
  }
}
