package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Triangle-tiled exact all-pairs enumeration — the distributed layout for
 * Ω(pairs) work (exact low-threshold similarity joins, brute-force parity
 * twins). Each row lands in group g = xxhash64(id) mod G; the left side
 * replicates to tiles (g, j ≥ g), the right to (i ≤ g, g), and an EQUI-join
 * on (block…, i, j) forms every unordered pair exactly once: a cross-group
 * pair (a < b by group) meets only at tile (g_a, g_b) with a on the left,
 * and same-group tiles keep one orientation via the id-order filter. No
 * CartesianProduct node anywhere; each block spreads over G(G+1)/2 even
 * tasks instead of one straggler task per block. Replication cost ~G/2× of
 * the input through the shuffle — size G to the cluster, not the data.
 */
object PairTiling {

  /** All unordered pairs (id_a < id_b) within `blockCols` blocks (empty =
    * whole frame). Output columns: blockCols ++ (id_a, id_b) ++ every other
    * input column twice with `_a`/`_b` suffixes (`_a` = smaller-id side). */
  def allPairs(df: DataFrame, idCol: String, blockCols: Seq[String],
      g: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val others = df.columns.filterNot(c => c == idCol || blockCols.contains(c)).toSeq
    val withG = df.withColumn("__g", pmod(xxhash64(col(idCol)), lit(g)).cast("int"))
    val left = withG
      .crossJoin(spark.range(g).select(col("id").cast("int").as("__j")))
      .filter(col("__j") >= col("__g"))
      .select(blockCols.map(col) ++ Seq(col("__g").as("__i"), col("__j"),
        col(idCol).as("__idl")) ++ others.map(c => col(c).as(s"${c}__l")): _*)
    val right = withG
      .crossJoin(spark.range(g).select(col("id").cast("int").as("__i")))
      .filter(col("__i") <= col("__g"))
      .select(blockCols.map(col) ++ Seq(col("__i"), col("__g").as("__j"),
        col(idCol).as("__idr")) ++ others.map(c => col(c).as(s"${c}__r")): _*)
    val aFirst = col("__idl") < col("__idr")
    left.join(right, blockCols ++ Seq("__i", "__j"))
      .filter((col("__i") < col("__j") && col("__idl") =!= col("__idr")) ||
        (col("__i") === col("__j") && col("__idl") < col("__idr")))
      .select(blockCols.map(col) ++ Seq(
        least(col("__idl"), col("__idr")).as("id_a"),
        greatest(col("__idl"), col("__idr")).as("id_b")) ++
        others.flatMap(c => Seq(
          when(aFirst, col(s"${c}__l")).otherwise(col(s"${c}__r")).as(s"${c}_a"),
          when(aFirst, col(s"${c}__r")).otherwise(col(s"${c}__l")).as(s"${c}_b"))): _*)
  }

  /** Divisor of the deterministic audit subset: ~`target` rows survive
    * `xxhash64(id) % divisor == 0` at ANY corpus size, so an Ω(subset²)
    * parity twin stays constant-cost while the corpus grows (the q56
    * discipline, VERDICT r3 item 1). */
  def hashSubsetDivisor(n: Long, target: Long = 1024L): Long =
    math.max(1L, n / target)

  /** The subset itself. The filter is kept even when the divisor is 1
    * (pmod(h, 1) = 0 always) so the plan SHAPE is scale-independent and
    * PlanGuardSpec can pin "the brute twin tiles the subset, never the full
    * frame" at any fixture size. */
  def hashSubset(df: DataFrame, idCol: String, n: Long,
      target: Long = 1024L): DataFrame =
    df.filter(pmod(xxhash64(col(idCol)), lit(hashSubsetDivisor(n, target))) === 0L)

  /** Set-equality of two (id_a, id_b) pair frames as a single-row 0/1
    * column named `outCol` — computed in-plan (anti-join-free signed
    * multiset diff), no driver action. */
  def pairParity(a: DataFrame, b: DataFrame, outCol: String): DataFrame = {
    val diff = a.select(col("id_a"), col("id_b")).withColumn("__s", lit(1L))
      .unionAll(b.select(col("id_a"), col("id_b")).withColumn("__s", lit(-1L)))
      .groupBy(col("id_a"), col("id_b")).agg(sum(col("__s")).as("__d"))
      .filter(col("__d") =!= 0L)
    diff.agg(when(count(lit(1)) === 0L, 1L).otherwise(0L).as(outCol))
  }
}
