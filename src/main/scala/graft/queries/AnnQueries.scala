package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sketch.XxHash64

/**
 * Similarity search over the `embeddings` table (`Array[Float]` vectors).
 *
 * Cosine similarity is computed entirely with codegen'd higher-order
 * functions (`zip_with` + `aggregate`) in double precision — no UDF in the
 * hot path, summation strictly in array order (both properties matter: the
 * former for whole-stage codegen, the latter for bit-parity with the DuckDB
 * oracle).
 *
 * Scale paths:
 * - brute-force top-k: broadcast the (tiny) query set, one pass over the
 *   corpus, `ORDER BY ... LIMIT` per query (TakeOrdered — no global sort);
 * - random-hyperplane LSH: bucket join — each vector hashes to a signature
 *   of sign bits; candidates only form within a bucket, so the pair space
 *   never goes quadratic. Recall vs brute force is asserted in ScalaTest.
 */
object AnnQueries {

  /** dot(a,b) over double-cast arrays, in array order. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** q24: brute-force cosine top-10 neighbors for the 5 lowest-id query
    * vectors (excluding self-matches). */
  def cosineTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val pairs = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        floor(cosine(col("qvec"), col("embedding")) * 1000000.0).cast("long")
          .as("sim_micro"))
    // per-query top-10: rank within query partition
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(desc("sim_micro"), asc("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("sim_micro"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** q25: embedding near-duplicate pairs above cosine 0.35, within label
    * blocks (label = the table's natural coarse cluster; DuckDB-mirrored). */
  def cosineNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(cosine(col("va"), col("vb")) * 1000000.0).cast("long").as("sim_micro"))
      .filter(col("sim_micro") >= 350000L)
      .orderBy(col("id_a"), col("id_b"))
  }

  private val HyperplaneBits = 12

  /** Random-hyperplane signs: bit i = sign(dot(v, h_i)) with h_i a
    * deterministic ±1 hyperplane derived from xxhash64(i, dim). */
  val lshBucketUdf: Array[Float] => Long = (vec: Array[Float]) => {
    var sig = 0L
    var i = 0
    while (i < HyperplaneBits) {
      var s = 0.0
      var d = 0
      while (d < vec.length) {
        // ±1 component: bit parity of a per-(plane,dim) hash
        val h = XxHash64.hashLong(i.toLong << 32 | d.toLong, 0x5ca1ab1eL)
        s += (if ((h & 1L) == 0L) vec(d) else -vec(d))
        d += 1
      }
      if (s >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** q39: IVF (inverted-file) ANN — the second scale path beside LSH:
    * deterministic coarse centroids (every 50th vector), one assignment pass
    * (argmin cosine over the broadcast centroid set), then queries probe only
    * their 2 nearest centroids' inverted lists. Output: per-query top-5 from
    * the probed lists. Oracle-less (argmin-assignment is not reasonably
    * SQL-expressible); recall vs brute force asserted in AnnSpec. */
  def ivfTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // assignment pass: nearest centroid per vector (broadcast centroids)
    val assigned = emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cid"),
        cosine(col("embedding"), col("cvec")).as("csim"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(desc("csim"), asc("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
    // queries probe their 2 nearest centroids
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(cosine(col("qvec"), col("cvec")).desc, asc("cid"))))
      .filter(col("rn") <= 2)
      .select(col("query_id"), col("qvec"), col("cid"))
    val candidates = probes.join(assigned, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        floor(cosine(col("qvec"), col("embedding")) * 1000000.0).cast("long")
          .as("sim_micro"))
    candidates.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(desc("sim_micro"), asc("neighbor_id"))))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("rn"), col("neighbor_id"), col("sim_micro"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** q26: LSH-bucketed approximate neighbor candidates: bucket census —
    * shows the bucketing plan (shuffle on signature, pairs within bucket).
    * Recall vs brute force asserted in AnnSpec. */
  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketUdf = udf(lshBucketUdf)
    Tables.embeddings(spark, sfDir)
      .select(bucketUdf(col("embedding")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(desc("n_vectors"), asc("bucket"))
      .limit(20)
  }
}
