package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q94: the integer Lloyd loop against a driver-side JVM reference at
  * sf0.001, planted-geometry recovery, the refinement contract and the
  * empty-cluster carry rule. */
class KmeansSpec extends SparkTestBase {

  import spark.implicits._

  private def quantize(emb: Seq[Float]): Seq[Long] =
    emb.map(x => math.floor(x.toDouble * 256).toLong + AnnQueries.KmShift)

  /** Scalar reference Lloyd — same seeds, rounds, tie and carry rules. */
  private def refKmeans(vecs: Map[Long, Seq[Long]], rounds: Int)
      : Seq[(Long, Long, Long, Long, Long)] = {
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cent: Map[Long, Seq[Long]] = vecs.collect {
      case (id, v) if id % AnnQueries.KmSeedStride == 0 &&
        id < AnnQueries.KmSeedStride * AnnQueries.KmK =>
        (id / AnnQueries.KmSeedStride) -> v
    }
    def assign(c: Map[Long, Seq[Long]]): Map[Long, Long] =
      vecs.map { case (id, v) =>
        id -> c.keys.minBy(cid => (d2(v, c(cid)), cid))
      }
    for (_ <- 1 to rounds) {
      val a = assign(cent)
      cent = cent.map { case (cid, prev) =>
        val members = a.collect { case (id, c) if c == cid => vecs(id) }.toSeq
        cid -> (if (members.isEmpty) prev
          else prev.indices.map(j => members.map(_(j)).sum / members.size))
      }
    }
    val fin = assign(cent)
    cent.keys.toSeq.sorted.map { cid =>
      val members = fin.collect { case (id, c) if c == cid => id }.toSeq
      (cid, members.size.toLong,
        members.map(id => d2(vecs(id), cent(cid))).sum,
        cent(cid).zipWithIndex.map { case (x, j) => (j + 1) * x }.sum,
        cent(cid).sum)
    }
  }

  test("q94: gate output equals the JVM reference Lloyd loop at sf0.001") {
    val dir = sf("sf0.001")
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1).toSeq)).toMap
    val got = AnnQueries.kmeansClusterQ(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === refKmeans(vecs, AnnQueries.KmRounds))
    spark.catalog.clearCache()
  }

  test("q94: refinement never increases inertia (3 rounds <= 1 round)") {
    val dir = sf("sf0.001")
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1).toSeq)).toMap
    val i1 = refKmeans(vecs, 1).map(_._3).sum
    val i3 = refKmeans(vecs, AnnQueries.KmRounds).map(_._3).sum
    assert(i3 <= i1, s"Lloyd must not diverge: round1=$i1 round3=$i3")
    spark.catalog.clearCache()
  }

  test("q94: planted well-separated blobs are recovered exactly") {
    // three tight blobs around distinct anchors; one seed lands in each
    // (ids 0/64/128 by the stride rule — cap vec_id below 192 so k
    // effectively = 3 live seeds + 5 empty never-assigned centroids is
    // avoided by feeding lloyd directly with 3 seeds)
    val anchors = Seq(Seq.fill(4)(0L), Seq.fill(4)(100L), Seq.fill(4)(200L))
    val vecs = (0 until 30).map { i =>
      val a = anchors(i % 3)
      (i.toLong, a.map(_ + (i / 3) % 2)) // ±1 jitter
    }
    val v = vecs.toDF("vec_id", "qv")
    val seeds = Seq(0L -> anchors(0).map(_ + 7L),
      1L -> anchors(1).map(_ + 7L), 2L -> anchors(2).map(_ + 7L))
    val (fin, cent) = AnnQueries.lloyd(spark, v, seeds, 2)
    val byCluster = fin.select(col("vec_id"), col("cid"))
      .as[(Long, Long)].collect().groupBy(_._2).view
      .mapValues(_.map(_._1).sorted.toSeq).toMap
    assert(byCluster(0L) === (0L until 30L by 3))
    assert(byCluster(1L) === (1L until 30L by 3))
    assert(byCluster(2L) === (2L until 30L by 3))
    // centroids converge to the blob means (10 members: 5 at a, 5 at a+1
    // per dim -> sum = 10a+5, div 10 = a)
    assert(cent.toMap.apply(1L) === anchors(1))
    spark.catalog.clearCache()
  }

  private def md5U(id: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) + 1L
  }

  test("q95: gate output equals the JVM reference balanced pick at sf0.001") {
    val dir = sf("sf0.001")
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quantize(r.getSeq[Float](1).toSeq)).toMap
    // reference: rebuild the final assignment via refKmeans's rules, then
    // pick M per cluster by (md5 priority, vec_id)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cent: Map[Long, Seq[Long]] = vecs.collect {
      case (id, v) if id % AnnQueries.KmSeedStride == 0 &&
        id < AnnQueries.KmSeedStride * AnnQueries.KmK =>
        (id / AnnQueries.KmSeedStride) -> v
    }
    for (_ <- 1 to AnnQueries.KmRounds) {
      val a = vecs.map { case (id, v) =>
        id -> cent.keys.minBy(c => (d2(v, cent(c)), c)) }
      cent = cent.map { case (cid, prev) =>
        val ms = a.collect { case (id, c) if c == cid => vecs(id) }.toSeq
        cid -> (if (ms.isEmpty) prev
          else prev.indices.map(j => ms.map(_(j)).sum / ms.size))
      }
    }
    val fin = vecs.map { case (id, v) =>
      id -> cent.keys.minBy(c => (d2(v, cent(c)), c)) }
    val ref = cent.keys.toSeq.sorted.flatMap { cid =>
      val mem = fin.collect { case (id, c) if c == cid => id }.toSeq
        .sortBy(id => (md5U(id), id))
      mem.take(AnnQueries.KmSampleM).zipWithIndex.map { case (id, i) =>
        (cid, (i + 1).toLong, id, md5U(id), d2(vecs(id), cent(cid)),
          mem.size.toLong)
      }
    }
    val got = AnnQueries.clusterSample(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === ref)
    // balance invariant: every cluster contributes exactly min(n, M) rows
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length === math.min(rows.head._6, AnnQueries.KmSampleM.toLong))
    }
    spark.catalog.clearCache()
  }

  test("q94: a cluster that loses every member carries its previous centroid") {
    val vecs = (0 until 10).map(i => (i.toLong, Seq(5L, 5L)))
    val v = vecs.toDF("vec_id", "qv")
    val far = Seq(100000L, 100000L)
    val (fin, cent) = AnnQueries.lloyd(spark, v,
      Seq(0L -> Seq(6L, 6L), 1L -> far), 2)
    assert(cent.toMap.apply(1L) === far, "emptied cluster must keep its seed")
    assert(cent.toMap.apply(0L) === Seq(5L, 5L))
    assert(fin.filter(col("cid") === 1L).count() === 0L)
    spark.catalog.clearCache()
  }
}
