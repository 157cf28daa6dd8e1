package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class AnnSpec extends SparkTestBase {

  import spark.implicits._

  test("HOF cosine matches a scala-side reference implementation") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-1.0f, 0.5f, 2.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)))
    val df = vecs.toDF("id", "v")
    val a = df.select(col("id").as("id_a"), col("v").as("va"))
    val b = df.select(col("id").as("id_b"), col("v").as("vb"))
    val got = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        AnnQueries.cosine(col("va"), col("vb")).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, s) => (x, y) -> s }.toMap
    def ref(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    for (i <- vecs.indices; j <- vecs.indices if vecs(i)._1 < vecs(j)._1) {
      val expect = ref(vecs(i)._2, vecs(j)._2)
      assert(math.abs(got((vecs(i)._1, vecs(j)._1)) - expect) < 1e-12)
    }
  }

  test("LSH buckets: high-cosine pairs collide far more often than random ones") {
    // deterministic pseudo-random vectors + planted near-duplicates
    val rnd = new scala.util.Random(99)
    val base = Array.fill(200)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val nearDups = base.take(50).map { v =>
      v.zipWithIndex.map { case (x, i) => if (i % 16 == 0) x + 0.05f else x }
    }
    val nearBits = base.take(50).zip(nearDups).count { case (a, b) =>
      AnnQueries.lshBucketUdf(a) == AnnQueries.lshBucketUdf(b)
    }
    val randPairs = (0 until 100).count { i =>
      AnnQueries.lshBucketUdf(base(i)) == AnnQueries.lshBucketUdf(base(199 - i))
    }
    assert(nearBits >= 35, s"near-dup bucket collisions: $nearBits/50")
    assert(randPairs <= 5, s"random bucket collisions: $randPairs/100")
  }

  test("locality audit holds in the divisor>1 subset regime (16k clustered vectors)") {
    // the gate tables never exceed the subset target, so this fixture is
    // the one place the hashSubset divisor>1 path of q26 actually runs
    // (review r4 finding): 16384 vectors in 32 clusters, 16-dim — subset
    // ~1024 (divisor 16), same-bucket pairs dominated by same-cluster
    // pairs, so within > background must still verdict 1
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(32)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 16384).map { i =>
      val c = centers(i % 32)
      (i.toLong, c.map(x => x + 0.1f * rnd.nextGaussian().toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val row = AnnQueries.lshBucketLocalityOn(emb, target = 1024L).head()
    assert(row.getAs[Long]("n_vectors") === 16384L)
    assert(row.getAs[Long]("locality_ok") === 1L)
    spark.catalog.clearCache()
  }

  test("IVF ANN: recall vs brute force on the (isotropic) gate table") {
    val brute = AnnQueries.cosineTopK(spark, sf("sf0.01")).collect()
      .filter(_.getAs[Int]("rn") <= 5)
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val ivf = AnnQueries.ivfTopK(spark, sf("sf0.01")).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = brute.map { case (q, exact) =>
      ivf.getOrElse(q, Set.empty).intersect(exact).size.toDouble / exact.size
    }
    val avgRecall = recalls.sum / recalls.size
    // these embeddings are near-isotropic, so IVF recall tracks scan
    // fraction (measured grid in the ivfTopK scaladoc); 0.88 at the default
    assert(avgRecall >= 0.8, s"avg IVF recall $avgRecall")
    assert(ivf.values.forall(_.nonEmpty))
  }

  test("IVF ANN: recall >= 0.9 at a ~20% scan on cluster-structured embeddings") {
    // IVF's actual domain: 10 tight clusters; nprobe=2 of 10 lists
    val rnd = new scala.util.Random(1234)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 500).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val brute = (0L until 5L).map { q =>
      val qv = vecs(q.toInt)._2
      q -> vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    }.toMap
    val ivf = AnnQueries.ivfTopKOn(emb, every = 50, nprobe = 2).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val recalls = brute.map { case (q, exact) =>
      ivf.getOrElse(q, Set.empty).intersect(exact).size.toDouble / exact.size
    }
    val avgRecall = recalls.sum / recalls.size
    assert(avgRecall >= 0.9, s"clustered IVF recall $avgRecall")
  }

  test("int8 quantization preserves neighbors: IVF-SQ8 vs float IVF (q49 ∘ q39)") {
    // the composition an index actually ships: inverted lists store int8
    // codes; search runs over reconstructions. Same clustered fixture as
    // above, vectors replaced by their symmetric-int8 reconstructions.
    val rnd = new scala.util.Random(1234)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 500).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }
    def quantize(v: Array[Float]): Array[Float] = {
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      if (scale == 0.0) v.map(_ => 0.0f)
      else v.map { x =>
        ((math.floor(math.abs(x) / scale + 0.5) * math.signum(x.toDouble)) * scale).toFloat
      }
    }
    val embFloat = vecs.toDF("vec_id", "embedding")
    val embQ = vecs.map { case (id, v) => (id, quantize(v)) }.toDF("vec_id", "embedding")
    def top5(emb: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      AnnQueries.ivfTopKOn(emb, every = 50, nprobe = 2).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val f = top5(embFloat)
    val q = top5(embQ)
    val overlap = f.map { case (k, s) =>
      q.getOrElse(k, Set.empty).intersect(s).size.toDouble / s.size }
    val avg = overlap.sum / overlap.size
    assert(avg >= 0.8, s"IVF-SQ8 vs float-IVF neighbor overlap $avg")
  }

  test("brute-force top-k on testdata matches per-query exact ranking") {
    val got = AnnQueries.cosineTopK(spark, sf("sf0.001"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    // ranks are 1..10 per query, sims non-increasing within query
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Int]("rn"))
      assert(ordered.map(_.getAs[Int]("rn")).toSeq === (1 to ordered.length))
      val sims = ordered.map(_.getAs[Long]("sim_micro")).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }
}
