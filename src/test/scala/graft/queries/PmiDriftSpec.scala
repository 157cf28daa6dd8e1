package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q91 (PMI collocations) and q92 (χ² source drift): driver-side JVM
  * reference models at sf0.001, the monotone-lift/PMI contract, and a
  * planted-drift fixture. */
class PmiDriftSpec extends SparkTestBase {

  import spark.implicits._

  // ---- q91 ----

  private def refPmi(dir: String): Seq[(Long, String, Long, Long, Long, Long, Long)] = {
    val texts = Tables.documents(spark, dir)
      .filter(col("text").isNotNull).select("text").as[String].collect()
    val census = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts) {
      val ws = t.split(' ')
      for (i <- 0 until ws.length - 1) {
        val bg = ws(i) + " " + ws(i + 1)
        census(bg) = census.getOrElse(bg, 0L) + 1L
      }
    }
    val n = census.values.sum
    val la = census.groupBy(_._1.split(' ')(0)).map { case (a, m) => (a, m.values.sum) }
    val rb = census.groupBy(_._1.split(' ')(1)).map { case (b, m) => (b, m.values.sum) }
    census.toSeq.filter(_._2 >= TextQueries.PmiMinCount)
      .map { case (bg, cab) =>
        val Array(a, b) = bg.split(' ')
        (bg, cab, la(a), rb(b), cab * n * 1000000L / (la(a) * rb(b)))
      }
      .sortBy { case (bg, _, _, _, l) => (-l, bg) }
      .take(TextQueries.PmiTopK).zipWithIndex
      .map { case ((bg, cab, ca, cb, l), i) =>
        ((i + 1).toLong, bg, cab, ca, cb, l, TextQueries.pmiMicroOfLift(l))
      }
  }

  test("q91: gate output equals the JVM reference model at sf0.001") {
    val dir = sf("sf0.001")
    val got = TextQueries.pmiCollocations(spark, dir)
      .as[(Long, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === refPmi(dir))
    spark.catalog.clearCache()
  }

  test("q91: lift order IS the PMI order (ln is monotone), support floor holds") {
    val rows = TextQueries.pmiCollocations(spark, sf("sf0.001")).collect()
    assert(rows.length === TextQueries.PmiTopK)
    val lifts = rows.map(_.getAs[Long]("lift_micro")).toSeq
    val pmis = rows.map(_.getAs[Long]("pmi_micro")).toSeq
    assert(lifts === lifts.sorted.reverse)
    assert(pmis === pmis.sorted.reverse, "pmi must be non-increasing with lift")
    assert(rows.forall(_.getAs[Long]("cab") >= TextQueries.PmiMinCount.toLong))
    // pmi_micro re-derives from lift through the one shared libm site
    for (r <- rows)
      assert(r.getAs[Long]("pmi_micro") ===
        TextQueries.pmiMicroOfLift(r.getAs[Long]("lift_micro")))
    spark.catalog.clearCache()
  }

  // ---- q96 ----

  private def refPpl(dir: String): Seq[(Long, Long, Long, Long, Long)] = {
    val texts = Tables.documents(spark, dir)
      .filter(col("text").isNotNull).select("doc_id", "text")
      .as[(Long, String)].collect()
    val census = scala.collection.mutable.Map.empty[String, Long]
    val vocab = scala.collection.mutable.Set.empty[String]
    val perDoc = texts.map { case (did, t) =>
      val ws = t.split(' ')
      vocab ++= ws
      did -> (0 until ws.length - 1).map(i => ws(i) + " " + ws(i + 1))
    }
    perDoc.foreach { case (_, bgs) =>
      bgs.foreach(bg => census(bg) = census.getOrElse(bg, 0L) + 1L) }
    val la = census.groupBy(_._1.split(' ')(0))
      .map { case (a, m) => (a, m.values.sum) }
    val v = vocab.size.toLong
    val term = census.keys.map(bg =>
      bg -> TextQueries.pplTermMicro(census(bg) + 1, la(bg.split(' ')(0)) + v))
      .toMap
    perDoc.filter(_._2.nonEmpty).map { case (did, bgs) =>
      val nll = bgs.map(term).sum
      (did, bgs.length.toLong, nll, nll / bgs.length)
    }.sortBy { case (did, _, _, m) => (-m, did) }
      .take(TextQueries.PplTopK).zipWithIndex
      .map { case ((did, n, nll, m), i) => ((i + 1).toLong, did, n, nll, m) }
      .toSeq
  }

  test("q96: gate output equals the JVM reference add-one bigram LM at sf0.001") {
    val dir = sf("sf0.001")
    val got = TextQueries.lmPerplexity(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === refPpl(dir))
    spark.catalog.clearCache()
  }

  test("q96: every surprisal term is positive and frequent bigrams surprise less") {
    val (v, model) = TextQueries.lmModel(spark, sf("sf0.001"))
    assert(v > 0L)
    assert(model.nonEmpty)
    assert(model.forall(_._4 > 0L), "den = ca+V > cab+1 = num always")
    // within one left context (fixed ca), term is non-increasing in cab
    model.groupBy(_._1.split(' ')(0)).values.foreach { g =>
      val byCab = g.sortBy(_._2)
      byCab.sliding(2).foreach {
        case Seq((_, c1, _, t1), (_, c2, _, t2)) =>
          if (c1 < c2) assert(t1 >= t2,
            s"surprisal must not grow with count: cab=$c1 t=$t1 vs cab=$c2 t=$t2")
        case _ =>
      }
    }
    spark.catalog.clearCache()
  }

  // ---- q92 ----

  private def refDrift(words: Seq[(String, String)]): Seq[(String, Long, Long)] = {
    val wc = words.groupBy(_._2).map { case (w, g) => (w, g.size.toLong) }
    val voc = wc.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(TextQueries.DriftVocab).map(_._1).toSet
    val buck = words.map { case (s, w) => (s, if (voc(w)) w else "<other>") }
    val corpus = buck.groupBy(_._2).map { case (b, g) => (b, g.size.toLong) }
    val totals = buck.groupBy(_._1).map { case (s, g) => (s, g.size.toLong) }
    val o = buck.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val nTot = corpus.values.sum
    totals.toSeq.sortBy(_._1).map { case (s, nS) =>
      val drift = corpus.map { case (b, c) =>
        val po = o.getOrElse((s, b), 0L) * 1000000L / nS
        val pe = math.max(c * 1000000L / nTot, 1L)
        (po - pe) * (po - pe) / pe
      }.sum
      (s, nS, drift)
    }
  }

  test("q92: gate output equals the JVM reference model at sf0.001") {
    val dir = sf("sf0.001")
    val words = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .as[(String, String)].collect().toSeq
    val got = TextQueries.sourceDrift(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === refDrift(words))
    spark.catalog.clearCache()
  }

  test("q92: a planted skewed source drifts far beyond balanced ones") {
    // two sources drawing the same distribution, one source heavily skewed
    val balanced = for {
      s <- Seq("a", "b"); i <- 0 until 300
    } yield (s, Seq("alpha", "beta", "gamma", "delta")(i % 4))
    val skewed = (0 until 300).map(i =>
      ("c", if (i % 10 == 0) Seq("beta", "gamma", "delta")(i % 3) else "alpha"))
    val got = TextQueries.sourceDriftOn((balanced ++ skewed).toDF("source", "w"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set("a", "b", "c"))
    // the corpus mixture is itself pulled toward the skewed source, so the
    // balanced sources drift a little too — dominance, not a 10× cliff,
    // is the correct expectation (measured ~4× on this fixture)
    val (da, db, dc) = (got("a")._2, got("b")._2, got("c")._2)
    assert(dc > 3L * math.max(da, db),
      s"skewed source must dominate: a=$da b=$db c=$dc")
    assert(da === db, "identically-distributed sources must drift identically")
    spark.catalog.clearCache()
  }

  test("q92: a sub-micro expected bucket is clamped, not silently dropped") {
    // zeta carries < 10⁻⁶ of a 1,100,001-token corpus, so p_e floors to 0;
    // unclamped, BOTH engines would return NULL on the ÷0 and sum() would
    // drop the statistic's dominant term without any gate noticing. With
    // the clamp every value below is exact integer arithmetic.
    val bulk = spark.range(1100000L)
      .select(lit("y").as("source"), lit("alpha").as("w"))
    val rare = spark.range(1L).select(lit("z").as("source"), lit("zeta").as("w"))
    val got = TextQueries.sourceDriftOn(bulk.union(rare))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // y: alpha term ⌊1²/999999⌋ = 0, zeta miss (0−1)²/1 = 1
    assert(got("y") === ((1100000L, 1L)))
    // z: alpha miss 999999² div 999999 + zeta (10⁶−1)² div 1
    assert(got("z") === ((1L, 999999L + 999999L * 999999L)))
    spark.catalog.clearCache()
  }

  test("q92: drift terms are non-negative and zero-bucket sources still count the miss") {
    // source 'z' never emits 'alpha' — the (0 - p_e)²/p_e term must appear
    val words = Seq.fill(100)(("y", "alpha")) ++ Seq.fill(100)(("y", "beta")) ++
      Seq.fill(100)(("z", "beta"))
    val got = TextQueries.sourceDriftOn(words.toDF("source", "w"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("z")._2 > got("y")._2, s"missing-bucket drift must register: $got")
    assert(got.values.forall(_._2 >= 0L))
    spark.catalog.clearCache()
  }
}
