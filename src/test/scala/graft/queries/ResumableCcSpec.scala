package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/**
 * Kill/resume for the connected-components loop (VERDICT r2 item 8): a run
 * killed mid-iteration and resumed from its round checkpoints must reach a
 * fixpoint row-identical to an uninterrupted run.
 */
class ResumableCcSpec extends SparkTestBase {
  import spark.implicits._

  // chain components force multi-round convergence (diameter > 1):
  // chains 0-1-2-3-4-5-6-7 (by consecutive ids) per group of 8, plus rings
  private lazy val edges = {
    val chain = (0L until 400L).filter(i => i % 8 != 7).map(i => (i, i + 1))
    val pairs = chain ++ Seq((1000L, 1007L), (1007L, 1003L), (1003L, 1000L))
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst").repartition(8).cache()
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("node", "label").as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("kill after 2 rounds, resume, fixpoint identical to uninterrupted run") {
    val straight = labelsOf(DedupClusterQuery.connectedComponents(edges))
    // every chain of 8 collapses to its minimum
    assert(straight.take(8).map(_._2).forall(_ === 0L))
    assert(straight.filter(_._1 >= 1000L).map(_._2).forall(_ === 1000L))

    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    // crash after 2 rounds: not yet converged (chain diameter is 7)
    val partial = DedupClusterQuery.connectedComponents(
      edges, ckptDir = Some(dir), failAfterRounds = 2)
    assert(labelsOf(partial) !== straight, "fixture converged too early to test resume")
    // resume to completion
    val resumed = DedupClusterQuery.connectedComponents(edges, ckptDir = Some(dir))
    assert(labelsOf(resumed) === straight)
    // a third call is a no-op resume (already converged) with the same answer
    val again = DedupClusterQuery.connectedComponents(edges, ckptDir = Some(dir))
    assert(labelsOf(again) === straight)
  }

  test("star contraction equals min-label propagation on chains and rings") {
    val viaProp = labelsOf(DedupClusterQuery.connectedComponents(edges))
    val viaStar = labelsOf(DedupClusterQuery.connectedComponentsStar(edges))
    assert(viaStar === viaProp)
  }

  test("star contraction: kill after 2 rounds, resume, fixpoint identical") {
    val straight = labelsOf(DedupClusterQuery.connectedComponentsStar(edges))
    val dir = java.nio.file.Files.createTempDirectory("graft-star-ckpt").toString
    val partial = DedupClusterQuery.connectedComponentsStar(
      edges, ckptDir = Some(dir), failAfterRounds = 1)
    // resume to completion must reach the uninterrupted fixpoint
    val resumed = DedupClusterQuery.connectedComponentsStar(edges, ckptDir = Some(dir))
    assert(labelsOf(resumed) === straight)
    val again = DedupClusterQuery.connectedComponentsStar(edges, ckptDir = Some(dir))
    assert(labelsOf(again) === straight)
  }

  test("star contraction needs far fewer rounds than propagation on a chain") {
    // a planted 24-node chain: diameter 23, the propagation worst case
    val chain = (0L until 23L).map(i => (i, i + 1))
    val chainEdges = (chain ++ chain.map(_.swap)).toDF("src", "dst").cache()
    def committedRoundCount(dir: String): Int =
      new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("commit-"))
    val pDir = java.nio.file.Files.createTempDirectory("graft-cc-p").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-cc-s").toString
    val viaProp = labelsOf(DedupClusterQuery.connectedComponents(
      chainEdges, ckptDir = Some(pDir), maxRounds = 40))
    val viaStar = labelsOf(DedupClusterQuery.connectedComponentsStar(
      chainEdges, ckptDir = Some(sDir), maxRounds = 40))
    assert(viaProp === viaStar)
    assert(viaProp.forall(_._2 === 0L)) // one chain, one component, min 0
    val pRounds = committedRoundCount(pDir)
    val sRounds = committedRoundCount(sDir)
    // propagation walks the diameter; star halves depth per phase pair
    assert(pRounds >= 23, s"propagation rounds $pRounds")
    assert(sRounds * 2 < pRounds, s"star rounds $sRounds vs propagation $pRounds")
  }
}
