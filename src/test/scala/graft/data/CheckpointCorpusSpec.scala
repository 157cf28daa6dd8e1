package graft.data

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.agg.SketchFunctions._
import graft.sketch.CountMinSketch

class CheckpointCorpusSpec extends SparkTestBase {

  test("corpus generator is deterministic, skewed, and partition-layout independent") {
    val a = CorpusGenerator.full(spark, 20000, 8)
    val b = CorpusGenerator.full(spark, 20000, 3) // different parallelism
    // row i identical regardless of partitioning
    def fingerprint(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("bit_xor(xxhash64(repo, path, commit, lang, content, content_sha))"))
        .head().getLong(0)
    val ha = fingerprint(a)
    val hb = fingerprint(b)
    assert(ha === hb)
    // top language carries >40% of rows (skew stressor per FIXTURES.md F1)
    val top = a.groupBy(col("lang")).count().orderBy(desc("count")).head()
    assert(top.getLong(1) > 8000, s"top lang ${top.getString(0)}=${top.getLong(1)}")
  }

  test("sha256 invariant holds end-to-end (generate → shuffle → verify)") {
    val corpus = CorpusGenerator.full(spark, 10000, 8)
      .repartition(16, col("lang")) // cross a shuffle boundary
    assert(CorpusGenerator.verifySha(corpus) === 0L)
  }

  test("checkpointed shard build + resume == uninterrupted build, bit-exact") {
    val dir = Files.createTempDirectory("ckpt").toString
    val corpus = CorpusGenerator.keyed(spark, 50000, 8).cache()
    // direct single-job build
    val direct = corpus.agg(cm_sketch(col("token"), col("weight"), eps = 1e-3).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    // interrupted build: only 5 of 16 shards, then "crash"
    val done1 = SketchCheckpoint.buildShards(corpus, "token", "weight",
      numShards = 16, ckptDir = dir, eps = 1e-3, failAfterShards = 5)
    assert(done1.size === 5)
    assert(SketchCheckpoint.committedShards(dir) === done1)
    // resume: completes the remaining 11
    val done2 = SketchCheckpoint.buildShards(corpus, "token", "weight",
      numShards = 16, ckptDir = dir, eps = 1e-3)
    assert(done2.size === 16)
    val resumed = SketchCheckpoint.mergeShards(spark, dir)
    val a = CountMinSketch.deserialize(resumed)
    val b = CountMinSketch.deserialize(direct)
    assert(a.totalWeight === b.totalWeight)
    assert(java.util.Arrays.equals(resumed, direct))
    // lineage carries per-shard metrics
    val lin = SketchCheckpoint.lineage(spark, dir).collect()
    assert(lin.length === 16)
    assert(lin.map(_.getAs[Long]("rows_seen")).sum === 50000L)
    corpus.unpersist()
  }

  test("time travel: as-of-snapshot merge reads exactly the commits <= N") {
    val dir = Files.createTempDirectory("ckpt-tt").toString
    val corpus = CorpusGenerator.keyed(spark, 30000, 8).cache()
    // two commits: shards {0..5} then {6..11}
    SketchCheckpoint.buildShards(corpus, "token", "weight",
      numShards = 12, ckptDir = dir, eps = 1e-3, failAfterShards = 6)
    SketchCheckpoint.buildShards(corpus, "token", "weight",
      numShards = 12, ckptDir = dir, eps = 1e-3)
    val snaps = SketchCheckpoint.snapshots(dir)
    assert(snaps.length === 2 && snaps === snaps.sorted)
    // as-of the FIRST snapshot: bit-identical to a direct build over only
    // the first commit's shard rows (history is immutable - the second
    // commit must not leak into a historical read)
    val firstShards = SketchCheckpoint.committedShards(dir).toSeq.sorted.take(6)
    val expected = corpus
      .withColumn("shard", pmod(xxhash64(col("token")), lit(12)).cast("int"))
      .filter(col("shard").isin(firstShards: _*))
      .agg(cm_sketch(col("token"), col("weight"), eps = 1e-3).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val asOf = SketchCheckpoint.mergeShards(spark, dir, asOfSnapshot = snaps.head)
    assert(java.util.Arrays.equals(asOf, expected))
    // latest == default == full table
    assert(java.util.Arrays.equals(
      SketchCheckpoint.mergeShards(spark, dir),
      SketchCheckpoint.mergeShards(spark, dir, asOfSnapshot = snaps.last)))
    // an as-of BEFORE the first commit refuses loudly instead of returning
    // an empty merge
    intercept[IllegalArgumentException] {
      SketchCheckpoint.mergeShards(spark, dir, asOfSnapshot = snaps.head - 1)
    }
    intercept[IllegalArgumentException] {
      SketchCheckpoint.lineage(spark, dir, asOfSnapshot = snaps.head - 1)
    }
    // lineage scopes to the same historical view: 6 shards as of the
    // first commit, all 12 at latest
    assert(SketchCheckpoint.lineage(spark, dir, asOfSnapshot = snaps.head)
      .count() === 6L)
    assert(SketchCheckpoint.lineage(spark, dir).count() === 12L)
    corpus.unpersist()
  }

  test("orphan snapshot data (crash between write and commit) never double-counts") {
    val dir = Files.createTempDirectory("ckpt3").toString
    val corpus = CorpusGenerator.keyed(spark, 20000, 8).cache()
    val direct = corpus.agg(cm_sketch(col("token"), col("weight"), eps = 1e-3).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    // snapshot 1: 3 of 8 shards committed
    SketchCheckpoint.buildShards(corpus, "token", "weight", 8, dir,
      eps = 1e-3, failAfterShards = 3)
    // simulate a crash AFTER the next snapshot's data write but BEFORE its
    // commit: orphan duplicate rows under the id the retry will reuse
    spark.read.parquet(s"$dir/shards/snap-1")
      .write.mode("overwrite").parquet(s"$dir/shards/snap-2")
    assert(SketchCheckpoint.committedShards(dir).size === 3)
    // resume must overwrite the orphan, not absorb it
    val done = SketchCheckpoint.buildShards(corpus, "token", "weight", 8, dir, eps = 1e-3)
    assert(done.size === 8)
    val resumed = SketchCheckpoint.mergeShards(spark, dir)
    assert(java.util.Arrays.equals(resumed, direct),
      "orphan shard rows were double-counted into the merge")
    corpus.unpersist()
  }

  test("re-running a completed checkpoint is a no-op") {
    val dir = Files.createTempDirectory("ckpt2").toString
    val corpus = CorpusGenerator.keyed(spark, 5000, 4)
    SketchCheckpoint.buildShards(corpus, "token", "weight", 4, dir)
    val before = SketchCheckpoint.mergeShards(spark, dir)
    SketchCheckpoint.buildShards(corpus, "token", "weight", 4, dir) // no-op
    val after = SketchCheckpoint.mergeShards(spark, dir)
    assert(java.util.Arrays.equals(before, after))
  }
}
