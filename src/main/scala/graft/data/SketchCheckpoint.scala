package graft.data

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.agg.SketchFunctions._

/**
 * Resumable sketch build with per-shard checkpoints (north-rule requirement;
 * SURVEY.md §7.6).
 *
 * Level 1: rows are hash-sharded on the key (`pmod(xxhash64(key), n)`) and
 * one CM sketch is aggregated per shard; each completed batch of shards is
 * written as a Parquet snapshot directory carrying per-shard lineage
 * (rows_seen, total_weight, wall_ms) and committed by an ATOMIC manifest
 * rename — the Iceberg-commit semantics emulated on plain files (no Iceberg
 * runtime ships in /opt/spark/jars; substitution stated in README).
 *
 * Resume: a restarted build reads the manifest union, recomputes only the
 * missing shards (a filter on the shard hash — partition pruning of the
 * recompute), and commits a new snapshot. Level 2 `cm_merge`s all shard
 * sketches; because CM merge is associative + commutative (property-tested),
 * the resumed result is bit-identical to an uninterrupted build.
 */
object SketchCheckpoint {

  final case class Manifest(shards: Set[Int])

  private def manifestPath(dir: String) = Paths.get(dir, "manifest")

  /** Committed shard ids: union of all manifest snapshot files. */
  def committedShards(ckptDir: String): Set[Int] = {
    val mdir = manifestPath(ckptDir)
    if (!Files.exists(mdir)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(mdir).iterator().asScala
        .filter(_.getFileName.toString.startsWith("commit-"))
        .flatMap(p => Files.readAllLines(p).asScala)
        .map(_.trim.toInt)
        .toSet
    }
  }

  /** Atomically commit `shards` as done (write temp + rename). */
  private def commit(ckptDir: String, snapshotId: Int, shards: Seq[Int]): Unit = {
    val mdir = manifestPath(ckptDir)
    Files.createDirectories(mdir)
    val tmp = mdir.resolve(s".tmp-$snapshotId")
    Files.write(tmp, shards.map(_.toString).mkString("\n").getBytes)
    Files.move(tmp, mdir.resolve(s"commit-$snapshotId"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /**
   * Build (or resume) the sharded level-1 sketches for `df(keyCol, wCol)`.
   * `failAfterShards` simulates a crash: only that many shards are built and
   * committed, then the method returns without finishing (test hook).
   */
  def buildShards(df: DataFrame, keyCol: String, wCol: String, numShards: Int,
      ckptDir: String, eps: Double = 1e-4, delta: Double = 0.01,
      failAfterShards: Int = Int.MaxValue): Set[Int] = {
    val done = committedShards(ckptDir)
    val missing = (0 until numShards).filterNot(done.contains)
    if (missing.isEmpty) return done
    val todo = missing.take(failAfterShards)
    val t0 = System.currentTimeMillis()
    val sharded = df
      .withColumn("shard", pmod(xxhash64(col(keyCol)), lit(numShards)).cast("int"))
      .filter(col("shard").isin(todo: _*))
      .groupBy(col("shard"))
      .agg(
        cm_sketch(col(keyCol), col(wCol), eps, delta).as("sketch"),
        count(lit(1)).as("rows_seen"),
        sum(col(wCol)).as("total_weight"))
      .withColumn("wall_ms", lit(System.currentTimeMillis() - t0))
      .withColumn("input_lineage", lit(df.inputFiles.sorted.mkString(",")))
    sharded.write.mode("append").parquet(s"$ckptDir/shards")
    commit(ckptDir, snapshotId = done.size + todo.size, todo)
    done ++ todo
  }

  /** Level 2: fold every committed shard sketch into one (order-free). */
  def mergeShards(spark: SparkSession, ckptDir: String): Array[Byte] = {
    val shards = spark.read.parquet(s"$ckptDir/shards")
    shards.agg(cm_merge(col("sketch")).as("merged"))
      .head().getAs[Array[Byte]]("merged")
  }

  /** Lineage/metrics view over the checkpoint (north-rule visibility). */
  def lineage(spark: SparkSession, ckptDir: String): DataFrame =
    spark.read.parquet(s"$ckptDir/shards")
      .select(col("shard"), col("rows_seen"), col("total_weight"), col("wall_ms"))
      .orderBy("shard")
}
