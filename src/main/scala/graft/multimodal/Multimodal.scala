package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sketch.XxHash64

/** Typed multimodal record: opaque payload bytes + typed metadata. */
final case class MediaRecord(
    media_id: Long,
    modality: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    width: Int, // image/video pixels; audio: sample rate
    height: Int, // image/video pixels; audio: channels
    duration_ms: Long // 0 for still images
)

final case class MediaFeatures(
    media_id: Long,
    modality: String,
    n_frames: Int,
    feature: Array[Float])

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, batched per-partition decode → feature extraction.
 *
 * The actual codec step is STUBBED (this container has no image/audio
 * libraries): [[decodeStub]] derives a deterministic feature vector from the
 * payload bytes via xxhash — a stand-in with the exact shape a real decoder
 * would have. Everything Spark-side is real and tested: schema, typed
 * Dataset API, per-partition batching (`mapPartitions`, the Scala analogue
 * of `mapInPandas` batch processing), frame sampling, and partition-count
 * preservation.
 */
object Multimodal {

  final val FeatureDim = 16

  /**
   * STUB DECODER — deterministic fake. A production build replaces this with
   * the real codec call (e.g. JNI to libjpeg/ffmpeg); the signature
   * `(payload, frameIndex) → feature vector` is the real contract.
   */
  def decodeStub(payload: Array[Byte], frameIndex: Int): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < FeatureDim) {
      val h = XxHash64.hashBytes(payload, frameIndex.toLong * 131 + i)
      out(i) = (h.toDouble / Long.MaxValue.toDouble).toFloat
      i += 1
    }
    out
  }

  /** Uniform frame sampling: `n` frame indices over the clip duration
    * (1 frame for stills/audio windows). */
  def sampleFrames(durationMs: Long, maxFrames: Int): Array[Int] =
    if (durationMs <= 0) Array(0)
    else Array.tabulate(math.min(maxFrames, math.max(1, (durationMs / 1000).toInt)))(identity)

  /** Bilinear RESIZE of a row-major float grid — unlike the codec, resize
    * is pure geometry on the decoded grid and therefore fully REAL here
    * (not stubbed): output pixel (i, j) samples the input at the standard
    * align-corners fractional coordinates with bilinear weights. Used
    * between decode and feature extraction in a production pipeline; the
    * grid can be an image plane, a spectrogram, or a video frame. */
  def resizeBilinear(grid: Array[Float], w: Int, h: Int,
      ow: Int, oh: Int): Array[Float] = {
    require(w >= 1 && h >= 1 && ow >= 1 && oh >= 1 && grid.length == w * h,
      s"bad grid: ${grid.length} vs ${w}x$h -> ${ow}x$oh")
    val out = new Array[Float](ow * oh)
    val sx = if (ow == 1) 0.0 else (w - 1).toDouble / (ow - 1)
    val sy = if (oh == 1) 0.0 else (h - 1).toDouble / (oh - 1)
    var j = 0
    while (j < oh) {
      val fy = j * sy
      val y0 = math.floor(fy).toInt
      val y1 = math.min(h - 1, y0 + 1)
      val wy = fy - y0
      var i = 0
      while (i < ow) {
        val fx = i * sx
        val x0 = math.floor(fx).toInt
        val x1 = math.min(w - 1, x0 + 1)
        val wx = fx - x0
        val top = grid(y0 * w + x0) * (1 - wx) + grid(y0 * w + x1) * wx
        val bot = grid(y1 * w + x0) * (1 - wx) + grid(y1 * w + x1) * wx
        out(j * ow + i) = (top * (1 - wy) + bot * wy).toFloat
        i += 1
      }
      j += 1
    }
    out
  }

  /** Batched decode + mean-pool over sampled frames. Runs per partition —
    * no shuffle, codec state amortized across a partition's rows (the
    * mapInPandas batch-shape contract). */
  def extractFeatures(media: Dataset[MediaRecord], maxFrames: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { rec =>
        val frames = sampleFrames(rec.duration_ms, maxFrames)
        val acc = new Array[Float](FeatureDim)
        frames.foreach { f =>
          val feat = decodeStub(rec.payload, f)
          var i = 0
          while (i < FeatureDim) { acc(i) += feat(i); i += 1 }
        }
        var i = 0
        while (i < FeatureDim) { acc(i) /= frames.length; i += 1 }
        MediaFeatures(rec.media_id, rec.modality, frames.length, acc)
      }
    }
  }

  /** Deterministic synthetic media table derived from `documents` (payload =
    * UTF-8 text bytes; modality round-robins by id) — real binary-column
    * plumbing without external media files. */
  def synthesize(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(4)) * 160 + 320).cast("int").as("width"),
        (pmod(col("doc_id"), lit(4)) * 90 + 180).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 2, pmod(col("doc_id"), lit(10)) * 1000 + 1000)
          .otherwise(0L).as("duration_ms"))
      .as[MediaRecord]
  }

  /** q27: feature-extraction census per modality. The decode itself is a
    * stub, but the PLUMBING this query exercises — typed schema, binary
    * payloads, per-partition batching, frame sampling — is deterministic
    * arithmetic, so those columns ARE oracle-checked against DuckDB
    * (SparkEntry); the stub-derived feature values are pinned separately by
    * [[featureCensusWithChecksum]] in QueriesSmokeSpec. */
  def featureCensus(spark: SparkSession, sfDir: String): DataFrame =
    featureCensusWithChecksum(spark, sfDir).drop("feature_checksum_milli")

  /** The census plus the xxhash-stub feature checksum (not SQL-mirrorable;
    * determinism asserted in ScalaTest). */
  def featureCensusWithChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(synthesize(spark, sfDir))
    feats.toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        floor(sum(aggregate(col("feature"), lit(0.0),
          (acc, x) => acc + x.cast("double"))) * 1000.0).cast("long")
          .as("feature_checksum_milli"))
      .orderBy(col("modality"))
  }
}
