package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The real codecs: genuine PNG, WAV, and multi-frame GIF bytes round-trip
  * through the JDK coders, and every modality's feature path runs
  * decode → real resize — no stub exists anywhere since round 5. */
class MultimodalCodecSpec extends AnyFunSuite {

  test("PNG encode -> decode round-trips the grid exactly") {
    val (w, h) = (24, 13)
    val grid = Multimodal.synthImageGrid(7L, w, h)
    val png = Multimodal.encodePng(grid, w, h)
    // a real PNG: magic bytes
    assert(png.take(8).map(_ & 0xff).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val (back, bw, bh) = Multimodal.decodePng(png)
    assert((bw, bh) === ((w, h)))
    // synthImageGrid emits exact k/255 levels, so the 8-bit round-trip is exact
    assert(back.toSeq === grid.toSeq)
  }

  test("WAV encode -> decode round-trips samples to 16-bit precision") {
    val samples = Multimodal.synthAudioSamples(11L, 600)
    val wav = Multimodal.encodeWav(samples, 8000)
    assert(new String(wav.take(4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val (back, rate) = Multimodal.decodeWav(wav)
    assert(rate === 8000)
    assert(back.length === samples.length)
    samples.zip(back).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1.5f / 32767f, s"$a vs $b")
    }
  }

  test("image feature = real decode + real resize, not the stub") {
    val (w, h) = (16, 9)
    val grid = Multimodal.synthImageGrid(3L, w, h)
    val rec = MediaRecord(3L, "image", Multimodal.encodePng(grid, w, h), w, h, 0L)
    val feat = Multimodal.decodeFeature(rec, 0)
    assert(feat.toSeq === Multimodal.resizeBilinear(grid, w, h, 4, 4).toSeq)
  }

  test("audio feature = real decode + envelope resample, not the stub") {
    val samples = Multimodal.synthAudioSamples(4L, 512)
    val rec = MediaRecord(4L, "audio", Multimodal.encodeWav(samples, 8000), 8000, 1, 0L)
    val feat = Multimodal.decodeFeature(rec, 0)
    assert(feat.length === Multimodal.FeatureDim)
    // envelope of a decoded tone: non-negative, bounded by the 16-bit peak
    assert(feat.forall(f => f >= 0f && f <= 1f))
    // matches the reference computation from the decoded samples
    val (dec, _) = Multimodal.decodeWav(rec.payload)
    val env = dec.map(math.abs)
    assert(feat.toSeq ===
      Multimodal.resizeBilinear(env, env.length, 1, Multimodal.FeatureDim, 1).toSeq)
  }

  test("GIF encode -> per-frame decode round-trips every frame exactly") {
    val (w, h, n) = (24, 12, 4)
    val frames = Multimodal.synthVideoFrames(9L, w, h, n)
    val gif = Multimodal.encodeGif(frames, w, h)
    // a real GIF: magic bytes
    assert(new String(gif.take(6), "US-ASCII") === "GIF89a" ||
      new String(gif.take(6), "US-ASCII") === "GIF87a")
    assert(Multimodal.gifFrameCount(gif) === n)
    frames.zipWithIndex.foreach { case (f, i) =>
      val (back, bw, bh) = Multimodal.decodeGifFrame(gif, i)
      assert((bw, bh) === ((w, h)), s"frame $i dims")
      // synthImageGrid emits exact k/255 levels + explicit gray palette →
      // the 8-bit indexed round-trip is exact
      assert(back.toSeq === f.toSeq, s"frame $i")
    }
    // frames genuinely differ (phase-shifted pattern): a reader returning
    // frame 0 for every index would fail the exactness above only if so
    assert(frames(0).toSeq !== frames(1).toSeq)
  }

  test("GIF frame index clamps to the stored frame count") {
    val (w, h) = (16, 8)
    val frames = Multimodal.synthVideoFrames(2L, w, h, 3)
    val gif = Multimodal.encodeGif(frames, w, h)
    val (last, _, _) = Multimodal.decodeGifFrame(gif, 2)
    val (clamped, _, _) = Multimodal.decodeGifFrame(gif, 99)
    assert(clamped.toSeq === last.toSeq)
  }

  test("video feature = real GIF decode + real resize") {
    val (w, h) = (24, 12)
    val frames = Multimodal.synthVideoFrames(5L, w, h, 3)
    val rec = MediaRecord(5L, "video", Multimodal.encodeGif(frames, w, h),
      w, h, 3000L)
    val feat = Multimodal.decodeFeature(rec, 2)
    assert(feat.toSeq ===
      Multimodal.resizeBilinear(frames(2).toArray, w, h, 4, 4).toSeq)
  }

  test("unknown modality fails loudly") {
    val rec = MediaRecord(6L, "hologram", Array[Byte](1), 1, 1, 0L)
    intercept[IllegalArgumentException] { Multimodal.decodeFeature(rec, 0) }
  }
}
