package graft.frontier

import graft.SparkTestBase
import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real audio/video decode paths: WAV/PCM16 via javax.sound.sampled,
  * MJPEG frame extraction via JPEG structure + ImageIO. */
class MediaSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("WAV decode: samples round-trip bit-exactly") {
    val samples = MediaSynth.pcmSamples(42L, 7L, 4096)
    val decoded = Multimodal.decodeWavPcm16(MediaSynth.wavBytes(samples))
    assert(decoded.isDefined)
    assert(decoded.get.toSeq == samples.toSeq)
  }

  test("audio windows: RMS of a known sine mix matches the analytic value") {
    // a pure sine of amplitude A has RMS A/sqrt(2); the synth mixes two
    // sines of amplitudes a1, 0.9-a1 (incoherent freqs) so RMS^2 ≈
    // (a1^2 + (0.9-a1)^2)/2 in PCM units (16384 = 1.0)
    val media = Seq(("m0", MediaSynth.wavFor(42L, 0L, nSamples = 8192))).toDF("media_id", "bytes")
    val w = Multimodal.audioWindows(media, "media_id", "bytes", windowSamples = 8192)
      .collect().head
    assert(w.getAs[Boolean]("decoded"))
    val rms = w.getAs[Double]("rms_energy") / 16384.0
    // recompute a1 exactly as the synth does
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a1 = 0.5 + java.lang.Math.floorMod(mix(42L + 0L), 40L) / 100.0
    val expected = math.sqrt((a1 * a1 + (0.9 - a1) * (0.9 - a1)) / 2)
    assert(math.abs(rms - expected) < 0.02, s"rms $rms vs analytic $expected")
  }

  test("MJPEG: frame ranges recover every frame; sampled frames decode at true dims") {
    val frames = 7
    val bytes = MediaSynth.mjpegFor(42L, 3L, frames, w = 40, h = 30)
    val ranges = Multimodal.mjpegFrameRanges(bytes)
    assert(ranges.size == frames)
    assert(ranges.head._1 == 0 && ranges.last._2 == bytes.length)
    val media = Seq(("v3", bytes)).toDF("media_id", "bytes")
    val sampled = Multimodal.sampleFrames(media, "media_id", "bytes", everyNth = 2, maxFrames = 8)
      .collect().sortBy(_.frame_idx)
    assert(sampled.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    assert(sampled.forall(f => f.w == 40 && f.h == 30))
    // PSNR of a sampled frame against its reference render (jpeg-lossy)
    val f2 = sampled.find(_.frame_idx == 2).get
    val img = ImageSynth.decode(f2.frame_bytes)
    val ref = ImageSynth.renderReference(42L, 3L * 1000 + 2, 40, 30)
    assert(ImageSynth.psnr(ref, img) >= 40.0)
  }
}
