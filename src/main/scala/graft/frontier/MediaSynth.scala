package graft.frontier

import java.io.ByteArrayOutputStream

/** Deterministic synthesis of audio/video binaries for the multimodal
  * operators — like ImageSynth, pixels/samples are pure functions of
  * (seed, id), so reference values are recomputable anywhere.
  *
  * Audio: mono 16-bit PCM WAV (RIFF), a two-sine mix per id.
  * Video: raw MJPEG stream — concatenated baseline JPEGs rendered by
  * ImageSynth (the de-facto motion-JPEG wire format; frame boundaries
  * are recoverable from JPEG structure alone because entropy-coded
  * data byte-stuffs FF as FF00/FFD0-D7, so a bare FFD9 is always EOI).
  */
object MediaSynth {

  val SampleRate = 8000

  /** Two-sine mono PCM16 signal: freqs/amps derived from (seed, id). */
  def pcmSamples(seed: Long, id: Long, nSamples: Int): Array[Short] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val f1 = 100 + java.lang.Math.floorMod(mix(seed ^ id), 800L)
    val f2 = 900 + java.lang.Math.floorMod(mix(seed ^ (id + 13)), 2000L)
    val a1 = 0.5 + java.lang.Math.floorMod(mix(seed + id), 40L) / 100.0
    val out = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      val t = i.toDouble / SampleRate
      val v = a1 * math.sin(2 * math.Pi * f1 * t) + (0.9 - a1) * math.sin(2 * math.Pi * f2 * t)
      out(i) = (v * 16384).toShort
      i += 1
    }
    out
  }

  /** Wrap PCM16 mono samples as a RIFF/WAVE binary. */
  def wavBytes(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(SampleRate); bb.putInt(SampleRate * 2)
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  def wavFor(seed: Long, id: Long, nSamples: Int = 8192): Array[Byte] =
    wavBytes(pcmSamples(seed, id, nSamples))

  /** MJPEG stream: `frames` JPEGs of a (w,h) ImageSynth field, frame f
    * rendered from image index id*1000+f. */
  def mjpegFor(seed: Long, id: Long, frames: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    var f = 0
    while (f < frames) {
      bos.write(ImageSynth.encodeJpeg(ImageSynth.renderReference(seed, id * 1000 + f, w, h)))
      f += 1
    }
    bos.toByteArray
  }
}
