package graft.frontier

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Deterministic synthesis of the north-rule input table
  * `images(image_id, bytes, w, h, fmt, caption, phash)`
  * (BASELINE.json input_hint) — no external data. Pixels are a pure
  * function of (seed, image index, x, y): smooth sinusoidal fields, so
  * the reference pixels are recomputable anywhere for the per-row
  * invariant checks (lossless byte-exact; lossy PSNR ≥ 40 dB). */
object ImageSynth {

  java.lang.System.setProperty("java.awt.headless", "true")
  // ImageIO's default stream cache is FILE-backed: every encode/decode
  // spills through a temp file on disk. All our images are small
  // in-memory byte arrays — memory-cached streams produce identical
  // bytes with zero filesystem traffic per frame.
  ImageIO.setUseCache(false)

  final case class ImageRow(
      image_id: String,
      bytes: Array[Byte],
      w: Int,
      h: Int,
      fmt: String,
      caption: String,
      phash: Long
  )

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Reference pixel function: smooth 3-channel sinusoid field with
    * per-image frequencies/phases derived from (seed, idx). */
  def refPixel(seed: Long, idx: Long, x: Int, y: Int, w: Int, h: Int): Int = {
    val p = mix(seed ^ (idx * 0x5851f42d4c957f2dL))
    def par(k: Int, lo: Double, hi: Double): Double = {
      val u = java.lang.Math.floorMod(mix(p + k), 100000L) / 100000.0
      lo + u * (hi - lo)
    }
    val fx = par(1, 0.5, 2.0); val fy = par(2, 0.5, 2.0)
    val ph0 = par(3, 0, 6.28)
    // luma-dominant field with small fixed chroma offsets per image —
    // JPEG chroma subsampling would otherwise sink PSNR on tiny images
    val offR = (par(6, -12, 12)).round.toInt
    val offB = (par(7, -12, 12)).round.toInt
    val u = x.toDouble / w; val v = y.toDouble / h
    val luma = 0.5 + 0.45 * math.sin(2 * math.Pi * (fx * u + fy * v) + ph0)
    val l = (luma * 255).round.toInt
    def clamp(i: Int): Int = math.max(0, math.min(255, i))
    (clamp(l + offR) << 16) | (clamp(l) << 8) | clamp(l + offB)
  }

  def renderReference(seed: Long, idx: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // per-image params hoisted out of the pixel loop (refPixel re-derives
    // them per call — 5 mixes/floorMods per pixel of per-IMAGE constants);
    // identical arithmetic, so every pixel int matches refPixel exactly
    val p = mix(seed ^ (idx * 0x5851f42d4c957f2dL))
    def par(k: Int, lo: Double, hi: Double): Double = {
      val u = java.lang.Math.floorMod(mix(p + k), 100000L) / 100000.0
      lo + u * (hi - lo)
    }
    val fx = par(1, 0.5, 2.0); val fy = par(2, 0.5, 2.0)
    val ph0 = par(3, 0, 6.28)
    val offR = (par(6, -12, 12)).round.toInt
    val offB = (par(7, -12, 12)).round.toInt
    def clamp(i: Int): Int = math.max(0, math.min(255, i))
    // bulk setRGB: identical pixel ints, one color-model pass
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val row = y * w
      val v = y.toDouble / h
      var x = 0
      while (x < w) {
        val u = x.toDouble / w
        val luma = 0.5 + 0.45 * math.sin(2 * math.Pi * (fx * u + fy * v) + ph0)
        val l = (luma * 255).round.toInt
        px(row + x) = (clamp(l + offR) << 16) | (clamp(l) << 8) | clamp(l + offB)
        x += 1
      }
      y += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    img
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** JPEG with explicit quality (1.0) — with the luma-dominant fields
    * this keeps PSNR comfortably ≥ 45 dB even at 16×16. */
  def encodeJpeg(img: BufferedImage, quality: Float = 1.0f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    writer.dispose(); ios.close()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** 64-bit average-hash over an 8×8 luma downsample (perceptual key). */
  def phash64(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    phash64FromPixels(img.getRGB(0, 0, w, h, null, 0, w), w, h)
  }

  /** phash64 over a row-major bulk-getRGB pixel array — same ints,
    * same accumulation order as the per-pixel loop (bit-identical),
    * without the per-call color-model conversion overhead. */
  def phash64FromPixels(px: Array[Int], w: Int, h: Int): Long = {
    val cells = new Array[Double](64)
    val counts = new Array[Int](64)
    var y = 0
    while (y < h) {
      val rowCell = math.min(7, y * 8 / h) * 8
      val row = y * w
      var x = 0
      while (x < w) {
        val p = px(row + x)
        val luma = 0.299 * ((p >> 16) & 255) + 0.587 * ((p >> 8) & 255) + 0.114 * (p & 255)
        val cell = rowCell + math.min(7, x * 8 / w)
        cells(cell) += luma; counts(cell) += 1
        x += 1
      }
      y += 1
    }
    var mean = 0.0
    var i = 0
    while (i < 64) { cells(i) /= math.max(1, counts(i)); mean += cells(i); i += 1 }
    mean /= 64
    var out = 0L
    i = 0
    while (i < 64) { if (cells(i) >= mean) out |= (1L << i); i += 1 }
    out
  }

  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight)
    var mse = 0.0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var s = 0
        while (s <= 16) {
          val d = ((pa >> s) & 255) - ((pb >> s) & 255)
          mse += d * d
          s += 8
        }
        x += 1
      }
      y += 1
    }
    mse /= (3.0 * a.getWidth * a.getHeight)
    if (mse == 0) Double.PositiveInfinity else 10 * math.log10(255.0 * 255.0 / mse)
  }

  def captionFor(seed: Long, idx: Long): String = {
    val moods = Vector("calm", "vivid", "dark", "bright", "soft")
    val m = moods((java.lang.Math.floorMod(mix(seed + idx), moods.size.toLong)).toInt)
    s"img$idx: a $m sinusoid field — ünïcode 測試 ✓ https://www.images-${idx % 20}.example.com/v/$idx?b=2&a=1"
  }

  def makeRow(seed: Long, idx: Long): ImageRow = {
    val w = 16 + (java.lang.Math.floorMod(mix(seed ^ idx), 49L)).toInt // 16..64
    val h = 16 + (java.lang.Math.floorMod(mix(seed ^ (idx + 7)), 49L)).toInt
    val img = renderReference(seed, idx, w, h)
    val fmt = if (idx % 2 == 0) "png" else "jpg"
    val bytes = if (fmt == "png") encodePng(img) else encodeJpeg(img)
    ImageRow(f"img$idx%08d", bytes, w, h, fmt, captionFor(seed, idx), phash64(img))
  }

  /** The distributed images table (Dataset of ImageRow). */
  def imagesTable(spark: SparkSession, n: Long, seed: Long = 42L, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.map(i => makeRow(seed, i)).toDF()
  }

  /** The (caption, phash) PROJECTION of imagesTable, for consumers that
    * seed from captions + phash only (manual column pruning through the
    * opaque generator — Catalyst cannot prune inside a Dataset.map).
    * phash is computed on the rendered image exactly as makeRow does
    * (pre-encode), so both columns are value-identical to imagesTable's;
    * only the unused PNG/JPEG encode of `bytes` is skipped. */
  def imageSeedTable(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(n).map { i =>
      val w = 16 + (java.lang.Math.floorMod(mix(seed ^ i), 49L)).toInt
      val h = 16 + (java.lang.Math.floorMod(mix(seed ^ (i + 7)), 49L)).toInt
      (captionFor(seed, i), phash64(renderReference(seed, i, w, h)))
    }.toDF("caption", "phash")
  }
}
