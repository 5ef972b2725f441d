package graft.core

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Deterministic synthetic images + the per-row conformance kit from
  * BASELINE.json input_hint: decode, PSNR (lossy), exact pixels
  * (lossless), 64-bit aHash ("phash" column). JDK-only (javax.imageio),
  * zero external deps.
  */
object Imaging {

  // ImageIO defaults to FILE-cached streams: every encode/decode spills
  // through a temp file, which serializes on the filesystem under many
  // executor threads. Memory-cached streams are mandatory for throughput.
  ImageIO.setUseCache(false)

  /** splitmix64 finalizer (public-domain algorithm) — cheap per-pixel
    * noise without the byte-array allocation a full xxhash64 needs. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pixel pattern seeded by the image id hash: a
    * luminance gradient + luma-only hash noise, with a per-image
    * CONSTANT chroma tint. Keeping chroma flat keeps JPEG's 4:2:0
    * subsampling lossless in chroma, so PSNR is governed by quality
    * alone and clears the 40 dB conformance gate. All integer math. */
  def synthPixels(imageId: String, w: Int, h: Int): BufferedImage = {
    val seed = XxHash64.hash(imageId)
    val tintR = (Math.floorMod(seed, 49L) - 24L).toInt
    val tintG = (Math.floorMod(seed >>> 21, 49L) - 24L).toInt
    val tintB = (Math.floorMod(seed >>> 42, 49L) - 24L).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val noise = (mix64(seed ^ ((y.toLong << 32) | (x.toLong & 0xffffffffL))) & 0x07).toInt
        // luminance in [40, 208]: gradient along x+y, stays clear of
        // clamping so the chroma tint survives intact
        val lum = 40 + ((x + y) * 160) / math.max(1, w + h - 2) + noise
        val r = math.min(255, math.max(0, lum + tintR))
        val g = math.min(255, math.max(0, lum + tintG))
        val b = math.min(255, math.max(0, lum + tintB))
        px(y * w + x) = (r << 16) | (g << 8) | b
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

  /** JPEG at fixed quality 0.97 — high enough that PSNR vs the source
    * pixels clears the 40 dB gate with margin on our low-noise patterns. */
  def encodeJpeg(img: BufferedImage): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(0.97f)
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), params)
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** Animated-GIF encode — the one MULTI-FRAME (video-like) container
    * the JDK codes natively (MP4/H.264 would need external codecs this
    * environment doesn't have). Frames share the GIF sequence; palette
    * quantization applies, so consumers must featurize DECODED frames,
    * never assume encode-exactness. */
  def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "encodeGif: empty frame list")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      writer.writeToSequence(new IIOImage(f, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Decode ALL frames of a (possibly animated) GIF. */
  def decodeGifFrames(bytes: Array[Byte]): Vector[BufferedImage] = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      (0 until n).map(reader.read(_)).toVector
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** PSNR in dB between two same-size RGB images (per-channel MSE). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    val w = a.getWidth
    val pxa = a.getRGB(0, 0, w, a.getHeight, null, 0, w)
    val pxb = b.getRGB(0, 0, w, b.getHeight, null, 0, w)
    var se = 0.0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = pxa(y * w + x); val pb = pxb(y * w + x)
        val dr = ((pa >> 16) & 0xff) - ((pb >> 16) & 0xff)
        val dg = ((pa >> 8) & 0xff) - ((pb >> 8) & 0xff)
        val db = (pa & 0xff) - (pb & 0xff)
        se += dr * dr + dg * dg + db * db
        x += 1
      }
      y += 1
    }
    val mse = se / (3.0 * a.getWidth * a.getHeight)
    if (mse == 0.0) Double.PositiveInfinity else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  def exactPixels(a: BufferedImage, b: BufferedImage): Boolean = {
    if (a.getWidth != b.getWidth || a.getHeight != b.getHeight) return false
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        if ((a.getRGB(x, y) & 0xffffff) != (b.getRGB(x, y) & 0xffffff)) return false
        x += 1
      }
      y += 1
    }
    true
  }

  /** 64-bit aHash: 8x8 average-pool grayscale, bit i set iff cell mean
    * above global mean. Deterministic integer math. */
  def aHash(img: BufferedImage): Long = {
    val cells = new Array[Long](64)
    val counts = new Array[Long](64)
    val w = img.getWidth; val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var y = 0
    while (y < h) {
      val cy = math.min(7, y * 8 / h)
      var x = 0
      while (x < w) {
        val cx = math.min(7, x * 8 / w)
        val p = px(y * w + x)
        val gray = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
        cells(cy * 8 + cx) += gray
        counts(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var total = 0L; var totalN = 0L
    while (i < 64) { total += cells(i); totalN += counts(i); i += 1 }
    val mean = if (totalN == 0) 0L else total / totalN
    var hash = 0L
    i = 0
    while (i < 64) {
      val cellMean = if (counts(i) == 0) 0L else cells(i) / counts(i)
      if (cellMean > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
