package graft.img

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** JVM image codec helpers (JDK-only: javax.imageio, headless-safe).
  * Used by the synthetic generator, the per-row image invariant tests
  * (decoded-pixel PSNR >= 40 dB for lossy, input_hint), and pHash64.
  */
object Codec {
  // BufferedImage raster ops are headless-safe, but be explicit:
  System.setProperty("java.awt.headless", "true")

  /** Deterministic procedural RGB raster, fully determined by (seed, w, h):
    * a per-image random 8×8 bright/dark zone pattern (structure at exactly
    * the average-hash scale, so pHash64 recovers ~the 64 pattern bits →
    * high-entropy fingerprints and globally-spread derived points), plus a
    * mild gradient and low-amplitude noise (±4 — keeps JPEG re-encode above
    * the 40 dB PSNR invariant). */
  def raster(seed: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val zoneBits = mix(seed ^ 0x5EED5EEDL)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val zone = math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)
        val base = if (((zoneBits >>> zone) & 1L) == 1L) 170 else 80
        val n = mix(seed ^ (x.toLong << 32) ^ y.toLong)
        val r = (base + (x * 40) / math.max(1, w - 1) + ((n & 0x7) - 4).toInt).max(0).min(255)
        val g = (base + (y * 40) / math.max(1, h - 1) + (((n >>> 8) & 0x7) - 4).toInt).max(0).min(255)
        val b = (base + ((x + y) * 20) / math.max(1, w + h - 2) + (((n >>> 16) & 0x7) - 4).toInt).max(0).min(255)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** splitmix64 — stable scalar hash used across the generator. */
  def mix(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  def encodeJpeg(img: BufferedImage, quality: Float = 0.98f): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val out = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage =
    ImageIO.read(new ByteArrayInputStream(bytes))

  /** Peak signal-to-noise ratio over RGB channels; Double.PositiveInfinity
    * for identical rasters. The input_hint invariant: >= 40 dB for lossy. */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    var se = 0.0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        val dr = ((pa >>> 16) & 0xFF) - ((pb >>> 16) & 0xFF)
        val dg = ((pa >>> 8) & 0xFF) - ((pb >>> 8) & 0xFF)
        val db = (pa & 0xFF) - (pb & 0xFF)
        se += dr * dr + dg * dg + db * db
        x += 1
      }
      y += 1
    }
    val mse = se / (3.0 * a.getWidth * a.getHeight)
    if (mse == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / mse)
  }

  /** 64-bit average hash: grayscale 8×8 box-downsample, threshold at mean.
    * Bit (row*8+col) set iff the cell is brighter than the mean — robust to
    * lossy re-encoding, so JPEG rows keep the same phash as their source
    * raster (asserted in tests). */
  def pHash64(img: BufferedImage): Long = {
    val cells = new Array[Double](64)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val lum = 0.299 * ((p >>> 16) & 0xFF) + 0.587 * ((p >>> 8) & 0xFF) + 0.114 * (p & 0xFF)
        cells(math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)) += lum
        x += 1
      }
      y += 1
    }
    // normalize by actual pixels per cell
    val counts = new Array[Int](64)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        counts(math.min(7, y * 8 / h) * 8 + math.min(7, x * 8 / w)) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    var mean = 0.0
    while (i < 64) { cells(i) /= math.max(1, counts(i)); mean += cells(i); i += 1 }
    mean /= 64
    var bits = 0L
    i = 0
    while (i < 64) { if (cells(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }
}
