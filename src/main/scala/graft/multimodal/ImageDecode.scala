package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL pixel-level image decode/resize on the pure JDK.
  *
  * `javax.imageio` ships PNG/JPEG/BMP/GIF codecs inside the JDK — no
  * external library — so the multimodal decode stage can actually
  * decode pixels, compute features and resample, not just parse
  * headers. Runs headless; every function is total (None on
  * undecodable bytes — corrupt blobs must not kill a 100 TB scan).
  *
  * Used from `mapPartitions` batch decode ([[BinaryDocs]]): ImageIO
  * reader instances are per-call here because BufferedImage decode is
  * the dominant cost; a per-partition reader pool is the next step if
  * profiling ever shows dispatch overhead.
  */
object ImageDecode {

  final case class Pixels(width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double)

  private def read(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Throwable => None }

  /** Dims + channel means of an already-decoded frame (shared with
    * the per-frame video path, [[VideoDecode]]). */
  def stats(img: BufferedImage): Pixels = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (r, g, b) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Pixels(w, h, r.toDouble / n, g.toDouble / n, b.toDouble / n)
  }

  /** Decode to pixels and compute a simple feature vector (dims +
    * channel means) — the "feature-extract" step of the media
    * pipeline, for real. */
  def decode(bytes: Array[Byte]): Option[Pixels] =
    read(bytes).map(stats)

  /** 64-bit DIFFERENCE HASH (dHash) of a decoded frame: bilinear
    * resample to a 9×8 luminance grid, bit (x,y) = brighter than the
    * right neighbour. Identical pixels give identical hashes
    * regardless of container/encoding (PNG vs BMP vs JPEG-lossless),
    * and mild recompression or resizing flips only a few bits —
    * Hamming distance is the perceptual near-dup metric. */
  def dhash(img: BufferedImage): Long = {
    val small = new BufferedImage(9, 8, BufferedImage.TYPE_INT_RGB)
    val gfx = small.createGraphics()
    try {
      gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      gfx.drawImage(img, 0, 0, 9, 8, null)
    } finally gfx.dispose()
    def lum(x: Int, y: Int): Int = {
      val p = small.getRGB(x, y)
      (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x, y) > lum(x + 1, y)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Decode + dHash; None on undecodable bytes. */
  def dhashBytes(bytes: Array[Byte]): Option[Long] = read(bytes).map(dhash)

  /** Decode ONCE and derive both the stats and the resampled
    * thumbnail from the same BufferedImage — the batch decode path
    * calls this instead of `decode` + `resize`, which would each run
    * a full ImageIO pixel decode of the same blob (the stage's
    * dominant cost, paid twice). */
  def decodeWithThumb(bytes: Array[Byte], maxW: Int, maxH: Int): Option[(Pixels, Option[Array[Byte]])] =
    read(bytes).map { img =>
      val p = stats(img)
      val scale = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
      val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt))
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val gfx = out.createGraphics()
      try {
        gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, w, h, null)
      } finally gfx.dispose()
      val buf = new ByteArrayOutputStream()
      val thumb = if (ImageIO.write(out, "png", buf)) Some(buf.toByteArray) else None
      (p, thumb)
    }

  /** Real resample into a bounding box (aspect preserved), re-encoded
    * as PNG bytes. */
  def resize(bytes: Array[Byte], maxW: Int, maxH: Int): Option[Array[Byte]] =
    read(bytes).flatMap { img =>
      val scale = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
      val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
        math.max(1, (img.getHeight * scale).toInt))
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val gfx = out.createGraphics()
      try {
        gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, w, h, null)
      } finally gfx.dispose()
      val buf = new ByteArrayOutputStream()
      if (ImageIO.write(out, "png", buf)) Some(buf.toByteArray) else None
    }
}
