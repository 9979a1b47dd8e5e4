package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/**
 * REAL image kernels over the JDK's built-in `javax.imageio` codecs
 * (PNG, JPEG, BMP, GIF, WBMP — no external media libraries needed).
 * Upgrades the multimodal pipeline's image branch from a declared stub to
 * an actual decode/resize/feature path; audio/video remain byte-level
 * stand-ins (no JDK codecs for them).
 *
 * All methods return null/empty on undecodable bytes rather than throwing
 * — a web-scale media corpus is full of truncated and mislabeled files,
 * and one bad row must not kill a 100-TB job.
 */
object ImageRT {

  /** Header-only metadata parse: (width, height, format) without decoding
    * pixel data — the cheap first pass a media pipeline filters on. */
  def imageMeta(bytes: Array[Byte]): Array[AnyRef] = {
    if (bytes == null || bytes.length == 0) return null
    val iis = try ImageIO.createImageInputStream(new ByteArrayInputStream(bytes)) catch { case _: Throwable => null }
    if (iis == null) return null
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val r = readers.next()
      try {
        r.setInput(iis)
        Array(Integer.valueOf(r.getWidth(0)), Integer.valueOf(r.getHeight(0)),
          r.getFormatName.toLowerCase)
      } finally r.dispose()
    } catch { case _: Throwable => null }
    finally iis.close()
  }

  /** [[imageMeta]] as a Catalyst InternalRow (codegen entry point). */
  def imageMetaRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val m = imageMeta(bytes)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      m(0).asInstanceOf[Integer].intValue(), m(1).asInstanceOf[Integer].intValue(),
      org.apache.spark.unsafe.types.UTF8String.fromString(m(2).asInstanceOf[String])))
  }

  private def decode(bytes: Array[Byte]): BufferedImage =
    if (bytes == null || bytes.length == 0) null
    else try ImageIO.read(new ByteArrayInputStream(bytes)) catch { case _: Throwable => null }

  /** Full decode + bilinear resize + PNG re-encode — the normalize step of
    * an image training-data pipeline. Null on undecodable input. */
  def imageResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = decode(bytes)
    if (img == null) return null
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val buf = new java.io.ByteArrayOutputStream()
    ImageIO.write(out, "png", buf)
    buf.toByteArray
  }

  /** Luminance histogram over REAL decoded pixels (Rec. 601 luma),
    * `bins` buckets over 0..255 — a genuine image feature, unlike the
    * byte-level stand-in. Null on undecodable input. */
  def lumaHistogram(bytes: Array[Byte], bins: Int): Array[Long] = {
    val img = decode(bytes)
    if (img == null) return null
    val hist = new Array[Long](bins)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        val luma = (299 * r + 587 * g + 114 * b) / 1000
        hist(math.min(bins - 1, luma * bins / 256)) += 1
        x += 1
      }
      y += 1
    }
    hist
  }
}
