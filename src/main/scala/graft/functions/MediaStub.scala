package graft.functions

import org.apache.spark.sql.functions.udf

/** Media decoder (SURVEY.md §2.12 multimodal): REAL for the formats the
  * bare JDK can decode, stubbed for the rest.
  *
  * Payloads whose magic number marks them as PNG/JPEG/GIF are decoded
  * with `javax.imageio` (pure JVM, headless-safe): true width/height,
  * raster band count, and mean-sample brightness. Every other payload —
  * this container ships no further codecs (no ffmpeg/libav for
  * audio/video) — falls back to a deterministic fake that derives
  * plausible "media properties" purely from the payload bytes, so the
  * operator stays total and reproducible. The Spark-side plumbing — a
  * binary column in, a typed struct out, batch execution — is the real
  * production shape either way; extending to more formats is a
  * one-function change (e.g. ffmpeg bindings on a real cluster).
  */
object MediaStub {

  final case class MediaInfo(
      width: Int, height: Int, channels: Int, brightness: Double)

  // the payload is already fully in memory — without this, every decode
  // wraps the stream in a FileCacheImageInputStream that creates and
  // deletes a temp file in java.io.tmpdir, per row, on the executor
  javax.imageio.ImageIO.setUseCache(false)

  /** Magic-number sniff: only payloads that claim to be an image are
    * handed to ImageIO (its reader lookup is not free, and ~all corpus
    * payloads are not images). */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F'))

  /** A corpus payload is untrusted: a crafted header can declare e.g.
    * 60000×60000 and force a multi-GB BufferedImage allocation (an
    * OutOfMemoryError no `catch Exception` sees) before a single real
    * pixel is read. Decode is therefore two-phase: read ONLY the header
    * dimensions via the ImageReader, and hand the payload to the full
    * decode only when width×height is under this sample cap. */
  private val MaxDecodedSamples = 64L * 1024 * 1024

  /** Header-only dimension probe — no pixel allocation. None when no
    * reader claims the payload or the header is unreadable. */
  private def headerDims(payload: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally iis.close()
  }

  /** Real JDK decode: dimensions and band count from the raster, and
    * brightness = mean of all band samples, each normalized by its own
    * band's sample range (2^bits — a 16-bit PNG's samples run to 65535,
    * so a hardcoded /256 would put brightness far outside [0, 1)).
    * Returns None when ImageIO has no reader for (or fails on) the
    * payload, or when the HEADER declares more than [[MaxDecodedSamples]]
    * pixels (adversarial-allocation guard — checked before any pixel
    * memory exists). */
  private[graft] def decodeImage(payload: Array[Byte]): Option[MediaInfo] =
    try {
      headerDims(payload)
        .filter { case (w, h) => w > 0 && h > 0 && w.toLong * h <= MaxDecodedSamples }
        .flatMap { _ =>
          Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        }
        .map { img =>
          val raster = img.getRaster
          val bands = raster.getNumBands
          val w = img.getWidth
          val h = img.getHeight
          var sum = 0.0
          var n = 0L
          val row = new Array[Int](w)
          var b = 0
          while (b < bands) {
            // bulk per-scanline read: one virtual call per (row, band)
            // instead of one per SAMPLE (w×h×bands getSample calls is
            // orders of magnitude slower on multi-MP photos)
            val bandMax = (1L << raster.getSampleModel.getSampleSize(b)).toDouble
            var y = 0
            while (y < h) {
              raster.getSamples(0, y, w, 1, b, row)
              var x = 0
              var rowSum = 0L
              while (x < w) { rowSum += row(x); x += 1 }
              sum += rowSum / bandMax
              y += 1
            }
            n += w.toLong * h
            b += 1
          }
          MediaInfo(w, h, bands, if (n == 0) 0.0 else sum / n)
        }
    } catch { case _: Exception => None }

  /** Deterministic fake for non-image payloads: dimensions from leading
    * bytes, brightness = mean unsigned byte value scaled to [0, 1). */
  private def decodeFake(payload: Array[Byte]): MediaInfo = {
    val b0 = payload(0) & 0xFF
    val b1 = if (payload.length > 1) payload(1) & 0xFF else 0
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xFF); i += 1 }
    MediaInfo(
      width = 16 + (b0 % 64) * 16,
      height = 16 + (b1 % 64) * 16,
      channels = 1 + (payload.length % 3),
      brightness = (sum.toDouble / payload.length) / 256.0)
  }

  /** Total decode: real ImageIO for image payloads, deterministic fake
    * otherwise. */
  def decode(payload: Array[Byte]): MediaInfo =
    if (payload == null || payload.isEmpty) MediaInfo(0, 0, 0, 0.0)
    else if (looksLikeImage(payload)) decodeImage(payload).getOrElse(decodeFake(payload))
    else decodeFake(payload)

  /** Column-level entry point (scalar UDF: acceptable here because the
    * decode body is opaque native work by nature — exactly the case where
    * a UDF, not an expression, is the right tool). */
  val decodeUdf = udf((payload: Array[Byte]) => decode(payload))
}
