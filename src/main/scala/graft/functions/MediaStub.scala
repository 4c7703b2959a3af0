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

  /** Real JDK decode: dimensions and band count from the raster, and
    * brightness = mean of all band samples, each normalized by its own
    * band's sample range (2^bits — a 16-bit PNG's samples run to 65535,
    * so a hardcoded /256 would put brightness far outside [0, 1)).
    * Returns None when ImageIO has no reader for (or fails on) the
    * payload. */
  private[graft] def decodeImage(payload: Array[Byte]): Option[MediaInfo] =
    try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        .map { img =>
          val raster = img.getRaster
          val bands = raster.getNumBands
          val bandMax = Array.tabulate(bands)(b =>
            (1L << raster.getSampleModel.getSampleSize(b)).toDouble)
          var sum = 0.0
          var n = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              var b = 0
              while (b < bands) {
                sum += raster.getSample(x, y, b) / bandMax(b); n += 1; b += 1
              }
              x += 1
            }
            y += 1
          }
          MediaInfo(img.getWidth, img.getHeight, bands,
            if (n == 0) 0.0 else sum / n)
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
