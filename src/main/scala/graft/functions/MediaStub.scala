package graft.functions

import org.apache.spark.sql.functions.udf

/** STUB media decoder (SURVEY.md §2.12 multimodal).
  *
  * This container has no image/audio/video codecs, so `decode` is a
  * deterministic fake: it derives plausible "media properties" purely from
  * the payload bytes. The Spark-side plumbing around it — binary column
  * in, typed struct out, batch execution inside codegen'd stages — is the
  * real production shape; swapping in a real codec is a one-function
  * change (e.g. javax.imageio / ffmpeg bindings on a real cluster).
  */
object MediaStub {

  final case class MediaInfo(
      width: Int, height: Int, channels: Int, brightness: Double)

  /** Deterministic fake decode: dimensions from leading bytes, brightness
    * = mean unsigned byte value scaled to [0, 1). */
  def decode(payload: Array[Byte]): MediaInfo = {
    if (payload == null || payload.isEmpty) MediaInfo(0, 0, 0, 0.0)
    else {
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
  }

  /** Column-level entry point (scalar UDF: acceptable here because the
    * decode body is opaque native work by nature — exactly the case where
    * a UDF, not an expression, is the right tool). */
  val decodeUdf = udf((payload: Array[Byte]) => decode(payload))
}
