package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, QueryModule}
import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2.12): media assets are opaque
  * `binary` payloads plus typed metadata. The *decode* step
  * ([[graft.functions.MediaStub]]) is REAL for PNG/JPEG/GIF via the
  * JDK's javax.imageio (true dimensions/bands/brightness, asserted on a
  * constructed PNG in SemanticsSpec) and a clearly-marked deterministic
  * fake for formats this container has no codecs for (audio/video). The
  * Spark-side plumbing that matters at 100 TB is real and tested either
  * way: binary columns, per-chunk ("frame") extraction, checksums, typed
  * metadata projection, and batch-friendly shapes (no per-row driver
  * work).
  *
  * The documents' UTF-8 bytes stand in for media payloads; at scale the
  * payload column would be parquet binary written by an ingest job.
  */
object Multimodal extends QueryModule {

  /** Binary payload + typed metadata projection: byte length, SHA-256
    * content address, head-of-file hex (the magic-number sniff). */
  def payloadMetadata(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("lang"), col("source"), col("n_chars"))
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        length(col("payload")).as("byte_len"),
        sha2(col("payload"), 256).as("content_sha256"),
        hex(substring(col("payload"), 1, 8)).as("head_hex"))
      .orderBy(col("doc_id"))
  }

  private val payloadMetadataSql =
    """SELECT doc_id, lang, source, n_chars,
      |  CAST(OCTET_LENGTH(ENCODE(text)) AS INT) AS byte_len,
      |  SHA256(text) AS content_sha256,
      |  LEFT(UPPER(HEX(ENCODE(text))), 16) AS head_hex
      |FROM documents
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Frame sampling: split each payload into fixed 64-byte frames and keep
    * every 2nd frame of the first 6 — the `mapInPandas`-style batch shape
    * (explode positions → per-frame transform) without any codec. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    // empty payloads are excluded on BOTH sides: Spark's sequence(0,-1)
    // yields [0,-1] while GENERATE_SERIES(0,-1) is empty — the filter
    // keeps the two engines agreeing (and max_frame non-negative)
    d.filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        least(floor((length(col("text")) - 1) / 64), lit(5L)).as("max_frame"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("max_frame"))).as("frame_no"))
      .filter(col("frame_no") % 2 === 0)
      .select(
        col("doc_id"), col("frame_no").cast(IntegerType).as("frame_no"),
        sha2(encode(substring_index2(col("text"), col("frame_no")), "UTF-8"), 256)
          .as("frame_sha256"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** substring(text, frame_no*64 + 1, 64) with a column start offset. */
  private def substring_index2(text: org.apache.spark.sql.Column,
                               frameNo: org.apache.spark.sql.Column) =
    text.substr(frameNo * 64 + 1, lit(64))

  private val frameSampleSql =
    """SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
      |  SHA256(SUBSTRING(text, frame_no * 64 + 1, 64)) AS frame_sha256
      |FROM (
      |  SELECT doc_id, text,
      |    UNNEST(GENERATE_SERIES(0, LEAST(CAST(FLOOR((LENGTH(text) - 1) / 64.0) AS BIGINT), 5))) AS frame_no
      |  FROM documents WHERE LENGTH(text) >= 1) t
      |WHERE frame_no % 2 = 0
      |ORDER BY doc_id NULLS FIRST, frame_no NULLS FIRST""".stripMargin

  /** Decode + feature extraction over binary payloads (rows-only: the
    * fixture payloads are text bytes, which take the engine-local
    * deterministic fallback; real PNG/JPEG/GIF payloads decode for real —
    * see [[graft.functions.MediaStub]]). Demonstrates the pipeline
    * shape: binary in → typed struct out → filter/aggregate on extracted
    * features. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val decoded = d
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("media", graft.functions.MediaStub.decodeUdf(col("payload")))
    decoded
      .select(col("doc_id"),
        col("media.width").as("width"),
        col("media.height").as("height"),
        col("media.channels").as("channels"),
        col("media.brightness").as("brightness"))
      .groupBy(col("channels"))
      .agg(
        count(lit(1)).as("n_assets"),
        min(col("width")).as("min_width"),
        max(col("height")).as("max_height"),
        round(avg(col("brightness")), 4).as("avg_brightness"))
      .orderBy(col("channels"))
  }

  override def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q90_payload_metadata", payloadMetadata, Some(payloadMetadataSql)),
    GraftQuery("q91_frame_sample", frameSample, Some(frameSampleSql)),
    GraftQuery("q92_decode_features", decodeFeatures, None),
  )
}
