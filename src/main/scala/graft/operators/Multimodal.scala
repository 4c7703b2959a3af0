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

  // ---------------------------------------------------------------------
  // q164: perceptual-hash-style payload near-dup (block signatures)
  // ---------------------------------------------------------------------

  /** Number of signature blocks per payload — the "grid" a perceptual
    * hash reduces an asset to. 16 blocks × 4-block bands mirrors the
    * MinHash banding geometry. */
  val SigBlocks = 16

  /** Blocks per LSH band (4 bands of 4). */
  val BlocksPerBand = 4

  /** Candidate pairs must agree on at least this many of the 16 blocks
    * (Hamming distance ≤ 4 over the block signature). */
  val NearBlocks = 12

  /** Band buckets holding more docs than this are dropped before the
    * pair join (q158's boilerplate gate): a shared boilerplate prefix
    * must never fan out O(df²) pairs. */
  val MaxBandDocs = 64

  /** Payloads shorter than this many bytes are excluded: with 16 blocks
    * a tiny payload degenerates to near-empty blocks that collide
    * spuriously (the media analog: don't perceptual-hash a 4px thumb). */
  val MinSigBytes = 64

  /** q164: near-duplicate binary payloads by BLOCK SIGNATURE — the
    * engine-side shape of perceptual-hash dedup (pHash/aHash): reduce
    * each asset to a fixed-length signature of [[SigBlocks]] coarse
    * features, band the signature for LSH candidate generation, verify
    * candidates by Hamming agreement ≥ [[NearBlocks]].
    *
    * The *feature* here is a portable polynomial fold over each of 16
    * equal byte-range blocks of the raw payload (viewed through its hex
    * encoding, which both engines produce identically) — a stand-in for
    * the pixel-grid means a real decoder would emit (same stub contract
    * as q92: this container has no codecs, so features come from bytes,
    * but every Spark-side stage — signature extraction, banding, the
    * DF-gated bucket join, Hamming verification — is the real pipeline).
    * Byte-block features are position-sensitive, so matches are
    * same-length assets differing in ≤4/16 regions (re-encoded or
    * patched copies; exact dups score 16/16) — exactly the fixed-grid
    * alignment a decoded perceptual hash would have.
    *
    * Scale shape: one narrow pass computes all 16 block hashes per doc
    * (explode ×16 — bounded, not corpus-squared), bands are a keyed
    * fold, candidates come from an equi-join on (band, band_hash) with
    * the hot-bucket anti-join gate, and verification joins the 16-row
    * block table on both sides of each candidate. No all-pairs stage
    * anywhere; every join is an equi-join.
    *
    * The registered query runs the detector over the documents corpus
    * PLUS a deterministic simulated re-encode of every 20th eligible
    * asset ([[reencodedVariants]]) — the fixture has no same-length
    * binary variants of its own (verified: max block agreement between
    * distinct fixture payloads is 1/16), so without the plant the
    * oracle would only ever hash an empty result; with it, every
    * signature/band/verify stage round-trips through DuckDB on real
    * pairs, and the detector's recall on the planted re-encodes is
    * part of what the oracle certifies. */
  def payloadBlockNeardup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    payloadBlockNeardupOf(d.unionByName(reencodedVariants(d)))
  }

  /** Deterministic "re-encoded asset" simulation: for every 20th
    * ASCII payload of signable size, a copy (doc_id + 10,000,000) with
    * a ⌊C/10⌋-char run at the C/4 mark overwritten by 'x' — the
    * same-length regional corruption a lossy re-encode produces on a
    * fixed grid. ASCII-only (byte length = char length) so the patched
    * copy keeps the ORIGINAL's byte length and the byte-grid blocks
    * stay aligned; both engines derive the identical variant text. */
  private[graft] def reencodedVariants(d: DataFrame): DataFrame = {
    d.filter(length(encode(col("text"), "UTF-8")) >= MinSigBytes &&
        length(encode(col("text"), "UTF-8")) === length(col("text")) &&
        col("doc_id") % 20 === 0)
      .select(col("doc_id"), col("text"), length(col("text")).cast(LongType).as("len"))
      .select((col("doc_id") + 10000000L).as("doc_id"),
        concat(
          expr("substring(text, 1, len div 4)"),
          expr("repeat('x', len div 10)"),
          expr("substring(text, len div 4 + len div 10 + 1, len)")).as("text"))
  }

  /** Core detector over any `(doc_id, text-as-payload)` corpus. */
  def payloadBlockNeardupOf(d: DataFrame): DataFrame = {
    import graft.functions.PolyHash
    val hx = d
      .select(col("doc_id"), hex(encode(col("text"), "UTF-8")).as("hx"))
      .filter(length(col("hx")) >= MinSigBytes * 2)
    val blocks = graft.functions.ScopedCache.persist("multimodal.sigblocks",
      s"${d.queryExecution.analyzed.semanticHash()}",
      hx.select(col("doc_id"), col("hx"), length(col("hx")).cast(LongType).as("hl"),
          explode(sequence(lit(0), lit(SigBlocks - 1))).as("bno"))
        .select(col("doc_id"), col("bno"),
          expr(s"graft_tokhash(substring(hx, (bno * hl) div $SigBlocks + 1, " +
            s"((bno + 1) * hl) div $SigBlocks - (bno * hl) div $SigBlocks))").as("h")))
    val bands = blocks
      .groupBy(col("doc_id"), (col("bno") / BlocksPerBand).cast(IntegerType).as("band"))
      .agg(expr(s"aggregate(array_sort(collect_list(struct(bno, h))), " +
        s"cast(${PolyHash.Seed} as bigint), " +
        s"(acc, x) -> (acc * ${PolyHash.M2} + x.h) % ${PolyHash.P})").as("bh"))
    val hot = bands.groupBy(col("band"), col("bh"))
      .agg(count(lit(1)).as("df")).filter(col("df") > MaxBandDocs)
      .select(col("band"), col("bh"))
    val gated = bands.join(hot, Seq("band", "bh"), "left_anti")
    val cand = gated.as("x").join(gated.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(blocks.select(col("doc_id").as("doc_a"), col("bno"), col("h")),
        Seq("doc_a"))
      .join(blocks.select(col("doc_id").as("doc_b"), col("bno"), col("h")),
        Seq("doc_b", "bno", "h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast(IntegerType).as("n_eq_blocks"))
      .filter(col("n_eq_blocks") >= NearBlocks)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val payloadBlockNeardupSql = {
    import graft.functions.PolyHash
    // per-block polynomial fold over the hex view's code points — the
    // same LIST_REDUCE replay Dedup.polyFoldSql uses for tokens
    val blockFold =
      s"(LIST_REDUCE([CAST(${PolyHash.Seed} AS BIGINT)] || " +
        s"LIST_TRANSFORM(GENERATE_SERIES(1, LEN(blk)), ci -> " +
        s"CAST(UNICODE(SUBSTR(blk, ci, 1)) AS BIGINT)), " +
        s"(acc, c) -> (acc * ${PolyHash.M1} + c) % ${PolyHash.P}) " +
        s"* ${PolyHash.MixA} + ${PolyHash.MixB}) % ${PolyHash.P}"
    s"""WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000,
      |    SUBSTRING(text, 1, LEN(text) // 4)
      |      || REPEAT('x', LEN(text) // 10)
      |      || SUBSTRING(text, LEN(text) // 4 + LEN(text) // 10 + 1, LEN(text))
      |  FROM documents
      |  WHERE OCTET_LENGTH(ENCODE(text)) >= $MinSigBytes
      |    AND OCTET_LENGTH(ENCODE(text)) = LEN(text) AND doc_id % 20 = 0),
      |hxs AS (
      |  SELECT doc_id, UPPER(HEX(ENCODE(text))) AS hx
      |  FROM corpus WHERE LEN(UPPER(HEX(ENCODE(text)))) >= ${MinSigBytes * 2}),
      |bn AS (
      |  SELECT doc_id, hx,
      |    UNNEST(GENERATE_SERIES(0, ${SigBlocks - 1})) AS bno
      |  FROM hxs),
      |blk AS (
      |  SELECT doc_id, bno,
      |    SUBSTRING(hx, (bno * LEN(hx)) // $SigBlocks + 1,
      |      ((bno + 1) * LEN(hx)) // $SigBlocks - (bno * LEN(hx)) // $SigBlocks) AS blk
      |  FROM bn),
      |blocks AS (SELECT doc_id, bno, $blockFold AS h FROM blk),
      |bands AS (
      |  SELECT doc_id, bno // $BlocksPerBand AS band,
      |    LIST_REDUCE([CAST(${PolyHash.Seed} AS BIGINT)] || LIST(h ORDER BY bno),
      |      (acc, c) -> (acc * ${PolyHash.M2} + c) % ${PolyHash.P}) AS bh
      |  FROM blocks GROUP BY 1, 2),
      |hot AS (SELECT band, bh FROM bands GROUP BY 1, 2 HAVING COUNT(*) > $MaxBandDocs),
      |gated AS (SELECT b.* FROM bands b WHERE NOT EXISTS
      |  (SELECT 1 FROM hot h WHERE h.band = b.band AND h.bh = b.bh)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      |  FROM gated x JOIN gated y ON x.band = y.band AND x.bh = y.bh
      |  WHERE x.doc_id < y.doc_id)
      |SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS INT) AS n_eq_blocks
      |FROM cand c
      |JOIN blocks ba ON ba.doc_id = c.doc_a
      |JOIN blocks bb ON bb.doc_id = c.doc_b AND bb.bno = ba.bno AND bb.h = ba.h
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= $NearBlocks
      |ORDER BY doc_a NULLS FIRST, doc_b NULLS FIRST""".stripMargin
  }

  override def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q90_payload_metadata", payloadMetadata, Some(payloadMetadataSql)),
    GraftQuery("q91_frame_sample", frameSample, Some(frameSampleSql)),
    GraftQuery("q92_decode_features", decodeFeatures, None),
    GraftQuery("q164_payload_block_neardup", payloadBlockNeardup,
      Some(payloadBlockNeardupSql)),
  )
}
