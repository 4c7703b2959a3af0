package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftQuery, QueryModule}
import graft.sources.Tables

/** Text analysis for LLM training-data pipelines (SURVEY.md §2.12; driver
  * north star BASELINE.json:6) over `documents`: tokenization/word-count
  * (the reference's flagship dataflow, flink/README.md:69-77, batch form),
  * language stats/ID, quality scoring, token counting, fingerprinting.
  *
  * Scale posture: everything is per-row higher-order-function work (map
  * side, whole-stage codegen'd, no UDFs) followed by a single keyed
  * aggregate — at 100 TB this is scan-bound with no extra shuffles beyond
  * the final group-by.
  */
object TextOps extends QueryModule {

  private def toks = split(col("text"), " ")

  /** Occurrences of any marker word as a whitespace-delimited token,
    * counted with one codegen'd regex pass over the raw text. Exactly
    * equivalent to `size(filter(split(text,' '), t -> t IN (words)))` —
    * the lookarounds anchor each match to a full space-delimited token
    * without consuming the delimiters — but `filter` is an interpreted
    * higher-order function AND re-inlines the split per score column,
    * while this stays inside whole-stage codegen and never materializes
    * the token array. The hot per-row kernel of q63/q64 at corpus scale. */
  private def markerCount(words: Seq[String]): Column = {
    val alts = words.map(java.util.regex.Pattern.quote).mkString("|")
    // \z (true end-of-input), not $: without MULTILINE, $ also matches
    // before a final line terminator, which would count a marker followed
    // by a trailing '\n' that the split-token form would not
    regexp_count(col("text"), lit("(?<=^| )(" + alts + ")(?= |\\z)"))
  }

  /** Word count — the canonical pipeline (flink/README.md:69-77):
    * flatMap(split) → keyBy(word) → sum. Top 50 by count. */
  def wordCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(explode(toks).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(50)
  }

  private val wordCountSql =
    """SELECT word, COUNT(*) AS cnt
      |FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents) t
      |GROUP BY word
      |ORDER BY cnt DESC NULLS LAST, word NULLS FIRST
      |LIMIT 50""".stripMargin

  /** Per-language corpus stats (language filtering is the first gate of a
    * training-data pipeline). */
  def langStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast(DoubleType) / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  private val langStatsSql =
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
      |  COUNT(DISTINCT source) AS n_sources
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  /** Token counting, whitespace + BPE-ish regex (word pieces of ≤4 chars):
    * the cost model of LLM data curation. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
        col("doc_id"),
        size(toks).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]{1,4}', 0)")).as("bpe_ish_tokens"),
        length(col("text")).as("n_chars_measured"))
      .orderBy(col("doc_id"))
  }

  private val tokenCountsSql =
    """SELECT doc_id,
      |  CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS ws_tokens,
      |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{1,4}')) AS INT) AS bpe_ish_tokens,
      |  CAST(LENGTH(text) AS INT) AS n_chars_measured
      |FROM documents
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Quality scoring: length / lexical-diversity / stopword signals
    * composed into one double score. All components are integer-derived
    * ratios, so the score is bit-exact across engines. */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val stop = Array("the", "a", "of", "and", "to")
    d.select(col("doc_id"), col("lang"), toks.as("toks"),
        markerCount(stop.toSeq).as("n_stopwords"), col("n_chars"))
      .select(
        col("doc_id"), col("lang"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        col("n_stopwords"),
        col("n_chars"))
      .select(
        col("doc_id"), col("lang"), col("n_tokens"), col("n_distinct"), col("n_stopwords"),
        (col("n_distinct").cast(DoubleType) / col("n_tokens")).as("diversity"),
        (col("n_stopwords").cast(DoubleType) / col("n_tokens")).as("stopword_ratio"),
        (col("n_chars").cast(DoubleType) / col("n_tokens")).as("avg_token_len"))
      .withColumn("quality",
        col("diversity") * lit(0.5) +
          when(col("stopword_ratio") > 0.02, lit(0.25)).otherwise(lit(0.0)) +
          when(col("n_tokens") >= 30, lit(0.25)).otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  private val qualityScoresSql =
    """SELECT doc_id, lang, n_tokens, n_distinct, n_stopwords,
      |  diversity, stopword_ratio, avg_token_len,
      |  diversity * 0.5
      |    + CASE WHEN stopword_ratio > 0.02 THEN 0.25 ELSE 0.0 END
      |    + CASE WHEN n_tokens >= 30 THEN 0.25 ELSE 0.0 END AS quality
      |FROM (
      |  SELECT doc_id, lang, n_tokens, n_distinct, n_stopwords,
      |    CAST(n_distinct AS DOUBLE) / n_tokens AS diversity,
      |    CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
      |    CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len
      |  FROM (
      |    SELECT doc_id, lang, n_chars,
      |      CAST(LEN(toks) AS INT) AS n_tokens,
      |      CAST(LEN(LIST_DISTINCT(toks)) AS INT) AS n_distinct,
      |      CAST(LEN(LIST_FILTER(toks, t -> t IN ('the','a','of','and','to'))) AS INT) AS n_stopwords
      |    FROM (SELECT doc_id, lang, n_chars, STRING_SPLIT(text, ' ') AS toks
      |          FROM documents) a) b) c
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Heuristic language ID (n-gram/marker-token overlap): score each doc
    * against per-language marker sets, argmax with deterministic
    * tie-break. Marker lists are illustrative (the fixture text is a
    * synthetic shared vocabulary); the *operator shape* — k scores + argmax
    * per row, no shuffle — is the production one. */
  def langIdHeuristic(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val markers = Seq(
      "en" -> Seq("the", "a", "fast", "small"),
      "de" -> Seq("merge", "window", "batch"),
      "es" -> Seq("data", "vector", "part"))
    val scored = markers.foldLeft(
      d.select(col("doc_id"), col("lang").as("labeled_lang"), col("text"))) {
      case (df, (lang, ws)) =>
        df.withColumn(s"score_$lang", markerCount(ws))
    }
    scored
      .withColumn("guess",
        when(col("score_en") >= col("score_de") && col("score_en") >= col("score_es"), "en")
          .when(col("score_de") >= col("score_es"), "de")
          .otherwise("es"))
      .select(col("doc_id"), col("labeled_lang"), col("score_en"), col("score_de"),
              col("score_es"), col("guess"))
      .orderBy(col("doc_id"))
  }

  private val langIdHeuristicSql =
    """SELECT doc_id, labeled_lang, score_en, score_de, score_es,
      |  CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
      |       WHEN score_de >= score_es THEN 'de'
      |       ELSE 'es' END AS guess
      |FROM (
      |  SELECT doc_id, lang AS labeled_lang,
      |    CAST(LEN(LIST_FILTER(toks, t -> t IN ('the','a','fast','small'))) AS INT) AS score_en,
      |    CAST(LEN(LIST_FILTER(toks, t -> t IN ('merge','window','batch'))) AS INT) AS score_de,
      |    CAST(LEN(LIST_FILTER(toks, t -> t IN ('data','vector','part'))) AS INT) AS score_es
      |  FROM (SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents) a) b
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Content fingerprinting: full-text SHA-256 plus a coarse structural
    * fingerprint (first/last token + length bucket) for blocking. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    d.select(
        col("doc_id"),
        sha2(col("text"), 256).as("content_sha256"),
        concat_ws("|",
          element_at(toks, 1),
          element_at(toks, -1),
          floor(length(col("text")) / 100).cast(IntegerType).cast(StringType))
          .as("structural_fp"))
      .orderBy(col("doc_id"))
  }

  private val fingerprintsSql =
    """SELECT doc_id,
      |  SHA256(text) AS content_sha256,
      |  CONCAT_WS('|', toks[1], toks[-1],
      |            CAST(CAST(FLOOR(LENGTH(text) / 100.0) AS INT) AS VARCHAR)) AS structural_fp
      |FROM (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS toks FROM documents) t
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Composed training-data cleaning pipeline (the end-to-end flow a
    * 100 TB corpus job runs): language gate → quality gate (diversity +
    * length) → exact dedup keep-first → per-doc token accounting. Each
    * stage is a narrow transform over the previous; the only shuffles are
    * the dedup group and the final order. */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val scored = d
      .filter(col("lang").isin("en", "de", "es"))
      .withColumn("toks", toks)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("diversity",
        size(array_distinct(col("toks"))).cast(DoubleType) / col("n_tokens"))
      .filter(col("n_tokens") >= 20 && col("diversity") >= 0.3)
    // min_by hash-aggregate for the dedup stage (same rationale as
    // Dedup.dedupKeepFirst: map-side collapse, no sort keyed by full text)
    scored
      .groupBy(col("text"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("n_tokens"),
        col("diversity")), col("doc_id")).as("keep"))
      .select(col("keep.doc_id").as("doc_id"), col("keep.lang").as("lang"),
        col("keep.n_tokens").as("n_tokens"),
        round(col("keep.diversity"), 6).as("diversity"))
      .orderBy(col("doc_id"))
  }

  private val cleanCorpusSql =
    """SELECT doc_id, lang, n_tokens, ROUND(diversity, 6) AS diversity FROM (
      |  SELECT doc_id, lang, text, n_tokens, diversity,
      |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id NULLS FIRST) AS rn
      |  FROM (
      |    SELECT doc_id, lang, text,
      |      CAST(LEN(toks) AS INT) AS n_tokens,
      |      CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS diversity
      |    FROM (SELECT doc_id, lang, text, STRING_SPLIT(text, ' ') AS toks
      |          FROM documents WHERE lang IN ('en', 'de', 'es')) a) b
      |  WHERE n_tokens >= 20 AND diversity >= 0.3) c
      |WHERE rn = 1
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Deterministic train/val/test assignment (the reproducible-split
    * contract every training-data pipeline needs): bucket = doc_id mod 10,
    * 8/1/1 split, summarized per (source, split). The assignment is a pure
    * narrow map — no shuffle until the summary aggregate — and the
    * modulus (not an engine hash) makes it reproducible across engines
    * and runs, which is what makes held-out sets auditable. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val bucket = pmod(col("doc_id"), lit(10L))
    d.withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
           sum(size(toks).cast(LongType)).as("total_tokens"))
      .orderBy(col("source"), col("split"))
  }

  // ((x % 10) + 10) % 10 mirrors Spark's pmod: DuckDB's % keeps the
  // dividend's sign, which would route negative doc_ids differently
  private val trainSplitSql =
    """SELECT source,
      |  CASE WHEN ((doc_id % 10) + 10) % 10 < 8 THEN 'train'
      |       WHEN ((doc_id % 10) + 10) % 10 = 8 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS total_tokens
      |FROM documents
      |GROUP BY 1, 2
      |ORDER BY source NULLS FIRST, split NULLS FIRST""".stripMargin

  /** Token budget per packed chunk, interpolated into the oracle SQL and
    * the spec guards so plan/oracle/test cannot drift; shard count for
    * the bounded-window variant (q69). */
  val PackBudget = 2048L
  val PackShards = 16

  /** Greedy sequence packing (sample packing for LLM training): docs are
    * laid end-to-end in doc_id order within each source and cut into
    * fixed token-budget chunks; a doc lands in the chunk where its prefix
    * sum starts. The window is a per-source ROWS running sum — parallel
    * across sources, sequential within one (q69 is the shard-bounded
    * variant that parallelizes inside a source). Integer `div` end to
    * end, so the oracle compare is exact. */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequencesOf(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), size(toks).cast(LongType).as("n_tokens")),
      budget = PackBudget)

  /** DataFrame-level core (property-tested on generated token tables):
    * expects (doc_id, source, n_tokens). */
  def packSequencesOf(d: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("chunk_id", expr(s"(cum - n_tokens) div $budget"))
      .groupBy(col("source"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("chunk_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("chunk_id"))
  }

  private val packSequencesSql =
    s"""WITH d AS (SELECT doc_id, source,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, source, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id NULLS FIRST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT source, CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS chunk_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c
      |GROUP BY 1, 2
      |ORDER BY source NULLS FIRST, chunk_id NULLS FIRST""".stripMargin

  /** Shard-bounded sequence packing (q69): the 100 TB form of q68. One
    * ROWS window per source serializes a 10 TB source through a single
    * task, so the window partitions by (source, shard = doc_id mod
    * [[PackShards]]) — each shard packs its own doc_id-ordered stream
    * independently (still deterministic: the modulus is engine-portable,
    * not an engine hash) and local chunk ids interleave as
    * `local * shards + shard`, which keeps ids disjoint across shards
    * without any cross-shard coordination. The price is up to
    * [[PackShards]] partially-filled trailing chunks per source instead
    * of one — at training scale (millions of chunks/source) that padding
    * waste is O(shards/chunks) ≈ 0. Same conservation laws as q68
    * (property-tested); integer-exact, so oracle-compared. */
  def packSequencesSharded(spark: SparkSession, dir: String): DataFrame =
    packSequencesShardedOf(
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), size(toks).cast(LongType).as("n_tokens")),
      budget = PackBudget, shards = PackShards)

  /** DataFrame-level core (property-tested): expects (doc_id, source,
    * n_tokens). Equivalent to running [[packSequencesOf]] independently
    * on each doc_id-mod-shard slice and interleaving the chunk ids. */
  def packSequencesShardedOf(d: DataFrame, budget: Long, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("chunk_id", expr(s"((cum - n_tokens) div $budget) * $shards + shard"))
      .groupBy(col("source"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_tokens")).as("chunk_tokens"),
           min(col("doc_id")).as("first_doc"),
           max(col("doc_id")).as("last_doc"))
      .orderBy(col("source"), col("chunk_id"))
  }

  // ((x % S) + S) % S mirrors Spark's pmod (same trap as q67)
  private val packSequencesShardedSql =
    s"""WITH d AS (SELECT doc_id, source,
      |    ((doc_id % $PackShards) + $PackShards) % $PackShards AS shard,
      |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (SELECT doc_id, source, shard, n_tokens,
      |    SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id NULLS FIRST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM d)
      |SELECT source,
      |  CAST(((cum - n_tokens) // $PackBudget) * $PackShards + shard AS BIGINT) AS chunk_id,
      |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c
      |GROUP BY 1, 2
      |ORDER BY source NULLS FIRST, chunk_id NULLS FIRST""".stripMargin

  override def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q60_word_count", wordCount, Some(wordCountSql)),
    GraftQuery("q61_lang_stats", langStats, Some(langStatsSql)),
    GraftQuery("q62_token_counts", tokenCounts, Some(tokenCountsSql)),
    GraftQuery("q63_quality_scores", qualityScores, Some(qualityScoresSql)),
    GraftQuery("q64_langid_heuristic", langIdHeuristic, Some(langIdHeuristicSql)),
    GraftQuery("q65_fingerprints", fingerprints, Some(fingerprintsSql)),
    GraftQuery("q66_clean_corpus", cleanCorpus, Some(cleanCorpusSql)),
    GraftQuery("q67_train_split", trainSplit, Some(trainSplitSql)),
    GraftQuery("q68_pack_sequences", packSequences, Some(packSequencesSql)),
    GraftQuery("q69_pack_sequences_sharded", packSequencesSharded,
      Some(packSequencesShardedSql)),
  )
}
