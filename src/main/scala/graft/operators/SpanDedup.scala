package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.{GraftQuery, QueryModule}
import graft.functions.{PolyHash, ScopedCache}
import graft.sources.Tables

/** Cross-document duplicated-SPAN detection and removal — the
  * exact-substring half of training-data dedup (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022, approximated at
  * the word-n-gram granularity a shuffle engine can do distributively;
  * the same idea RefinedWeb/CCNet apply at line level). Document-level
  * dedup (q70-q85) removes whole near-identical documents; this family
  * finds the duplicated PASSAGES that survive it — boilerplate headers,
  * license blocks, templated intros — and measures/strips them in place:
  *
  *   - q132 per-doc duplicated-span coverage (the quality signal),
  *   - q133 the stripped corpus (order-preserving token rebuild),
  *   - q134 the per-source duplication profile (which ingest feeds carry
  *     templated content — a curation diagnostic).
  *
  * Mechanics: a span = [[graft.functions.SpanPolyHashes]] positional
  * 5-gram hash (PORTABLE polynomial family, so the DuckDB oracle replays
  * every hash bit-for-bit — the q73/q74 technique). A span is corpus-
  * duplicated iff it occurs in ≥ [[MinSpanDocs]] DISTINCT documents
  * (within-doc repetition is q86/q113's subject, deliberately excluded
  * here). A token position is covered iff some duplicated span starts in
  * the previous SpanN−1 positions — a bounded window frame, not interval
  * arithmetic. 31-bit hash collisions can in principle mark a span
  * duplicated spuriously; the oracle computes the identical hashes, so
  * correctness comparison is unaffected and the statistical effect at
  * 2³¹ is negligible.
  *
  * Scale shape (the 100 TB read): span explode is linear and narrow (one
  * generator per doc); the duplicated-span set is ONE two-phase
  * count-distinct aggregate over 8-byte hashes (no Expand — single
  * distinct agg — and no strings ever shuffle); flagging is an equi
  * semi-join on the hash; coverage is a per-doc window with a bounded
  * (SpanN−1, 0) frame — constant state per key, no whole-corpus window;
  * the rebuild is q88's per-doc collect idiom (per-group memory = one
  * document). Nothing joins the corpus to itself.
  */
object SpanDedup extends QueryModule {

  /** Span length in tokens. 5 keeps the FP rate of "two docs
    * coincidentally share a span" low while still catching short
    * templated fragments. */
  val SpanN = 5

  /** A span is corpus-duplicated when it appears in at least this many
    * distinct documents. */
  val MinSpanDocs = 2

  /** Token positions with their duplicated-span coverage flag:
    * (doc_id, pos, tok, covered). Shared (ScopedCache) by all three
    * queries — the span aggregate and the window run once per corpus.
    */
  private[graft] def coveredTokens(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = docs.select(col("doc_id"), col("text"))
    val spans = d
      .select(col("doc_id"), posexplode(expr("graft_spans_poly(text)")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("span"))
    val dup = spans
      .groupBy(col("span"))
      .agg(countDistinct(col("doc_id")).as("span_df"))
      .filter(col("span_df") >= MinSpanDocs)
      .select(col("span"))
    val starts = spans
      .join(dup, Seq("span"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(1).as("flag"))
    val toks = d
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(SpanN - 1), Window.currentRow)
    // per-corpus variant (gatedShingles' idiom): fixture queries and
    // constructed-corpus tests each keep their own slot instead of
    // evicting each other; ScopedCache's per-family LRU cap bounds it
    val variant = docs.queryExecution.analyzed.semanticHash().toString
    ScopedCache.persist("spandedup.covered", variant,
      toks
        .join(starts, Seq("doc_id", "pos"), "left")
        .withColumn("covered", max(coalesce(col("flag"), lit(0))).over(w))
        .select(col("doc_id"), col("pos"), col("tok"), col("covered")))
  }

  /** q132: per-doc duplicated-span coverage — how much of each document
    * is text that also appears (as a ≥5-gram run) in other documents.
    * The standard pre-training quality gate on this signal drops or
    * trims docs above a coverage threshold; emitting the raw ratio keeps
    * the operator policy-free. */
  def dupSpanStats(spark: SparkSession, dir: String): DataFrame =
    dupSpanStatsOf(Tables.documents(spark, dir))

  /** DataFrame-level body (ScaleProbe drives it on replicated corpora). */
  private[graft] def dupSpanStatsOf(docs: DataFrame): DataFrame =
    coveredTokens(docs)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("covered")).as("n_covered"))
      .withColumn("dup_span_ratio",
        col("n_covered").cast(DoubleType) / col("n_tokens"))
      .orderBy(col("doc_id"))

  private val dupSpanStatsSql: String =
    s"""${coveredSqlPrefix()}
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(covered) AS BIGINT) AS n_covered,
      |  CAST(SUM(covered) AS DOUBLE) / COUNT(*) AS dup_span_ratio
      |FROM cov GROUP BY doc_id
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** q133: the corpus with covered tokens REMOVED — order-preserving
    * rebuild (q88's collect-and-sort idiom; per-group memory is one
    * document). A fully-covered doc survives as an empty string rather
    * than disappearing, so downstream length filters see it. */
  def stripDupSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = coveredTokens(docs).filter(col("covered") === 0)
    val rebuilt = kept
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            x => x.getField("tok")),
          " ").as("clean_text"))
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  private val stripDupSpansSql: String =
    s"""${coveredSqlPrefix()},
      |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |          STRING_AGG(tok, ' ' ORDER BY pos) AS clean_text
      |        FROM cov WHERE covered = 0 GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(LEN(STRING_SPLIT(d.text, ' ')) AS BIGINT) AS n_tokens,
      |  COALESCE(reb.n_kept, 0) AS n_kept,
      |  COALESCE(reb.clean_text, '') AS clean_text
      |FROM documents d LEFT JOIN reb ON reb.doc_id = d.doc_id
      |ORDER BY d.doc_id NULLS FIRST""".stripMargin

  /** q134: per-source duplication profile — which ingest feeds carry the
    * templated/boilerplate mass. Built from the per-doc aggregate (one
    * extra tiny shuffle), NOT via multi-arg count-distincts over the
    * token table, so no Expand ever materializes. */
  def spanDupBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val perDoc = coveredTokens(docs)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("covered")).as("n_covered"))
    perDoc
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_covered") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_covered")).as("n_covered"))
      .withColumn("dup_ratio",
        col("n_covered").cast(DoubleType) / col("n_tokens"))
      .orderBy(col("source"))
  }

  private val spanDupBySourceSql: String =
    s"""${coveredSqlPrefix()},
      |pd AS (SELECT doc_id, COUNT(*) AS n_tokens, SUM(covered) AS n_covered
      |       FROM cov GROUP BY doc_id)
      |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN pd.n_covered > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_docs_hit,
      |  CAST(SUM(pd.n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(SUM(pd.n_covered) AS BIGINT) AS n_covered,
      |  CAST(SUM(pd.n_covered) AS DOUBLE) / SUM(pd.n_tokens) AS dup_ratio
      |FROM documents d JOIN pd ON pd.doc_id = d.doc_id
      |GROUP BY d.source
      |ORDER BY d.source NULLS FIRST""".stripMargin

  /** Shared oracle CTE prefix ending in `cov(doc_id, pos, tok, covered)`
    * — the DuckDB replay of [[coveredTokens]]: token poly-hashes
    * ([[Dedup.polyFoldSql]], the fragment every portable-hash oracle
    * shares), the positional 5-gram combine (same arithmetic as
    * [[graft.functions.SpanPolyHashes]]), the distinct-doc gate, and the
    * bounded window. */
  /** The positional n-gram combine over a token-hash list `th` at offset
    * `i` — the SQL twin of [[graft.functions.SpanPolyHashes]]'s arithmetic,
    * shared by the covered-token replay and q138's decontamination oracle
    * so the span identity cannot drift between them. */
  // a def, not a val: the per-query SQL vals above initialize BEFORE
  // later-declared vals, and a val here would still be null when
  // coveredSqlPrefix() runs during their initialization
  private def spanCombineSql: String = {
    val P = PolyHash.P
    val M = PolyHash.M1
    // ((((th[i]*M + th[i+1]) % P * M + th[i+2]) % P ... ) — the n=5 fold
    (1 until SpanN).foldLeft("th[i]") { (acc, k) =>
      s"($acc * $M + th[i+$k]) % $P"
    }
  }

  /** toks → token hashes → positional span hashes (the `spn` CTE):
    * shared by the covered-token oracles below and the q157 winnowing
    * oracle, so the span identity cannot drift between them. Returned
    * WITHOUT the leading `WITH`. */
  private def spanSqlCtes(): String = {
    val M = PolyHash.M1
    val combine = spanCombineSql
    s"""toks AS (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS t FROM documents),
      |tht AS (SELECT doc_id,
      |  LIST_TRANSFORM(t, w -> ${Dedup.polyFoldSql("w", M)}) AS th,
      |  LEN(t) AS nt FROM toks),
      |spn AS (SELECT doc_id, u.i AS pos, $combine AS span
      |        FROM tht, UNNEST(GENERATE_SERIES(1, nt - ${SpanN - 1})) AS u(i)
      |        WHERE nt >= $SpanN)""".stripMargin
  }

  private def coveredSqlPrefix(): String = {
    s"""WITH ${spanSqlCtes()},
      |dup AS (SELECT span FROM spn GROUP BY span
      |        HAVING COUNT(DISTINCT doc_id) >= $MinSpanDocs),
      |st AS (SELECT DISTINCT s.doc_id, s.pos FROM spn s JOIN dup USING (span)),
      |tok AS (SELECT doc_id, u.i AS pos, t[u.i] AS tok
      |        FROM toks, UNNEST(GENERATE_SERIES(1, LEN(t))) AS u(i)),
      |cov AS (SELECT k.doc_id, k.pos, k.tok,
      |          MAX(CASE WHEN st.pos IS NOT NULL THEN 1 ELSE 0 END)
      |            OVER (PARTITION BY k.doc_id ORDER BY k.pos
      |                  ROWS BETWEEN ${SpanN - 1} PRECEDING AND CURRENT ROW)
      |            AS covered
      |        FROM tok k LEFT JOIN st ON st.doc_id = k.doc_id AND st.pos = k.pos)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q138: eval-set decontamination audit
  // ---------------------------------------------------------------------

  /** q138: split decontamination — flag val/test documents that share
    * any [[SpanN]]-gram span with ANY train document (the GPT-3 /
    * PaLM-style n-gram rule applied to the INTERNAL train/val/test cut:
    * q125's exact-text leakage audit upgraded to partial overlap — a
    * quoted paragraph, a shared template — while q76/q79 aim the same
    * idea at an EXTERNAL benchmark table).
    * The split is THE q67 assignment ([[TextOps.splitAssign]]), so the
    * audit can never drift from the split it audits. Emits, per held-out
    * split: document count, contaminated count and rate, and the
    * span-level hit mass (how MUCH of the held-out spans also occur in
    * train — severity, not just incidence).
    *
    * Scale shape: spans are per-doc DISTINCT (bounded by doc length); the
    * train-span set is one distinct aggregate over 8-byte hashes; the
    * containment test is a single equi-join of eval spans against it
    * (AQE-decided — at 100 TB both sides shuffle-partition on the hash;
    * no strings shuffle, nothing joins the corpus to itself); everything
    * after is per-doc then per-split aggregation. Docs shorter than
    * [[SpanN]] tokens produce no spans and are counted, uncontaminated,
    * via the left join. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminateOf(Tables.documents(spark, dir))

  /** Distinct (doc_id, split, span) triples — per-doc-DISTINCT span
    * hashes under THE q67 split. Shared (ScopedCache, per-corpus
    * variant) by the whole decontamination family (q138/q140/q141), so
    * the span explode and the distinct run once per corpus. */
  private def splitSpans(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val variant = docs.queryExecution.analyzed.semanticHash().toString
    ScopedCache.persist("spandedup.splitspans", variant,
      docs.select(col("doc_id"), TextOps.splitAssign.as("split"),
        explode(array_distinct(expr("graft_spans_poly(text)"))).as("span")))
  }

  /** Per eval doc with ≥1 span: (split, doc_id, n_spans, n_hit) where
    * n_hit counts its spans also present in ANY train doc. */
  private def evalSpanHits(docs: DataFrame): DataFrame = {
    val spans = splitSpans(docs)
    val trainSpans = spans.filter(col("split") === "train")
      .select(col("span")).distinct().withColumn("hit", lit(1L))
    spans.filter(col("split") =!= "train")
      .join(trainSpans, Seq("span"), "left")
      .groupBy(col("split"), col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
  }

  /** (split, doc_id) of every held-out document, spans or not. */
  private def evalDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), TextOps.splitAssign.as("split"))
      .filter(col("split") =!= "train")

  private[graft] def decontaminateOf(docs: DataFrame): DataFrame =
    contaminationRollup(docs, evalSpanHits(docs))

  /** Shared per-split roll-up over (split, doc_id, n_spans, n_hit) —
    * used by the inline q138 and the index-admitting q153, so the two
    * cannot drift in anything but where the train spans came from. */
  private def contaminationRollup(docs: DataFrame, hits: DataFrame): DataFrame = {
    evalDocs(docs)
      .join(hits, Seq("split", "doc_id"), "left")
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(coalesce(col("n_hit"), lit(0L)) > 0, 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(coalesce(col("n_spans"), lit(0L))).as("n_eval_spans"),
        sum(coalesce(col("n_hit"), lit(0L))).as("n_hit_spans"))
      .withColumn("contam_rate",
        col("n_contaminated").cast(DoubleType) / col("n_docs"))
      .select(col("split"), col("n_docs"), col("n_contaminated"),
        col("n_eval_spans"), col("n_hit_spans"), col("contam_rate"))
      .orderBy(col("split"))
  }

  // ---------------------------------------------------------------------
  // q152/q153: persisted span index — build once, screen many
  // ---------------------------------------------------------------------

  private val SpanIndexTables = Seq("train_spans")

  /** The frozen train corpus's distinct span-hash set, written once. */
  private def writeSpanIndex(docs: DataFrame, base: String): Unit =
    splitSpans(docs.filter(TextOps.splitAssign === "train"))
      .select(col("span")).distinct()
      .write.mode("overwrite").parquet(s"$base/train_spans")

  def ensureSpanIndex(spark: SparkSession, dir: String): String =
    graft.sources.ArtifactStore.ensure("spanindex", dir, SpanIndexTables)(
      b => writeSpanIndex(Tables.documents(spark, dir), b))

  /** q152: build the persisted span index (the q111 pattern applied to
    * decontamination: the train corpus is frozen once; every future eval
    * batch screens against the parquet span set instead of re-exploding
    * the train side). Result is accounting read back FROM THE WRITTEN
    * FILES — count + min/max of the stored hashes — which the oracle
    * recomputes from scratch, certifying the artifact's content. The
    * span explode runs over the train split only; the stored set is
    * distinct 8-byte hashes, the join-key-sized residue of the corpus. */
  def spanIndexBuild(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.sources.ArtifactStore.rebuild("spanindex", dir, SpanIndexTables)(
      b => writeSpanIndex(Tables.documents(spark, dir), b))
    spark.read.parquet(s"$base/train_spans")
      .agg(count(lit(1)).as("n_spans"),
        min(col("span")).as("lo"), max(col("span")).as("hi"))
      .select(lit("train_spans").as("component"), col("n_spans"),
        col("lo"), col("hi"))
  }

  private def spanIndexBuildSql =
    s"""WITH $splitSpanCtesSql
      |SELECT 'train_spans' AS component, CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  MIN(span) AS lo, MAX(span) AS hi
      |FROM (SELECT DISTINCT span FROM spn WHERE split = 'train') t""".stripMargin

  /** Screen ONE batch of documents (any provenance — a stream
    * micro-batch, a candidate crawl, a vendor drop) against the
    * persisted train-span index: per doc, its span count, how many
    * spans the train corpus already contains, and the contaminated
    * verdict. The admission kernel the batch q153 roll-up and the
    * streaming screen share, so live and offline screening cannot
    * drift. Span-less short docs come back clean with n_spans = 0. */
  def screenBatch(docs: DataFrame, indexBase: String): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val trainSpans = spark.read.parquet(s"$indexBase/train_spans")
      .withColumn("hit", lit(1L))
    val spans = docs.select(col("doc_id"),
      explode(array_distinct(expr("graft_spans_poly(text)"))).as("span"))
    val hits = spans.join(trainSpans, Seq("span"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    docs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)) > 0).as("contaminated"))
  }

  /** q153: the admit half — q138's audit with the train side read from
    * the persisted index (built on demand, signature-validated by
    * ArtifactStore, so a regenerated fixture rebuilds instead of
    * screening against a stale corpus). The eval batch still pays its
    * own span explode; the train corpus appears ONLY as the stored
    * distinct-hash parquet — at 100 TB that is the difference between
    * screening an eval set in minutes and re-processing the train set
    * every time. Oracle: q138's SQL verbatim — index admission must be
    * indistinguishable from inline recomputation. */
  def decontaminateIndexed(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureSpanIndex(spark, dir)
    val trainSpans = spark.read.parquet(s"$base/train_spans")
      .withColumn("hit", lit(1L))
    val docs = Tables.documents(spark, dir)
    val hits = splitSpans(docs).filter(col("split") =!= "train")
      .join(trainSpans, Seq("span"), "left")
      .groupBy(col("split"), col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    contaminationRollup(docs, hits)
  }

  /** Shared oracle prefix ending in `spn(doc_id, split, span)` — the
    * DuckDB replay of [[splitSpans]], used by every decontamination-
    * family oracle so the span identity and the split CASE cannot drift
    * between them. */
  private def splitSpanCtesSql: String = {
    val M = PolyHash.M1
    s"""toks AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
      |tht AS (SELECT doc_id,
      |  LIST_TRANSFORM(t, w -> ${Dedup.polyFoldSql("w", M)}) AS th,
      |  LEN(t) AS nt FROM toks),
      |spn AS (SELECT DISTINCT doc_id,
      |          ${TextOps.splitAssignSqlCase} AS split,
      |          $spanCombineSql AS span
      |        FROM tht, UNNEST(GENERATE_SERIES(1, nt - ${SpanN - 1})) AS u(i)
      |        WHERE nt >= $SpanN)""".stripMargin
  }

  private val decontaminateSql: String = {
    s"""WITH $splitSpanCtesSql,
      |tr AS (SELECT DISTINCT span FROM spn WHERE split = 'train'),
      |pd AS (SELECT s.split, s.doc_id, COUNT(*) AS n_spans,
      |         SUM(CASE WHEN tr.span IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      |       FROM spn s LEFT JOIN tr ON s.span = tr.span
      |       WHERE s.split <> 'train' GROUP BY 1, 2),
      |ed AS (SELECT doc_id, ${TextOps.splitAssignSqlCase} AS split
      |       FROM documents)
      |SELECT ed.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(CASE WHEN COALESCE(pd.n_hit, 0) > 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_contaminated,
      |  CAST(SUM(COALESCE(pd.n_spans, 0)) AS BIGINT) AS n_eval_spans,
      |  CAST(SUM(COALESCE(pd.n_hit, 0)) AS BIGINT) AS n_hit_spans,
      |  CAST(SUM(CASE WHEN COALESCE(pd.n_hit, 0) > 0 THEN 1 ELSE 0 END)
      |    AS DOUBLE) / COUNT(*) AS contam_rate
      |FROM ed LEFT JOIN pd ON pd.split = ed.split AND pd.doc_id = ed.doc_id
      |WHERE ed.split <> 'train'
      |GROUP BY ed.split
      |ORDER BY ed.split NULLS FIRST""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q140: the decontaminated eval set (the action q138 measures)
  // ---------------------------------------------------------------------

  /** q140: the CLEAN eval set — every val/test document sharing NO
    * [[SpanN]]-gram span with any train document (the action a pipeline
    * takes from q138's audit: these are the held-out docs eval scores
    * may be trusted on). Docs too short to produce a span are clean by
    * definition and appear with n_spans = 0.
    *
    * Scale shape: q138's dataflow with the final per-split roll-up
    * replaced by a filter — same single equi-join on 8-byte hashes, no
    * corpus self-join; the shared [[splitSpans]] cache means running the
    * audit and the action together pays the span explode once. */
  def cleanEvalSet(spark: SparkSession, dir: String): DataFrame =
    cleanEvalSetOf(Tables.documents(spark, dir))

  private[graft] def cleanEvalSetOf(docs: DataFrame): DataFrame =
    evalDocs(docs)
      .join(evalSpanHits(docs), Seq("split", "doc_id"), "left")
      .filter(coalesce(col("n_hit"), lit(0L)) === 0L)
      .select(col("split"), col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
      .orderBy(col("split"), col("doc_id"))

  private val cleanEvalSetSql: String =
    s"""WITH $splitSpanCtesSql,
      |tr AS (SELECT DISTINCT span FROM spn WHERE split = 'train'),
      |pd AS (SELECT s.split, s.doc_id, COUNT(*) AS n_spans,
      |         SUM(CASE WHEN tr.span IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      |       FROM spn s LEFT JOIN tr ON s.span = tr.span
      |       WHERE s.split <> 'train' GROUP BY 1, 2),
      |ed AS (SELECT doc_id, ${TextOps.splitAssignSqlCase} AS split
      |       FROM documents)
      |SELECT ed.split, ed.doc_id,
      |  CAST(COALESCE(pd.n_spans, 0) AS BIGINT) AS n_spans
      |FROM ed LEFT JOIN pd ON pd.split = ed.split AND pd.doc_id = ed.doc_id
      |WHERE ed.split <> 'train' AND COALESCE(pd.n_hit, 0) = 0
      |ORDER BY ed.split NULLS FIRST, ed.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q141: contamination provenance
  // ---------------------------------------------------------------------

  /** Provenance gate: spans occurring in more than this many DISTINCT
    * train documents are boilerplate (headers, license text) and carry
    * no provenance signal — they are excluded from attribution, and the
    * cap bounds the span→train-doc join fan-out (the q72 DF-gate idiom:
    * an eval doc joins at most n_spans × [[MaxProvSpanDf]] pairs). */
  val MaxProvSpanDf = 50

  /** q141: contamination provenance — for each contaminated eval doc,
    * WHICH train document it leaked from: the train doc sharing the most
    * (provenance-bearing) spans, ties to the lowest train doc_id. The
    * diagnostic that turns q138's "3% of test is contaminated" into an
    * actionable fix list (drop the train doc, or the eval doc, or the
    * shared template). Spans above [[MaxProvSpanDf]] train-DF are
    * excluded as boilerplate, so a doc whose ONLY shared spans are
    * boilerplate-hot attributes to no train doc here even though q138
    * counts it contaminated — deliberate, documented asymmetry.
    *
    * Scale shape: train-span DF is one count aggregate; the gate is an
    * equi-join against the ≤-cap spans; the eval⋈train pair join fans
    * out at most n_spans × cap per eval doc (bounded); the argmax is a
    * map-side-collapsible min_by keyed by eval doc — no window over
    * pairs, nothing joins the corpus to itself unGated. */
  def contaminationProvenance(spark: SparkSession, dir: String): DataFrame =
    contaminationProvenanceOf(Tables.documents(spark, dir))

  private[graft] def contaminationProvenanceOf(docs: DataFrame): DataFrame = {
    val spans = splitSpans(docs)
    val trainSpans = spans.filter(col("split") === "train")
      .select(col("doc_id").as("train_doc"), col("span"))
    val gated = trainSpans.join(
      trainSpans.groupBy(col("span")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= MaxProvSpanDf)
        .select(col("span")),
      Seq("span"), "left_semi")
    val pairs = spans.filter(col("split") =!= "train")
      .join(gated, Seq("span"))
      .groupBy(col("split"), col("doc_id"), col("train_doc"))
      .agg(count(lit(1)).as("shared_spans"))
    pairs
      .groupBy(col("split"), col("doc_id"))
      .agg(min_by(
        struct(col("train_doc"), col("shared_spans")),
        struct((-col("shared_spans")).as("neg"), col("train_doc"))).as("best"))
      .select(col("split"), col("doc_id"),
        col("best.train_doc").as("train_doc"),
        col("best.shared_spans").as("shared_spans"))
      .orderBy(col("split"), col("doc_id"))
  }

  private val contaminationProvenanceSql: String =
    s"""WITH $splitSpanCtesSql,
      |tsp AS (SELECT doc_id AS train_doc, span FROM spn WHERE split = 'train'),
      |sdf AS (SELECT span, COUNT(*) AS df FROM tsp GROUP BY span),
      |g AS (SELECT t.train_doc, t.span FROM tsp t
      |      JOIN sdf ON sdf.span = t.span WHERE sdf.df <= $MaxProvSpanDf),
      |pr AS (SELECT s.split, s.doc_id, g.train_doc, COUNT(*) AS shared_spans
      |       FROM spn s JOIN g ON g.span = s.span
      |       WHERE s.split <> 'train' GROUP BY 1, 2, 3),
      |r AS (SELECT split, doc_id, train_doc, shared_spans,
      |        ROW_NUMBER() OVER (PARTITION BY split, doc_id
      |          ORDER BY shared_spans DESC, train_doc) AS rk
      |      FROM pr)
      |SELECT split, doc_id, train_doc, shared_spans
      |FROM r WHERE rk = 1
      |ORDER BY split NULLS FIRST, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q157: winnowed document fingerprints
  // ---------------------------------------------------------------------

  /** Winnowing window size: every window of [[WinnowW]] consecutive span
    * positions contributes (at least) one selected fingerprint, so any
    * shared token run of length ≥ [[SpanN]] + [[WinnowW]] − 1 between two
    * documents is GUARANTEED to share a selected fingerprint — the
    * winnowing detection guarantee (Schleimer/Wilkerson/Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003). */
  val WinnowW = 4

  /** q157: winnowed fingerprint selection — the sampled alternative to
    * indexing EVERY positional span hash (what q152's span index and
    * q132's coverage stats pay): from each window of [[WinnowW]]
    * consecutive [[SpanN]]-gram hashes keep the minimum, rightmost on
    * ties. Expected density is 2/(W+1) of all positions (~40% at W=4),
    * with the guarantee above on what sampling can miss — the standard
    * fingerprint set for plagiarism-style overlap detection at corpus
    * scale, where the full positional index is the dominant storage cost.
    *
    * Plan shape: span explode is linear and narrow; window membership is
    * a bounded ×W explode (each span covers the W window-starts ending
    * at it); selection is ONE keyed aggregation — `min(struct(span,
    * −pos))` picks the rightmost minimum with map-side partial
    * aggregation, no per-partition sort, no self-join, no window
    * function. Short documents (fewer spans than W) winnow their single
    * truncated window so no document with ≥1 span loses all its
    * fingerprints. */
  def winnowedFingerprints(spark: SparkSession, dir: String): DataFrame =
    winnowedFingerprintsOf(Tables.documents(spark, dir))

  /** DataFrame-level body (SpanDedupSpec drives it on constructed
    * corpora for the hand-computed and guarantee properties). */
  private[graft] def winnowedFingerprintsOf(docs: DataFrame): DataFrame =
    winnowedPicksOf(docs).orderBy(col("doc_id"), col("pos"))

  /** The winnowed pick set (doc_id, pos, fp) WITHOUT the presentation
    * sort — q157 orders it; q158 consumes (doc_id, fp) into the pair
    * join where a global order buys nothing but an exchange. */
  private def winnowedPicksOf(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val spans = docs
      .select(col("doc_id"), posexplode(expr("graft_spans_poly(text)")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("span"))
    // a span at pos belongs to windows starting at pos-W+1 .. pos; a
    // window is complete iff it collected exactly W spans (win=1 is kept
    // even when truncated, so short docs still fingerprint)
    val wins = spans
      .select(col("doc_id"), col("pos"), col("span"),
        explode(sequence(col("pos") - (WinnowW - 1), col("pos"))).as("win"))
      .filter(col("win") >= 1)
    val variant = docs.queryExecution.analyzed.semanticHash().toString
    ScopedCache.persist("spandedup.winnow", variant,
      wins.groupBy(col("doc_id"), col("win"))
        .agg(count(lit(1)).as("n"),
          min(struct(col("span"), (-col("pos")).as("negpos"))).as("sel"))
        .filter(col("n") === WinnowW || col("win") === 1)
        .select(col("doc_id"), (-col("sel.negpos")).as("pos"),
          col("sel.span").as("fp"))
        .distinct())
  }

  // ---------------------------------------------------------------------
  // q181: winnowed decontamination screen — persisted ~39%-size index
  // ---------------------------------------------------------------------

  private val WinnowIndexTables = Seq("train_fps")

  /** The train split's distinct winnowed fingerprints, written once —
    * q152's persisted-screen pattern at winnowing's ~2/(W+1) index
    * density, with the detection guarantee bounding what the sampling
    * can miss. */
  private[graft] def writeWinnowIndex(docs: DataFrame, base: String): Unit =
    winnowedPicksOf(docs.filter(TextOps.splitAssign === "train"))
      .select(col("fp")).distinct()
      .write.mode("overwrite").parquet(s"$base/train_fps")

  def ensureWinnowIndex(spark: SparkSession, dir: String): String =
    graft.sources.ArtifactStore.ensure("winnowindex", dir, WinnowIndexTables)(
      b => writeWinnowIndex(Tables.documents(spark, dir), b))

  /** q181: decontamination screen against the PERSISTED winnowed index —
    * q153's admit-half economics at ~39% of the index bytes: the frozen
    * train corpus appears only as stored distinct 8-byte fingerprints,
    * each eval doc pays its own winnow pass, and a flagged doc shares at
    * least one SELECTED fingerprint with train. Winnowing trades recall
    * on SHORT overlaps for index size under a hard guarantee: any shared
    * run of ≥ [[SpanN]] + [[WinnowW]] − 1 tokens still shares a selected
    * fingerprint in both documents (both sides winnow with the same W),
    * so verbatim leakage of benchmark-question length cannot slip
    * through — only sub-8-token fragments can, which q138's full-index
    * audit prices (q181 flags a SUBSET of q138's contaminated docs; the
    * SpanDedupSpec law pins both the subset direction and the
    * guarantee). */
  def winnowScreen(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureWinnowIndex(spark, dir)
    val docs = Tables.documents(spark, dir)
    winnowScreenOf(spark.read.parquet(s"$base/train_fps"),
      docs.withColumn("split", TextOps.splitAssign)
        .filter(col("split") =!= "train"))
  }

  /** DataFrame-level core: screen `evalDocs` (doc_id, text, split)
    * against a fingerprint set (fp). Constructed corpora drive this
    * directly — the registered query wires the hash split and the
    * artifact. Fingerprint-less docs (shorter than one span) come back
    * clean, counted in n_docs. */
  private[graft] def winnowScreenOf(trainFps: DataFrame,
      evalDocs: DataFrame): DataFrame = {
    val hitTab = trainFps.withColumn("hit", lit(1L))
    val fps = winnowedPicksOf(evalDocs)
      .select(col("doc_id"), col("fp")).distinct()
    val perDoc = fps.join(hitTab, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fps"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    evalDocs.select(col("doc_id"), col("split"))
      .join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(coalesce(col("n_hit"), lit(0L)) > 0, 1L).otherwise(0L))
          .as("n_flagged"),
        sum(coalesce(col("n_fps"), lit(0L))).as("n_eval_fps"),
        sum(coalesce(col("n_hit"), lit(0L))).as("n_hit_fps"))
      .select(col("split"), col("n_docs"), col("n_flagged"),
        col("n_eval_fps"), col("n_hit_fps"),
        (col("n_flagged").cast(DoubleType) / col("n_docs")).as("flag_rate"))
      .orderBy(col("split"))
  }

  /** Oracle replays the full definition in-plan (artifact determinism,
    * the q109/q153 precedent): winnow over all docs, train fingerprints
    * from the train split, per-doc hit counts, per-split roll-up. */
  private val winnowScreenSql =
    s"""WITH ${spanSqlCtes()},
      |${winnowCtes()},
      |ed AS (SELECT doc_id, ${TextOps.splitAssignSqlCase} AS split
      |       FROM documents),
      |f AS (SELECT DISTINCT doc_id, fp FROM wfp),
      |fx AS (SELECT f.doc_id, f.fp, ed.split FROM f JOIN ed USING (doc_id)),
      |tr AS (SELECT DISTINCT fp FROM fx WHERE split = 'train'),
      |pd AS (SELECT fx.split, fx.doc_id, COUNT(*) AS n_fps,
      |         SUM(CASE WHEN tr.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      |       FROM fx LEFT JOIN tr ON fx.fp = tr.fp
      |       WHERE fx.split <> 'train' GROUP BY 1, 2),
      |agg AS (SELECT ed.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |          CAST(SUM(CASE WHEN COALESCE(pd.n_hit, 0) > 0 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_flagged,
      |          CAST(SUM(COALESCE(pd.n_fps, 0)) AS BIGINT) AS n_eval_fps,
      |          CAST(SUM(COALESCE(pd.n_hit, 0)) AS BIGINT) AS n_hit_fps
      |        FROM ed LEFT JOIN pd ON pd.split = ed.split AND pd.doc_id = ed.doc_id
      |        WHERE ed.split <> 'train' GROUP BY 1)
      |SELECT split, n_docs, n_flagged, n_eval_fps, n_hit_fps,
      |  CAST(n_flagged AS DOUBLE) / n_docs AS flag_rate
      |FROM agg
      |ORDER BY split NULLS FIRST""".stripMargin

  /** A fingerprint present in more documents than this is boilerplate
    * (license blocks, templated headers) and is excluded from pair
    * generation — the q72 MaxShingleDF rationale applied to the winnowed
    * set: one corpus-hot fingerprint would otherwise fan the pair join
    * out O(df²). */
  val MaxFpDF = 100

  /** Candidate pairs must share at least this many fingerprints (one
    * shared pick is a single 5-gram — below the noise floor). */
  val MinSharedFps = 2

  /** q158: overlap-candidate pairs from the WINNOWED fingerprint set —
    * the MOSS detection step: two documents sharing ≥ [[MinSharedFps]]
    * selected fingerprints are candidates for sub-document overlap
    * (plagiarism, syndication, templated content). This is q72's
    * candidate generation run against a ~39%-size sampled index
    * (BASELINE.md's q157 density row) with the winnowing guarantee
    * bounding what the sampling can miss.
    *
    * Scale shape identical to the gated-shingle pair pipeline: the pair
    * join is an equi-join on the 8-byte fingerprint, DF-gated so no hot
    * fingerprint fans out quadratically; counts aggregate with map-side
    * combine; size joins never appear (no Jaccard denominator — this is
    * the candidate DETECTOR; the verifier is q72/q132 on the candidates
    * only). */
  def winnowedOverlapPairs(spark: SparkSession, dir: String): DataFrame =
    winnowedOverlapPairsOf(Tables.documents(spark, dir))

  private[graft] def winnowedOverlapPairsOf(docs: DataFrame): DataFrame = {
    val fps = winnowedPicksOf(docs).select(col("doc_id"), col("fp")).distinct()
    val hot = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxFpDF).select(col("fp"))
    val gated = fps.join(hot, Seq("fp"), "left_anti")
    gated.as("a").join(gated.as("b"), Seq("fp"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFps)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val winnowedOverlapPairsSql =
    s"""WITH ${spanSqlCtes()},
      |${winnowCtes()},
      |f AS (SELECT DISTINCT doc_id, fp FROM wfp),
      |hotf AS (SELECT fp FROM f GROUP BY fp HAVING COUNT(*) > $MaxFpDF),
      |g AS (SELECT doc_id, fp FROM f
      |      WHERE NOT EXISTS (SELECT 1 FROM hotf h WHERE h.fp = f.fp))
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
      |FROM g a JOIN g b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= $MinSharedFps
      |ORDER BY doc_a NULLS FIRST, doc_b NULLS FIRST""".stripMargin

  /** spn → winnowed picks `wfp(doc_id, pos, fp)` — the SQL mirror of
    * [[winnowedPicksOf]], shared by the q157 and q158 oracles so the
    * fingerprint selection cannot drift between them. */
  private def winnowCtes(): String =
    s"""wins AS (
      |  SELECT s.doc_id, s.pos, s.span, w.win
      |  FROM spn s, UNNEST(GENERATE_SERIES(s.pos - ${WinnowW - 1}, s.pos)) AS w(win)
      |  WHERE w.win >= 1),
      |picks AS (
      |  SELECT doc_id, win, span, pos,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id, win
      |                       ORDER BY span NULLS FIRST, pos DESC) AS rn,
      |    COUNT(*) OVER (PARTITION BY doc_id, win) AS n
      |  FROM wins),
      |wfp AS (SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, span AS fp
      |        FROM picks WHERE rn = 1 AND (n = $WinnowW OR win = 1))""".stripMargin

  private val winnowedFingerprintsSql =
    s"""WITH ${spanSqlCtes()},
      |${winnowCtes()}
      |SELECT doc_id, pos, fp FROM wfp
      |ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------------
  // q229: decontamination-screen method card — full index vs winnowed
  // ---------------------------------------------------------------------

  /** q229: the q217/q224 method-card treatment for the decontamination
    * family — the "which screen do we run?" decision priced by
    * measurement: ONE row per (method, split) for the full span index
    * (q138/q152/q153: every distinct train 5-gram hash) and the winnowed
    * index (q157/q181: Schleimer/Wilkerson/Aiken SIGMOD'03 selection at
    * ~2/(W+1) density), each reporting its index size, the measured
    * size ratio (the ~39% headline), eval docs flagged per split, the
    * flag rate, how many docs the full audit catches that this method
    * MISSES (0 for full by definition; the subset law's gap, priced
    * instead of implied), and the method's detection guarantee in
    * tokens — full catches any shared run ≥ [[SpanN]], winnowing any
    * run ≥ [[SpanN]] + [[WinnowW]] − 1 (the SIGMOD'03 bound q181's
    * scaladoc states; here it sits next to what that bound actually
    * cost on this corpus).
    *
    * Both methods replay their certified instruments: the full rows are
    * [[decontaminateOf]]'s roll-up (q138) and the winnowed rows are
    * [[winnowScreenOf]] over the train split's distinct fingerprints
    * (q181's definition, recomputed in-plan — artifact determinism, the
    * q109/q153 precedent), so no card cell can drift from the query it
    * summarizes (invisibility law in SpanDedupSpec).
    *
    * Scale shape: the span explode runs once ([[splitSpans]] ScopedCache,
    * shared with q138/q140/q141 in the same session) and the winnow
    * selection once per side ([[winnowedPicksOf]] cache, shared with
    * q157/q158/q181); everything above the per-doc hit aggregates is
    * split-count-sized, and the card assembly is broadcast joins over
    * ≤4 rows — the card costs the two audits it compares, + ε. */
  def decontamMethodCard(spark: SparkSession, dir: String): DataFrame =
    decontamMethodCardOf(Tables.documents(spark, dir))

  /** DataFrame-level core (testable on constructed corpora). */
  private[graft] def decontamMethodCardOf(docs: DataFrame): DataFrame = {
    val full = decontaminateOf(docs)
      .select(col("split"), col("n_docs"), col("n_contaminated").as("n_flagged"))
    val trainFps = winnowedPicksOf(docs.filter(TextOps.splitAssign === "train"))
      .select(col("fp")).distinct()
    val evalD = docs.withColumn("split", TextOps.splitAssign)
      .filter(col("split") =!= "train")
    val win = winnowScreenOf(trainFps, evalD)
      .select(col("split"), col("n_docs"), col("n_flagged"))
    val fullIdx = splitSpans(docs).filter(col("split") === "train")
      .select(col("span")).distinct()
      .agg(count(lit(1)).as("full_index_size"))
    val winIdx = trainFps.agg(count(lit(1)).as("index_size"))
    // broadcast scalar idiom: the 1-row index sizes under every split row
    val rows = full.crossJoin(broadcast(fullIdx))
      .select(lit("full_span").as("method"), col("split"),
        col("full_index_size").as("index_size"), col("n_docs"),
        col("n_flagged"), lit(SpanN.toLong).as("guarantee_tokens"))
      .unionByName(win.crossJoin(broadcast(winIdx))
        .select(lit("winnowed").as("method"), col("split"),
          col("index_size"), col("n_docs"), col("n_flagged"),
          lit((SpanN + WinnowW - 1).toLong).as("guarantee_tokens")))
    val fullFlag = full.select(col("split").as("fsplit"),
      col("n_flagged").as("full_flagged"))
    rows.join(broadcast(fullFlag), col("split") === col("fsplit"))
      .crossJoin(broadcast(fullIdx))
      .select(col("method"), col("split"), col("index_size"),
        round(col("index_size").cast(DoubleType) / col("full_index_size"), 6)
          .as("index_ratio"),
        col("n_docs"), col("n_flagged"),
        (col("n_flagged").cast(DoubleType) / col("n_docs")).as("flag_rate"),
        (col("full_flagged") - col("n_flagged")).as("n_missed"),
        col("guarantee_tokens"))
      .orderBy(col("method"), col("split"))
  }

  /** Oracle: both screens replayed from the raw corpus off ONE shared
    * `spn` (spanSqlCtes + winnowCtes — the q157/q158/q181 fragments
    * verbatim), per-doc-distinct spans for the full method (the
    * splitSpans DISTINCT), then the two per-split roll-ups unioned into
    * card rows. */
  private val decontamMethodCardSql =
    s"""WITH ${spanSqlCtes()},
      |${winnowCtes()},
      |ed AS (SELECT doc_id, ${TextOps.splitAssignSqlCase} AS split
      |       FROM documents),
      |ds AS (SELECT DISTINCT doc_id, span FROM spn),
      |dsx AS (SELECT ds.doc_id, ds.span, ed.split FROM ds JOIN ed USING (doc_id)),
      |trs AS (SELECT DISTINCT span FROM dsx WHERE split = 'train'),
      |fidx AS (SELECT CAST(COUNT(*) AS BIGINT) AS full_index_size FROM trs),
      |fpd AS (SELECT d.split, d.doc_id,
      |          SUM(CASE WHEN t.span IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      |        FROM dsx d LEFT JOIN trs t ON d.span = t.span
      |        WHERE d.split <> 'train' GROUP BY 1, 2),
      |fagg AS (SELECT ed.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |           CAST(SUM(CASE WHEN COALESCE(f.n_hit, 0) > 0 THEN 1 ELSE 0 END)
      |             AS BIGINT) AS n_flagged
      |         FROM ed LEFT JOIN fpd f
      |           ON f.split = ed.split AND f.doc_id = ed.doc_id
      |         WHERE ed.split <> 'train' GROUP BY 1),
      |f2 AS (SELECT DISTINCT doc_id, fp FROM wfp),
      |fx AS (SELECT f2.doc_id, f2.fp, ed.split FROM f2 JOIN ed USING (doc_id)),
      |trw AS (SELECT DISTINCT fp FROM fx WHERE split = 'train'),
      |widx AS (SELECT CAST(COUNT(*) AS BIGINT) AS index_size FROM trw),
      |wpd AS (SELECT fx.split, fx.doc_id,
      |          SUM(CASE WHEN t.fp IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
      |        FROM fx LEFT JOIN trw t ON fx.fp = t.fp
      |        WHERE fx.split <> 'train' GROUP BY 1, 2),
      |wagg AS (SELECT ed.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |           CAST(SUM(CASE WHEN COALESCE(w.n_hit, 0) > 0 THEN 1 ELSE 0 END)
      |             AS BIGINT) AS n_flagged
      |         FROM ed LEFT JOIN wpd w
      |           ON w.split = ed.split AND w.doc_id = ed.doc_id
      |         WHERE ed.split <> 'train' GROUP BY 1),
      |card AS (
      |  SELECT 'full_span' AS method, split,
      |         (SELECT full_index_size FROM fidx) AS index_size,
      |         n_docs, n_flagged, CAST($SpanN AS BIGINT) AS guarantee_tokens
      |  FROM fagg
      |  UNION ALL
      |  SELECT 'winnowed', split, (SELECT index_size FROM widx),
      |         n_docs, n_flagged, CAST(${SpanN + WinnowW - 1} AS BIGINT)
      |  FROM wagg)
      |SELECT r.method, r.split, r.index_size,
      |  ROUND(CAST(r.index_size AS DOUBLE)
      |        / (SELECT full_index_size FROM fidx), 6) AS index_ratio,
      |  r.n_docs, r.n_flagged,
      |  CAST(r.n_flagged AS DOUBLE) / r.n_docs AS flag_rate,
      |  fa.n_flagged - r.n_flagged AS n_missed,
      |  r.guarantee_tokens
      |FROM card r JOIN fagg fa ON fa.split = r.split
      |ORDER BY r.method NULLS FIRST, r.split NULLS FIRST""".stripMargin

  override def queries: Seq[GraftQuery] = Seq(
    GraftQuery("q132_dup_span_stats", dupSpanStats, Some(dupSpanStatsSql)),
    GraftQuery("q133_strip_dup_spans", stripDupSpans, Some(stripDupSpansSql)),
    GraftQuery("q134_span_dup_by_source", spanDupBySource, Some(spanDupBySourceSql)),
    GraftQuery("q138_decontaminate", decontaminate, Some(decontaminateSql)),
    GraftQuery("q140_clean_eval_set", cleanEvalSet, Some(cleanEvalSetSql)),
    GraftQuery("q141_contamination_provenance", contaminationProvenance,
      Some(contaminationProvenanceSql)),
    GraftQuery("q152_span_index_build", spanIndexBuild, Some(spanIndexBuildSql)),
    GraftQuery("q153_decontaminate_indexed", decontaminateIndexed,
      Some(decontaminateSql)),
    GraftQuery("q181_winnow_screen", winnowScreen, Some(winnowScreenSql)),
    GraftQuery("q157_winnowed_fingerprints", winnowedFingerprints,
      Some(winnowedFingerprintsSql)),
    GraftQuery("q158_winnowed_overlap_pairs", winnowedOverlapPairs,
      Some(winnowedOverlapPairsSql)),
    GraftQuery("q229_decontam_method_card", decontamMethodCard,
      Some(decontamMethodCardSql)),
  )
}
