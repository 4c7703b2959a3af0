package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.operators._

/** Dev tool: dumps formatted physical plans of representative queries to
  * PLANS.md — the audit trail showing pushdown/pruning/broadcast/codegen
  * decisions (the ".explain and iterate" loop, materialized).
  * Usage: runMain graft.tools.Plans [sfDir]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.get("graft-plans")

    def section(title: String, note: String, df: DataFrame,
        maxLines: Int = 0): String = {
      df.collect() // finalize AQE so the printed plan is the executed one
      val full = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      val plan =
        if (maxLines > 0 && full.linesIterator.size > maxLines) {
          val n = full.linesIterator.size
          full.linesIterator.take(maxLines).mkString("\n") +
            s"\n… (truncated: $n lines total — the blowup is the " +
            "formatted PRINT re-expanding shared cached subtrees per " +
            "reference; the executed DAG materializes each once)\n"
        } else full
      s"## $title\n\n$note\n\n```\n$plan```\n"
    }

    val sections = Seq(
      section("q01 pricing summary (wide decimal hash aggregate)",
        "What to look for: filter pushed to the parquet scan " +
          "(`PushedFilters`), only the 7 needed columns in `ReadSchema`, " +
          "partial+final HashAggregate around one exchange, whole-stage " +
          "codegen (`*(n)`) spans.",
        Relational.pricingSummary(spark, dir)),
      section("q02 revenue per nation (flagship star join)",
        "What to look for: nation/region arrive via BroadcastHashJoin " +
          "(no fact-side shuffle on those keys); the fact⋈fact join " +
          "shuffles each side once on the join key; AQE coalesces " +
          "post-shuffle partitions.",
        Relational.revenueByNation(spark, dir)),
      section("q42 latest-per-key compaction (event-log table view)",
        "What to look for: since the r10 RewriteWindowTopK rule, the " +
          "row_number()=1-then-drop pattern plans as GroupTopKPartial → " +
          "one exchange → GroupTopKFinal (k=1 heaps, no Sort, no " +
          "Window) — the rule upgrading an existing query untouched; " +
          "the oracle can't tell the difference.",
        EventLog.compactLatestPerKey(spark, dir)),
      section("q72 exact n-gram Jaccard (near-dup pairs)",
        "What to look for: the shingle table is computed once (InMemory " +
          "cache) and the self-join reuses one exchange; the per-doc size " +
          "table joins by broadcast; shingles are 64-bit longs, not " +
          "strings.",
        Dedup.ngramJaccardPairs(spark, dir)),
      section("q82 LSH-bucketed ANN (similarity scale path)",
        "What to look for: the probe/candidate match is an equi-join on " +
          "the bucket id (no CartesianProduct anywhere); the cosine " +
          "kernel is the native graft_cosine expression inside the " +
          "codegen'd projection.",
        Similarity.annSignBuckets(spark, dir)),
      section("q52 binned range join (no equi-key)",
        "What to look for: NO BroadcastNestedLoopJoin — the input " +
          "pre-aggregates to distinct (timestamp, count) rows, the ±24 h " +
          "theta predicate rides an equi-join on the exploded day bin, " +
          "then a refine filter; shuffle volume is linear in distinct " +
          "timestamps, and the final per-order join is a key lookup.",
        EventLog.rangeJoinNearbyOrders(spark, dir)),
      section("q75 embedding-cosine near-dup (dedup scale path)",
        "What to look for: candidate pairs come from an equi-self-join " +
          "on the sign-bucket id (hot buckets anti-joined out first); " +
          "graft_cosine runs codegen'd on co-bucketed pairs only.",
        Dedup.embeddingNearDupPairs(spark, dir)),
      section("q26 distinct parts per nation (two-level distinct aggregate)",
        "What to look for: NO Expand node — the two count-distincts run " +
          "as separate single-distinct branches (partial-aggregated " +
          "map-side) joined on the 25-row group key; the supplier " +
          "broadcast exchange is reused across branches.",
        Analytics.distinctPartsPerNation(spark, dir)),
      section("q76 benchmark decontamination (AQE-decided benchmark side)",
        "What to look for: both joins against the benchmark side carry " +
          "no hint, and AQE converts them to BroadcastHashJoin at this " +
          "scale (small eval suite) — the train shingle table is never " +
          "shuffled; with an unboundedly large carve they would degrade " +
          "to shuffle joins instead of OOMing the driver.",
        Dedup.contamination(spark, dir)),
      section("q73 MinHash+LSH near-dup pairs (hot-bucket anti-join gate)",
        "What to look for: the hot-bucket gate (band,bsig buckets over " +
          "the cap) joins as BroadcastHashJoin LeftAnti — the hot list " +
          "is tiny at runtime, so AQE (or the explicit plan) must " +
          "broadcast it rather than shuffle the full banded table.",
        Dedup.minhashLshPairs(spark, dir)),
      section("q79 fixed-benchmark decontamination (broadcast-pinned)",
        "What to look for: the train side is scan → graft_shingles " +
          "explode → BroadcastHashJoin on the shingle hash with NO " +
          "exchange of any kind before the join (PlanSpec asserts this " +
          "structurally); the first shuffle keys on (train_doc, " +
          "bench_doc) over matched rows only. The bench side is " +
          "bounded, so its broadcasts are pinned, not AQE-decided.",
        Dedup.contaminationFixedBench(spark, dir)),
      section("q69 shard-bounded sequence packing",
        "What to look for: the running-sum Window partitions by " +
          "(source, shard) — 16 independent window partitions per " +
          "source instead of one, so a single giant source cannot " +
          "serialize through one task; everything below the window is " +
          "a narrow map.",
        TextOps.packSequencesSharded(spark, dir)),
      section("q85 fuzzy-deduplicated corpus (survivor anti-join)",
        "What to look for: cached exact-survivor table anti-joined " +
          "against the tiny near-dup drop set (BroadcastHashJoin " +
          "LeftAnti at runtime) — the drop set is bounded by the pair " +
          "graph, which is orders of magnitude smaller than the corpus.",
        Dedup.fuzzyDedupCorpus(spark, dir)),
      section("q77 near-dup cluster resolution (final assembly)",
        "What to look for: the label table arriving from the converged " +
          "propagation loop is a checkpointed scan (`Scan " +
          "ExistingRDD`-shaped) — the O(log n) iterations themselves " +
          "are driver-sequenced DataFrame jobs (two equi-joins + a min " +
          "aggregate each, lineage truncated per round) and do not " +
          "appear in this single explain; the visible plan is just the " +
          "cluster-size window + sort over the final labels.",
        Dedup.neardupClusters(spark, dir)),
      section("q86 repetition signals (two-level distinct-pair aggregate)",
        "What to look for: no Expand node — the unigram and bigram " +
          "branches each aggregate distinct (doc, gram) pairs and join " +
          "on doc_id; the shuffle carries collapsed pair counts, never " +
          "the raw token stream.",
        TextOps.repetitionSignals(spark, dir)),
      section("q88 boilerplate strip (corpus-adaptive stop list)",
        "What to look for: the document-frequency stop list feeds a " +
          "LeftAnti join (AQE broadcasts it when small); the 1-row " +
          "n_docs scalar rides a BroadcastNestedLoopJoin — the standard " +
          "scalar-subquery idiom, not a data-sized cartesian.",
        TextOps.stripBoilerplate(spark, dir)),
      section("q89 PII redaction (narrow map)",
        "What to look for: zero exchanges before the presentation " +
          "sort's range partitioning — four regexp_count/regexp_replace " +
          "families fused into one whole-stage-codegen projection.",
        TextOps.redactPii(spark, dir)),
      section("q93 LM surprisal (vocab-probability broadcast)",
        "What to look for: the vocabulary-sized probability table " +
          "returns to the (doc, token) counts via BroadcastHashJoin " +
          "(AQE-decided); the per-doc aggregate sums DECIMAL(38,12) " +
          "terms — exact, order-independent partial/final hash " +
          "aggregation.",
        TextOps.lmSurprisal(spark, dir)),
      section("q96 semantic dedup (embedding clusters, final assembly)",
        "What to look for: same shape as q77's assembly — the converged " +
          "label table is a checkpointed scan left-joined to the " +
          "embeddings (broadcast at runtime: the cluster table is " +
          "bounded by the pair graph), then one small aggregate per " +
          "class label.",
        Dedup.semanticDedup(spark, dir)),
      section("q99 incremental new-vs-seen dedup (verdict assembly)",
        "What to look for: the exact gate is a LeftSemi hash join on " +
          "32-byte content hashes (seen side collapses to distinct " +
          "hashes map-side); the near gate reuses the cached DF-gated " +
          "shingle table (LeftAnti gate inside the InMemoryRelation); " +
          "verdict assembly is two left joins against flag tables " +
          "bounded by the incoming batch.",
        Dedup.incrementalDedup(spark, dir)),
      section("q100 k-means final step (broadcast model + min_by argmin)",
        "What to look for: the k-row model arrives via " +
          "BroadcastNestedLoopJoin (the broadcast scalar/model idiom — " +
          "no equi key on a cross join by design); the argmin is a " +
          "partial/final min_by SortAggregate keyed vec_id whose " +
          "partials collapse map-side, and this final accounting pass " +
          "carries only (cluster, dist) per vector — the vector itself " +
          "rides the min_by payload only inside training steps; earlier " +
          "iterations live in checkpointed RDD scans.",
        Similarity.kmeansTrain(spark, dir)),
      section("q101 PQ codebook training (per-block broadcast equi-join)",
        "What to look for: q100's shape with an equi key — the " +
          "per-block model joins via BroadcastHashJoin on block id; " +
          "the min_by argmin is keyed (vec_id, block); the recompute " +
          "aggregate shuffles only (block, cluster, dim) partials.",
        Similarity.pqTrain(spark, dir)),
      section("q106 PQ ADC search (broadcast lookup table)",
        "What to look for: every join is an explicitly hinted " +
          "BroadcastHashJoin (LUT on (block, cluster), model on block) " +
          "— the corpus-side codes never shuffle; the per-(probe, " +
          "vector) distance sum is a partial/final aggregate over " +
          "DECIMAL casts; top-k is a 10-partition window over " +
          "probe-count rows, not corpus rows.",
        Similarity.pqSearch(spark, dir)),
      section("q107 IVF-PQ composed search (cell-gated ADC)",
        "What to look for: the probe-cells gate and the LUT arrive by " +
          "broadcast; the one corpus-to-corpus join (cells-codes on " +
          "vec_id, the index-build join) is unhinted and AQE-decided — " +
          "broadcast at this scale, an honest primary-key shuffle when " +
          "both index sides are huge; both training loops live in " +
          "checkpointed RDD scans.",
        Similarity.ivfPqSearch(spark, dir)),
      section("q109 IVF-PQ search over the persisted index (production shape)",
        "What to look for: NO training anywhere — the corpus-sized " +
          "inputs are two column-pruned parquet scans of the q108 " +
          "artifact (cells: vec_id/cell; codes: vec_id/block/cluster); " +
          "the probe-cell gate and the LUT join by broadcast against " +
          "them; the ADC sum collapses map-side. Compare with q107: " +
          "same scan tail, minus the seven in-plan training passes.",
        Similarity.ivfPqQuery(spark, dir)),
      section("q112 incremental dedup against the persisted index (admission shape)",
        "What to look for: the seen corpus appears ONLY as parquet " +
          "scans of the q111 artifact (hashes / hot / shingles) — no " +
          "seen-side shingling or hashing in-plan; only the batch is " +
          "shingled and hashed; the hash semi-join, hot anti-join, and " +
          "containment join all broadcast their small side at runtime. " +
          "Admission cost is batch-proportional, not corpus-proportional " +
          "— q99's docstring promise, realized.",
        Dedup.incrementalDedupIndexed(spark, dir)),
      section("q116 per-language quantile gate (bounded-state percent_rank)",
        "What to look for: NO window partitioned by lang alone — the " +
          "rank splits into a value-count cum-sum (window over distinct " +
          "(lang, diversity) values) plus a row_number over tie groups, " +
          "then a value-table equi-join AQE broadcasts. A naive " +
          "percent_rank would put each whole language in one task.",
        Curation.qualityFilterPerLang(spark, dir)),
      section("q118 heavy hitters (Misra-Gries sketch + exact recount)",
        "What to look for: the first aggregate carries the bounded " +
          "graft_heavy_hitters sketch buffer (no token-keyed exchange " +
          "of the corpus for candidates); the recount pass joins the " +
          "≤200 candidates via BroadcastHashJoin and map-side-collapses " +
          "before its exchange; the scalar total rides the broadcast " +
          "nested-loop idiom.",
        Curation.heavyHitters(spark, dir)),
      section("q119 curriculum deciles (bounded-state global rank)",
        "What to look for: a RangePartitioning exchange on the sort key, " +
          "window functions keyed by pid (the range-partition id) — " +
          "never an empty windowspecdefinition over the corpus; the " +
          "offsets and n_docs tables arrive via broadcast.",
        Curation.curriculumOrder(spark, dir)),

      section("q122 Unicode normalization (native graft_nfc_lower narrow map)",
        "What to look for: one codegen'd Project over the scan carrying " +
          "graft_nfc_lower/trim/regexp_replace — no UDF node, no " +
          "exchange other than the presentation sort's range partitioning.",
        Profiling.normalizeText(spark, dir)),

      section("q126 fixed-k per-source sample (partitioned rank window)",
        "What to look for: the row_number window specs partitioned by " +
          "source (state bounded by the largest source) over a single " +
          "hash exchange — never an empty windowspecdefinition.",
        Profiling.fixedSample(spark, dir)),

      section("q27 portable KMV distinct sketch (r10, oracle-green)",
        "What to look for: the hash is plain codegen'd column arithmetic " +
          "in the Project over the scan (no UDF, no blackbox expression); " +
          "graft_kmv is an ObjectHashAggregate whose partial mode runs " +
          "map-side, so every exchange carries bounded sketch buffers " +
          "(k=1024 longs), never raw values — the HLL scale story with a " +
          "replayable state. The two-level shape (partial on (flag, key), " +
          "final on flag) is the q26-style single-distinct rewrite that " +
          "the exact_parts comparison column forces; no Expand anywhere.",
        Analytics.approxDistinctParts(spark, dir)),

      section("q18 bucketed exact percentiles (r10, oracle-green)",
        "What to look for: three pruned 2-column scans per value column " +
          "(stats, histogram, refine); every stats/targets/candidate join " +
          "is a BroadcastHashJoin of a model-sized side, and AQE converts " +
          "the two unhinted group-universe left joins to broadcast at " +
          "runtime — the one surviving SortMergeJoin is the group-count-" +
          "sized qty⋈price assembly. Window specs are partitioned by " +
          "group or (group, target) — per-group state is bounded by the " +
          "10k histogram bins, never a value buffer proportional to the " +
          "group.",
        Analytics.bucketedQuantityPercentiles(spark, dir)),

      section("q129 near-dup artifact build (r10 single-pipeline shape)",
        "What to look for: ONE gated shingle self-join lineage (the " +
          "survivor pipeline) — the raw-corpus label table is derived, so " +
          "no second shingle explode/self-join subtree appears; the final " +
          "output is a parquet scan of the written pairs plus the " +
          "presentation sort.",
        Dedup.neardupPairsBuild(spark, dir)),

      section("q132 duplicated-span coverage (r10 span-level dedup)",
        "What to look for: the span explode is a generator over the " +
          "pruned 2-column scan; the duplicated-span gate is ONE " +
          "two-level single-distinct aggregate over 8-byte hashes (no " +
          "Expand, no strings in the exchange); start flagging is a " +
          "LeftSemi equi-join; the coverage window partitions by doc_id " +
          "with the bounded (-4, currentrow) row frame — constant " +
          "per-key state.",
        SpanDedup.dupSpanStats(spark, dir)),

      section("q136 merged delta search (r10 append-without-retrain)",
        "What to look for: q109's gated-ADC shape with each index table " +
          "a Union of two column-pruned parquet scans (base + delta " +
          "segment); probe-cell gate and LUT joins BroadcastHashJoin; " +
          "the one unhinted join (cand⋈codes, the index-build primary-" +
          "key join) AQE-decided; ADC sum collapses map-side before the " +
          "per-probe top-k.",
        Similarity.ivfPqSearchMerged(spark, dir)),

      section("q137 cell-proportional diverse sample (r10)",
        "What to look for: ONE column-pruned scan of the persisted cells " +
          "table, no join anywhere; both window functions (count + " +
          "row_number) partition by cell — state bounded by the largest " +
          "quantizer cell, never the corpus.",
        Similarity.cellDiverseSample(spark, dir)),

      section("q138 split decontamination (r10 partial-overlap audit)",
        "What to look for: per-doc-DISTINCT span explode (narrow), the " +
          "train-span set ONE distinct aggregate over 8-byte hashes (no " +
          "Expand), containment a single equi-join on the hash, then " +
          "per-doc and per-split aggregation — the corpus never joins " +
          "itself and no strings shuffle.",
        SpanDedup.decontaminate(spark, dir)),

      section("q141 contamination provenance (r10 gated pair attribution)",
        "What to look for: the boilerplate cap is a LeftSemi against the " +
          "<=cap span set (bounding the pair join's fan-out); the " +
          "eval-train pair join is a plain equi-join on the 8-byte hash; " +
          "the per-doc argmax is a min_by HashAggregate — map-side " +
          "collapsible, never a window over the pair table.",
        SpanDedup.contaminationProvenance(spark, dir)),

      section("q142 funnel conversion (r10 CEP-lite sequence match)",
        "What to look for: one filtered scan + min-aggregate per stage; " +
          "each transition an equi-join of the stage's event slice " +
          "against the PER-USER table (AQE-decided); no " +
          "windowspecdefinition anywhere and no event-to-event self-join.",
        EventLog.funnelConversion(spark, dir)),
      section("q143 GroupTopK (r10 custom partial/final operator)",
        "What to look for: GroupTopKPartial below exactly one " +
          "ENSURE_REQUIREMENTS exchange and GroupTopKFinal above it — " +
          "the strategy-planned pair; NO Sort and NO Window/" +
          "WindowGroupLimit anywhere before the trailing output orderBy " +
          "(the window formulation would carry two partition sorts); " +
          "the scan reads only the 3 projected columns.",
        Analytics.groupTopkOrders(spark, dir)),
      section("q150 graft-proto connector round trip (r10 DSv2 source)",
        "What to look for: the scan is a BatchScan over the graft-proto " +
          "DSv2 source whose description carries the PRUNED readSchema " +
          "(only the aggregate's columns — pruning reached the byte " +
          "decoder); one partial+final aggregate above it; the write " +
          "side ran before this plan as a separate job.",
        Relational.protoRoundtrip(spark, dir)),
      section("q151 RAG retrieval (r10 search ⋈ text store)",
        "What to look for: the documents scan is column-pruned to " +
          "(doc_id, source, text) and joined via BroadcastHashJoin with " +
          "the BROADCAST on the hits side (query-batch × k rows) — the " +
          "corpus-sized text store is never shuffled; above the join " +
          "only the presentation sort of ≤ probes·k rows.",
        Similarity.ragRetrieve(spark, dir)),
      section("q153 indexed decontamination (r10 screen-only admission)",
        "What to look for: the ONLY scans are the documents table " +
          "(eval-side span explode) and the train_spans PARQUET ARTIFACT " +
          "— no second documents pass for the train side, which is the " +
          "structural claim behind the BuildProbe lifecycle rows: screen " +
          "cost is O(eval batch + stored hashes) at any train-corpus " +
          "size.",
        graft.operators.SpanDedup.decontaminateIndexed(spark, dir)),
      section("q144 SCD2 validity-window enrichment (r10)",
        "What to look for: the versioned dimension (nation × 2) arrives " +
          "via BroadcastHashJoin with the valid_from/valid_to range as " +
          "the join's non-equi condition — the fact table is never " +
          "shuffled for the dimension; one partial+final hash aggregate " +
          "after.",
        Relational.scd2Enrich(spark, dir)),
      section("q157 winnowed fingerprints (r10 sampled span index)",
        "What to look for: two Generate nodes (span explode, then the " +
          "bounded ×W window-membership explode) feeding ONE partial+" +
          "final hash aggregate on (doc_id, win) whose min(struct(span," +
          "−pos)) picks the rightmost window minimum — NO window " +
          "function, NO join, NO sort before the aggregate; the only " +
          "Sort is the trailing presentation orderBy.",
        graft.operators.SpanDedup.winnowedFingerprints(spark, dir)),
      section("q160 curation funnel (r10 capstone accounting)",
        "What to look for: four tiny aggregate rows unioned, each a " +
          "full-corpus aggregate over an InMemoryTableScan of the " +
          "previous stage (ScopedCache) — the quality pass, the " +
          "keep-first aggregate, and the DF-gated pair pipeline each " +
          "materialize ONCE; no stage rescans the raw documents after " +
          "stage 1, and the only joins are the gated-shingle equi-joins " +
          "inside the q72 core.",
        graft.operators.Curation.curationFunnel(spark, dir)),
      section("q161 DSIR importance weights (r10 data selection)",
        "What to look for: one narrow token-hash pass + Generate " +
          "(bigram-bucket explode) into a partial+final (doc_id, b) " +
          "count aggregate (ScopedCache'd, scanned by all three " +
          "consumers); the two bucket roll-ups are <=512-row " +
          "aggregates; the weight table returns via BroadcastHashJoin " +
          "(PINNED — B is a design constant, never corpus-sized); the " +
          "only BroadcastNestedLoopJoins are the 1-row scalar-total " +
          "crossJoins (q93 idiom); NO window function anywhere.",
        graft.operators.Curation.dsirLogWeights(spark, dir)),
      section("q162 DSIR resampled selection (r10)",
        "What to look for: the q161 dataflow ending in " +
          "TakeOrderedAndProject(limit=100) on (score DESC, doc_id) — " +
          "k rows per partition then k at the driver, never a global " +
          "Sort of the corpus.",
        graft.operators.Curation.dsirSelect(spark, dir)),
      section("q165 CDC chunk dedup accounting (r10 storage-side dedup)",
        "What to look for: graft_cdc_cuts runs inside the scan's " +
          "projection (native rolling-hash expression, whole-stage " +
          "codegen, no fallback marker); Generate explodes ~len/64 " +
          "chunk rows; both roll-ups are partial+final HashAggregates; " +
          "the only join is the #sources-row totals x uniques merge. " +
          "No window function, no corpus-sized join.",
        graft.operators.Dedup.cdcChunkDedup(spark, dir)),
      section("q171 ANN recall audit (r10 index acceptance)",
        "What to look for: the q107 persisted-index gated scan on the " +
          "approx side (artifact scans + broadcast LUT); the exact side " +
          "is the q80-shaped broadcast-probe brute scan over " +
          "sub-vectors; a left-semi hits join + two tiny aggregates. " +
          "The corpus is never self-joined outside the bounded probe " +
          "broadcasts.",
        graft.operators.Similarity.annRecall(spark, dir)),
      section("q170 source-interleaved order (r10 anti-clumping)",
        "What to look for: one Window PARTITIONED BY source (rank " +
          "within source — parallel across sources, state bounded by " +
          "the largest one), then the presentation sort. No joins, no " +
          "global window.",
        graft.operators.Curation.interleavedOrder(spark, dir)),
      section("q169 classifier lift audit (r10 model-vs-gate)",
        "What to look for: two narrow explode+agg passes (the q114 " +
          "classifier score, the q63 quality score) joined on doc_id; " +
          "the min/max bin edges return as a 1-row broadcast (q93 " +
          "idiom); one final 10-row aggregate. No window function.",
        graft.operators.Curation.classifierLift(spark, dir)),
      section("q168 span-corruption examples (r10 T5 denoising)",
        "What to look for: one Generate (posexplode) pass; the two " +
          "Window operators are PARTITIONED BY doc_id (span-start lag " +
          "+ span-number running sum — per-doc state, every document " +
          "an independent partition, no corpus-global window); one " +
          "final HashAggregate/ObjectHashAggregate assembles the " +
          "(input, target) strings via sorted collect_list. No joins " +
          "anywhere in the plan.",
        graft.operators.TextOps.spanCorruption(spark, dir)),
      section("q167 OOV-rate curve (r10 tokenizer design)",
        "What to look for: ONE corpus explode into a partial+final " +
          "type-count aggregate, collapsed again to the count-of-counts " +
          "table; the only window (cumulative sums) runs over that " +
          "table — one row per DISTINCT frequency, O(sqrt corpus) by " +
          "Zipf — never over the vocabulary or the corpus; the " +
          "straddling-class lookup is a 6-row broadcast nested loop " +
          "against the tiny cum table (bounded by design, the q93 " +
          "scalar idiom at 6 rows).",
        graft.operators.Profiling.oovRateCurve(spark, dir)),
      section("q166 snapshot delta-transfer accounting (r10 rsync/CAS)",
        "What to look for: two codegen'd chunker passes (old store / " +
          "new snapshot), the store reduced to DISTINCT sha, the " +
          "missing-chunk LeftAnti equi-join on sha, then #sources-row " +
          "roll-ups. No window, no cartesian, no corpus-sized " +
          "broadcast.",
        graft.operators.Dedup.snapshotDeltaBytes(spark, dir)),
      section("q164 payload block-signature near-dup (r10 multimodal)",
        "What to look for: one narrow pass computes the 16 block hashes " +
          "per payload (Generate x16, never corpus-squared); band " +
          "signatures are a keyed fold; the hot-band gate is a LeftAnti " +
          "join BEFORE the (band, bh) pair equi-join; verification " +
          "re-joins the cached 16-row block table on both pair sides. " +
          "No CartesianProduct, no window.",
        graft.operators.Multimodal.payloadBlockNeardup(spark, dir)),
      section("q163 per-doc rejection audit (r10 funnel provenance)",
        "What to look for: the funnel's cached stage tables " +
          "(InMemoryTableScans of quality/gated/sv) with ONE added " +
          "keeper join (gated x survivors) keyed on the 32-byte sha2 " +
          "content key since r11 — (doc_id, tkey) projections only, no " +
          "document body through the exchange — and two doc_id LEFT " +
          "equi-joins onto the label table; CASE projection, " +
          "presentation sort; no window function, no nested loop.",
        graft.operators.Curation.rejectionAudit(spark, dir)),
      section("q172 ANN exact re-rank (r11 two-stage search)",
        "What to look for: stage 1 is q107's persisted-index gated scan " +
          "widened to top-m (artifact scans + broadcast cell gate + " +
          "LUT); stage 2 fetches ONLY candidate sub-vectors via a " +
          "broadcast (query_id, vec_id) equi-join and runs the exact " +
          "zip_with kernel on that bounded set — the corpus is never " +
          "exact-scored wholesale (the executed-metrics bound is " +
          "asserted in PlanSpec).",
        graft.operators.Similarity.ivfPqRerank(spark, dir)),
      section("q173 steady-state funnel (r11 artifact admission)",
        "What to look for: NO shingle explode, no pair self-join, no " +
          "window anywhere — the near-dup front half is two parquet " +
          "scans of the q129 artifact; the plan is the quality pass + " +
          "a doc_id semi-join (survivors) + anti-join (purged) + three " +
          "4-row aggregates.",
        graft.operators.Curation.funnelFromArtifact(spark, dir)),
      section("q176 near-dup artifact delta append (r11 frozen-base admission)",
        "What to look for: the base index arrives as PARQUET SCANS " +
          "(bsv/hot/bsh/blabels — the persisted q176 base artifact, " +
          "five tables since r12 incl. the pair graph for q185; no " +
          "base shingling in-plan), and the delta side is batch-bounded " +
          "everywhere — keep-first aggregate, content-key anti/equi " +
          "joins vs base survivors, shingle explode gated by the base " +
          "hot list (left-anti), the cross shingle equi-join " +
          "(AQE-decided: broadcast when the batch is small), and the " +
          "delta-only component resolution. No cartesian, no window.",
        graft.operators.Dedup.neardupArtifactAppend(spark, dir)),
      section("q177 asymmetric containment pairs (r11 doc-inside-doc)",
        "What to look for: q72's exact geometry — one gated-shingle " +
          "computation reused for both self-join sides (InMemory cache, " +
          "exchange reuse), the sh-keyed equi-join bounded by the DF " +
          "gate, per-doc size table joined by doc_id; the only " +
          "difference from q72 is the projection after the bounded " +
          "intersection: both directional ratios come from ONE pass " +
          "(a 2-element explode, no Union re-executing the pipeline) — " +
          "no new shuffle shape, no cartesian, no window.",
        graft.operators.Dedup.containmentPairs(spark, dir)),
      section("q179 MinHash estimate-error audit (r11 LSH acceptance instrument)",
        "What to look for: the candidate set comes from q73's banded " +
          "bucket join (hot-bucket LeftAnti gate, never all-pairs); the " +
          "EXACT side is candidate-bounded — shingle rows enter only " +
          "through the pair equi-join and the (doc, base) equi-join, " +
          "no corpus shingle self-join anywhere; the signature tables " +
          "are the q73 ScopedCache entries (InMemory scans).",
        graft.operators.Dedup.minhashEstimateError(spark, dir)),
      section("q174 steady-state rejection audit (r11)",
        "What to look for: q173's artifact admission plus the keeper " +
          "lookup — survivor content keys come from ONE doc_id " +
          "equi-join back to the corpus (the artifact stores no text), " +
          "then the (doc_id, tkey)-projected join; no shingling, no " +
          "window, no nested loop.",
        graft.operators.Curation.rejectionAuditFromArtifact(spark, dir)),
      section("q180 compacted-index search (r11 segment compaction)",
        "What to look for: the q109 production search shape restored " +
          "after compaction — ONE column-pruned parquet scan per index " +
          "table (cells/codes/centroids/pq_codebook) instead of q136's " +
          "per-segment scan pair; probe cells and LUT broadcast; ADC " +
          "partial aggregate map-side; top-k per query bounded.",
        graft.operators.Similarity.ivfPqSearchCompacted(spark, dir)),
      section("q155 quality-aware canonical selection (r10)",
        "What to look for: the artifact-backed cluster table joins the " +
          "quality scores on doc_id (AQE-decided — no forced broadcast; " +
          "both sides can be corpus-sized); the rank-1 argmax is " +
          "GroupTopKPartial/Final (RewriteWindowTopK fired on the " +
          "row_number<=1-then-drop window) — bounded heaps, not a " +
          "per-cluster sort; the count-window computing cluster_size " +
          "rides the small artifact side.",
        graft.operators.Dedup.canonicalPerCluster(spark, dir)),
      section("q175 two-stage recall audit (r11 certified lift)",
        "What to look for: q172's rerank chain (ADC scan widened to " +
          "top-m, exact kernel ONLY over the candidate rows — broadcast " +
          "gates throughout) feeding the same recall-join tail as q171; " +
          "the corpus is never exact-scored wholesale.",
        graft.operators.Similarity.annRecallRerank(spark, dir)),
      section("q178 soft-dedup weights (r11 duplicate-aware sampling)",
        "What to look for: ONE parquet scan of the q129 artifact's " +
          "raw-label table, a doc_id-keyed left join against the " +
          "(doc_id, source)-projected corpus, a group-count aggregate " +
          "bounded by #groups, and the group-keyed join back — no text " +
          "in any exchange, no window, no shingling.",
        graft.operators.Dedup.softDedupWeights(spark, dir)),
      section("q181 winnowed decontamination screen (r11 sampled index)",
        "What to look for: the eval side pays its own winnow pass " +
          "(bounded ×W explode + min_by selection, map-side combined); " +
          "the train side is ONE column-pruned scan of the persisted " +
          "winnow index; the hit test is a fingerprint semi-join.",
        graft.operators.SpanDedup.winnowScreen(spark, dir)),
      section("q182 SemDeDup prune (r11 k-means-blocked semantic dedup)",
        "What to look for: the pair comparison is an equi-join on the " +
          "trained cluster id (no CartesianProduct, no Inner BNLJ — the " +
          "model broadcasts print as BNLJ Cross, the scalar/model " +
          "idiom); assignment keeps q100's broadcast + map-side " +
          "partial_min_by; the cosine kernel is the native codegen'd " +
          "expression inside the join filter.",
        graft.operators.Similarity.semdedupPrune(spark, dir)),
      section("q183 BM25 ranked retrieval (r11 sparse search)",
        "What to look for: the term filter applies INSIDE the explode " +
          "projection so only matching (doc, term) rows reach the " +
          "shuffle; per-term df and corpus stats broadcast; the top-20 " +
          "is TakeOrderedAndProject, never a global sort.",
        graft.operators.TextOps.bm25Rank(spark, dir)),
      section("q184 hybrid retrieval fusion (r12 RRF)",
        "What to look for: both certified input shapes survive intact " +
          "(the dense side's broadcast-gated ADC scan, the sparse " +
          "side's TakeOrdered top-20); the fusion is a union + ONE " +
          "map-side-partial hash aggregate over list-bounded rows (not " +
          "a full-outer sort-merge join), then a per-probe " +
          "WindowGroupLimit.",
        graft.operators.Similarity.hybridRrf(spark, dir)),
      section("q185 near-dup artifact compaction (r12 fold deltas)",
        "What to look for (this is the FOLD's pair derivation — the " +
          "registered query's own plan is just the compacted table read " +
          "back): every corpus-sized input is a column-pruned parquet " +
          "scan of the persisted base artifact (bsv/hot/bsh/bpairs); " +
          "the delta side is batch-bounded; untouched pairs pass " +
          "through as a scan + two anti-joins against the (tiny) " +
          "affected set; newly-hot detection and re-keying join against " +
          "delta-bounded sides; no cartesian, no nested loop.", {
          val baseArt = graft.operators.Dedup.ensureNeardupAppendBase(spark, dir)
          import org.apache.spark.sql.functions.{col, lit, pmod}
          graft.operators.Dedup.compactedParts(
            spark.read.parquet(s"$baseArt/bsv"),
            spark.read.parquet(s"$baseArt/hot"),
            spark.read.parquet(s"$baseArt/bsh"),
            spark.read.parquet(s"$baseArt/bpairs"),
            graft.sources.Tables.documents(spark, dir)
              .select(col("doc_id"), col("text"))
              .filter(pmod(col("doc_id"),
                lit(graft.operators.Dedup.NeardupDeltaMod)) === 0))._4
        }, maxLines = 400),
      section("q186 indexed BM25 (r12 posting artifact)",
        "What to look for: `PushedFilters: [In(tok, ...)]` on the " +
          "posting scan — the term predicate reaches the parquet " +
          "reader; df/stats broadcast; TakeOrdered tail; bit-equal to " +
          "q183 through the shared scoring tail.",
        graft.operators.TextOps.bm25IndexedRank(spark, dir)),
      section("q190 BM25 posting delta append (r13)",
        "What to look for: the base side keeps q186's " +
          "`PushedFilters: [In(tok, ...)]` posting scan through the " +
          "union; the delta side is a batch-bounded tokenize with the " +
          "term filter inside the explode; df merge and exact-stats " +
          "recombination are broadcast-sized; TakeOrdered tail.",
        graft.operators.TextOps.bm25AppendedRank(spark, dir)),
      section("q187 weighted-score hybrid fusion (r13)",
        "What to look for: q184's fusion shape with per-list min-max " +
          "windows added — the dense window partitions by query_id " +
          "(k rows per partition), the sparse min/max is a 2-double " +
          "aggregate broadcast back over the 20-row list; both " +
          "certified input shapes survive; no full-outer sort-merge, " +
          "no cartesian.",
        graft.operators.Similarity.hybridWeighted(spark, dir)),
      section("q188 domain-mixture sampling (r13)",
        "What to look for: ONE narrow (doc_id, source) corpus scan; the " +
          "per-source rate table (a 20-row aggregate) broadcasts back " +
          "as a BroadcastHashJoin; the Bernoulli draw is per-row " +
          "integer arithmetic inside whole-stage codegen — no window, " +
          "no shuffle join anywhere.",
        graft.operators.Curation.mixtureSample(spark, dir)),
      section("q191 shard manifest (r13)",
        "What to look for: q189's packing shape feeding TWO stacked " +
          "HashAggregates (the (shard, source) level then the shard " +
          "roll-up), both with partial/final map-side combine and NO " +
          "Expand — a COUNT(DISTINCT) beside the sums would double the " +
          "corpus-sized input before the shuffle.",
        graft.operators.Curation.shardManifest(spark, dir)),
      section("q189 token-budget shard packing (r13)",
        "What to look for: the corpus-side running sum is a Window " +
          "PARTITIONED by source (never a single-partition global " +
          "window over the doc table); the only unkeyed window runs " +
          "over the |sources|-row aggregate (above a HashAggregate), " +
          "whose offsets broadcast back; shard id is exact integer " +
          "`div` in the final project.",
        graft.operators.Curation.shardPack(spark, dir)),
      section("q192 leakage-safe split assignment (r14)",
        "What to look for: ONE corpus-sized doc_id equi-join against " +
          "the artifact's label table (AQE picks broadcast at fixture " +
          "scale; co-partitionable at 100 TB); the group-key draw and " +
          "split CASE are per-row integer arithmetic inside whole-stage " +
          "codegen — NO window anywhere.",
        graft.operators.Dedup.clusterSplitAssign(spark, dir)),
      section("q193 SQ8 scalar-quantized search (r14)",
        "What to look for: the (dim, code) scalar LUT joins the codes " +
          "scan as a BroadcastHashJoin (the corpus never shuffles for " +
          "the scan); per-(probe, vector) ADC sums collapse in a " +
          "partial HashAggregate map-side; the only window is the " +
          "per-probe rank — q106's shape on a scalar codebook.",
        graft.operators.Similarity.sq8Search(spark, dir)),
      section("q194 TF-IDF keywords from the posting artifact (r14)",
        "What to look for: a column-pruned (doc_id, tok, tf) posting " +
          "scan (no term predicate — keyword extraction reads ALL " +
          "terms); the vocab idf join left AQE-decided; GroupTopKPartial " +
          "heaps BEFORE the exchange so ≤3 rows per doc shuffle; the " +
          "rank window runs over ≤3-row groups.",
        graft.operators.TextOps.tfidfFromArtifact(spark, dir)),
      section("q195 PMI collocations (r14)",
        "What to look for: pair generation is slice/zip_with/flatten " +
          "inside the scan's project (codegen'd, windowless) feeding a " +
          "partial HashAggregate directly; unigram + pair-total " +
          "aggregates broadcast back; two vocab equi-joins; " +
          "TakeOrdered(100) tail.",
        graft.operators.TextOps.pmiCollocations(spark, dir)),
      section("q197 end-to-end training export (r14)",
        "What to look for: one corpus pass funneled through two doc_id " +
          "LEFT-SEMI joins (the mixture gate's broadcast rate join + " +
          "codegen draw, the split's label-artifact join + codegen " +
          "draw), then q189's pack — per-source windows with the one " +
          "unkeyed window over the |sources|-row aggregate; every stage " +
          "keeps its own certified shape.",
        graft.operators.Curation.trainingExport(spark, dir)),
      section("q196 SQ8 recall audit (r14)",
        "What to look for: q193's broadcast-LUT scan on one side, the " +
          "brute-force exact kernel (probe-broadcast block join + " +
          "decimal sums) on the other, joined per (query, neighbor) " +
          "with a left-semi + two tiny per-probe aggregates — the " +
          "q171 audit grammar.",
        graft.operators.Similarity.sq8Recall(spark, dir)),
      section("q198 hashed TF-IDF doc vectors (r14)",
        "What to look for: explode → two keyed HashAggregates (the q94 " +
          "TF-IDF front) with the 1-row n_docs scalar broadcast; the " +
          "bucket/sign arithmetic is per-row codegen; the (doc_id, dim) " +
          "sum and the norm aggregate are both map-side partial — NO " +
          "window, no self-join, output ≤ N×32 rows.",
        graft.operators.TextOps.hashedDocVectors(spark, dir)),
      section("q199 source semantic-similarity matrix (r14)",
        "What to look for: q198's featurizer feeding ONE (source, dim) " +
          "aggregate (model-sized: #sources×32 rows), then the dim-keyed " +
          "equi-self-join over that tiny table — the corpus never joins " +
          "itself; at fixture scale AQE broadcasts the centroid side.",
        graft.operators.TextOps.sourceSimilarity(spark, dir)),
      section("q200 normalization-aware exact dedup (r14)",
        "What to look for: the NFC+casefold kernel inside the scan's " +
          "project, every exchange keyed by the 32-byte sha2 of the " +
          "canonical form (never raw text — the q163 convention); two " +
          "stacked keyed aggregates, a key-level min join, a #source-row " +
          "roll-up; no window, no Expand, no COUNT(DISTINCT).",
        graft.operators.Profiling.normalizedDedup(spark, dir)),
      section("q201 dedup-method comparison card (r14)",
        "What to look for: three independent one-row aggregates — two " +
          "sha2-keyed corpus group-bys (exact bytes, canonical form) and " +
          "one label-keyed group-by over the ARTIFACT's doc_labels scan " +
          "(the near tier never re-derives the pair pipeline: no shingle " +
          "explode, no SMJ anywhere) — unioned into 3 rows.",
        graft.operators.Profiling.dedupMethodCard(spark, dir)),
      section("q202 LR training step (r14; the registered query returns the model)",
        "What to look for: a JOIN-FREE step — the model rides in as a " +
          "33-literal array folded per row (zip_with + ordered " +
          "aggregate, the q100 kernel discipline), the sigmoid residual " +
          "sits in the same projection, and the only exchange is the " +
          "33-row dim-keyed gradient aggregate after the posexplode.",
        graft.operators.Curation.lrStepProbe(spark, dir)),
      section("q203 classifier scoring from the model artifact (r14)",
        "What to look for: the q198 featurizer front (its certified idf/" +
          "norm joins) and then NOTHING but per-row arithmetic — the " +
          "trained model arrives as a 33-literal zip_with fold, no model " +
          "join, no label derivation, no window; scoring at 100 TB is a " +
          "pure map over the corpus.",
        graft.operators.Curation.lrQualityScore(spark, dir)),
      section("q204 held-out classifier eval (r14)",
        "What to look for: two split-filtered scans (train fits the idf " +
          "+ the model, val is featurized against the FROZEN train idf " +
          "— the batch-featurize inner join drops unseen tokens), the " +
          "val fold as a 33-literal zip_with, and a ONE-ROW confusion " +
          "aggregate; bucket-9 (test) rows are pruned at the scan by " +
          "the split predicate.",
        graft.operators.Curation.classifierEval(spark, dir)),
      section("q205 BPE pair recount (r15; one round's dataflow — the " +
          "registered query returns the collected merge table)",
        "What to look for: Generate (the adjacent-pair explode) feeding " +
          "a partial HashAggregate that collapses the pair stream " +
          "map-side to the pair vocabulary, one exchange, the final " +
          "aggregate — NO window, NO join; the merge APPLY step is a " +
          "pure per-row graft_bpe_merge call under a broadcast 1-row " +
          "literal (see the serving guard in PlanSpec).",
        graft.operators.TextOps.bpeStepProbe(spark, dir)),
      section("q206 classifier threshold sweep (r15)",
        "What to look for: q203's scorer front (featurizer joins + the " +
          "33-literal fold) joined once to the label kernel, collapsing " +
          "into a <=22-row decile histogram; the ten thresholds then " +
          "read cumulative sums via a broadcast non-equi join over " +
          "POST-AGGREGATE rows — the corpus is never inflated tenfold " +
          "and never re-scanned per threshold.",
        graft.operators.Curation.lrThresholdSweep(spark, dir)),
      section("q207 smoothed bigram surprisal (r15)",
        "What to look for: q103's certified shape with two EXTRA " +
          "aggregates over the already-collapsed pair table (the " +
          "continuation and left-context statistics — pair-vocabulary " +
          "sized, never corpus passes), the 1-row type total as the " +
          "broadcast-scalar idiom, then the per-doc keyed roll-up; no " +
          "window, no Expand.",
        graft.operators.TextOps.smoothedBigramSurprisal(spark, dir)),
      section("q213 classifier calibration card (r15)",
        "What to look for: q203's scorer front (featurizer joins + the " +
          "33-literal fold) joined once to the label kernel, then ONE " +
          "map-side-combined aggregate into <=10 decile bins — the " +
          "DECIMAL-exact mean-score sums ride the same aggregate; no " +
          "window, no second corpus pass.",
        graft.operators.Curation.lrCalibrationCard(spark, dir)),
      section("q211 CCNet perplexity buckets (r15)",
        "What to look for: q207's scoring aggregates feeding a grid-" +
          "keyed histogram (map-side combined), ONE window over that " +
          "bounded grid table (the q167 count-of-counts idiom — never " +
          "the corpus), the two cuts as a broadcast scalar, and a " +
          "per-row CASE over the scored table; no corpus sort, no " +
          "corpus window.",
        graft.operators.TextOps.perplexityBuckets(spark, dir)),
      section("q210 BPE serving encode from the merge artifact (r15)",
        "What to look for: ONE scan — the parquet read, six broadcast " +
          "1-row literal joins carrying the persisted merges, the " +
          "per-row graft_bpe_merge kernel and size() arithmetic in the " +
          "projections, then the presentation range sort; NO aggregate, " +
          "NO window, NO hash exchange anywhere.",
        graft.operators.TextOps.bpeEncodeStats(spark, dir)),
      section("q208 ANN method card (r15)",
        "What to look for: the three certified audit pipelines " +
          "(q171 ADC scan, q175 rerank chain, q196 SQ8 scan — cell-" +
          "gated scans and broadcast LUTs, the corpus never exact-" +
          "scored wholesale) each collapsing to a ONE-ROW aggregate " +
          "map-side, unioned into 3 rows.",
        graft.operators.Similarity.annMethodCard(spark, dir)),
      section("q218 BPE vocabulary-size depth sweep (r16)",
        "What to look for: the ScopedCache'd token table feeding one " +
          "shuffle-free merge-replay chain per depth (0/2/4/6 broadcast " +
          "literal joins), each collapsing into a vocabulary-sized " +
          "keyed aggregate then ONE row; the raw total rides back as a " +
          "broadcast 1-row literal for the fertility division; no " +
          "window, no Expand, no corpus join.",
        graft.operators.TextOps.bpeDepthSweep(spark, dir)),
      section("q217 LSH band-geometry method card (r16)",
        "What to look for: ONE signature pass (the ScopedCache shared " +
          "with q73/q179) feeding three bucket-joins — each banding " +
          "behind its own LeftAnti hot gate, never an ungated " +
          "all-pairs join; the exact-jaccard side joins only through " +
          "each geometry's candidate set (q179's candidate-bounded " +
          "shape), and every geometry collapses map-side into one row.",
        graft.operators.Dedup.lshGeometryCard(spark, dir)),
      section("q216 per-language tokenizer fertility card (r16)",
        "What to look for: q210's served encode unchanged (the six " +
          "broadcast merge literals, per-row graft_bpe_merge kernel, no " +
          "hash exchange in the scan) feeding ONE map-side-combined " +
          "lang-keyed rollup, with the 1-row symbol total riding back " +
          "via the broadcast-one-row idiom; no window, no corpus join.",
        graft.operators.TextOps.bpeFertilityCard(spark, dir)),
      section("q219 artifact-served recalibrated scores (r16)",
        "What to look for: q203's serving shape extended one literal " +
          "deeper — the featurizer front, the 33-literal zip_with fold, " +
          "then the frozen (a, b) linear map + sigmoid in the same " +
          "projection; NO label pass, NO iterative aggregates (the fit " +
          "happened at artifact build), no window.",
        graft.operators.Curation.plattScoresServed(spark, dir)),
      section("q215 Platt-scaling recalibration card (r16)",
        "What to look for: the fitted (a, b) riding in as literals over " +
          "the ScopedCache'd 2-column (z, y) margin table (the 12 GD " +
          "steps each collapsed to a 1-row aggregate BEFORE this plan " +
          "— driver-held 2-double model, the q202 contract); the card " +
          "itself is one map-side-combined <=10-bin aggregate over the " +
          "cache; no window, no Expand, no corpus re-featurize.",
        graft.operators.Curation.plattRecalibration(spark, dir)),
      section("q220 per-source paragraph-dedup profile (r16)",
        "What to look for: q214's chain verbatim (sha2-keyed keeper, " +
          "per-doc rebuild) feeding ONE doc_id equi-join to the " +
          "(doc_id, source) projection and a #source-row rollup; no " +
          "window, no Expand, no raw-text exchange.",
        graft.operators.Profiling.paragraphDedupBySource(spark, dir)),
      section("q214 paragraph-level exact dedup, CCNet stage 1 (r16)",
        "What to look for: the paragraph posexplode with the q122 " +
          "canonical kernel + sha2 in the same projection; every " +
          "exchange keyed by the 32-byte hash or doc_id (never " +
          "paragraph text — the q163/q200 convention); the keeper as a " +
          "map-side-combined groupBy-min of a (doc_id,pos) struct (no " +
          "window, no Expand), the join-back on the hash key, and the " +
          "q133 per-document collect_list rebuild.",
        graft.operators.Profiling.paragraphDedup(spark, dir)),
      section("q221 CCNet end-to-end corpus emitter (r17)",
        "What to look for: q214's sha2-keyed dedup chain feeding the " +
          "ScopedCache'd stage-1+2 table (paragraph card + narrow " +
          "langid regex map — no exchange of its own), q211's chain " +
          "over the survivors (grid histogram window over the bounded " +
          "milli-nat grid, cuts via the broadcast-one-row idiom), and " +
          "ONE doc_id-keyed left join of the bucket column back onto " +
          "the stage table; no corpus window, no raw-text exchange.",
        graft.operators.Profiling.ccnetCorpus(spark, dir)),
      section("q225 CCNet per-source funnel (r17)",
        "What to look for: the q221 stage chain verbatim (ScopedCache " +
          "reuse when both run in one session) collapsing into a " +
          "#source-row conditional-sum rollup; no Expand, no window " +
          "beyond q211's bounded grid.",
        graft.operators.Profiling.ccnetFunnel(spark, dir)),
      section("q224 calibration-method card (r17)",
        "What to look for: q215's shape (cached 2-column (z, y) margin " +
          "table, fitted (a, b) as literals) feeding THREE card " +
          "branches; the isotonic minimax runs entirely above the " +
          "<=11-bin aggregates (tiny non-equi joins of aggregated " +
          "cards, never the corpus); no window, no Expand.",
        graft.operators.Curation.calibrationMethodCard(spark, dir)),
      section("q222 seeded deterministic epoch shuffle (r17)",
        "What to look for: q68's pack chain + the per-source dense rank " +
          "(partitioned windows), the #sources offset cumulative above " +
          "its aggregate, the 2-row epoch table via broadcast, then the " +
          "whole walk as ONE native codegen expression " +
          "(graft_feistel_walk — a per-row Java loop, O(1) plan size, " +
          "no exchange of its own) into the presentation sort.",
        graft.operators.Curation.epochShuffle(spark, dir)),
      section("q227 CCNet training-ready chunk stream (r17)",
        "What to look for: the q221 stage chain (sha2/doc_id exchanges, " +
          "bounded-grid windows), the q68 per-source pack window over " +
          "clean_text, the #sources offsets + dense rank, and the " +
          "graft_feistel_walk kernel in one projection — the whole " +
          "corpus-to-batch-order loop with no corpus window and no " +
          "cartesian anywhere.",
        graft.operators.Profiling.ccnetTrainingChunks(spark, dir)),
      section("q226 DoReMi-weighted corpus resampler (r17)",
        "What to look for: q223's driver-held fit feeding the #sources " +
          "PPM rate table as ONE broadcast (null-safe) join onto the " +
          "narrow (doc_id, source) scan, the multiplicative-hash draw " +
          "as a codegen'd integer filter (q188's gate kernel, shared), " +
          "no window, no SMJ.",
        graft.operators.Curation.doremiSample(spark, dir)),
      section("q223 DoReMi-style domain reweighting (r17)",
        "What to look for: q103's surprisal chain collapsing into the " +
          "#sources-row loss aggregate; the multiplicative-weight " +
          "iteration is DRIVER-held (no iterative aggregates in-plan); " +
          "the final weights ride back as one broadcast hash join; no " +
          "window, no cartesian.",
        graft.operators.Curation.doremiWeights(spark, dir)),
      section("q228 mixture method card (r17)",
        "What to look for: the #langs census aggregate, the three " +
          "threshold tables unioned into ONE broadcast (null-safe) " +
          "join under the single corpus scan, the bounded " +
          "(scheme, lang) aggregate, and the pinned-broadcast card " +
          "assembly — no corpus window, no SMJ, no cartesian beyond " +
          "the broadcast-scalar min-count idiom.",
        graft.operators.TextOps.mixtureMethodCard(spark, dir)),
      section("q229 decontamination-screen method card (r17)",
        "What to look for: q138's full-index audit (distinct train " +
          "spans, equi-join hit test, left-outer roll-up) and q181's " +
          "winnow screen (min-struct selection, no window) side by " +
          "side off the shared span cache; index sizes ride back as " +
          "broadcast 1-row scalars; the 4-row card assembly is " +
          "broadcast-only. No window, no Expand, no cartesian.",
        graft.operators.SpanDedup.decontamMethodCard(spark, dir)))

    val header =
      "# PLANS — executed physical plans of representative queries\n\n" +
        s"Generated by `graft.tools.Plans` against `$dir` (plans are the " +
        "AQE-finalized executed plans; regenerate after optimizer-relevant " +
        "changes).\n\n"
    Files.writeString(Paths.get("PLANS.md"), header + sections.mkString("\n"))
    println(s"[plans] wrote PLANS.md (${sections.size} sections)")
    spark.stop()
  }
}
