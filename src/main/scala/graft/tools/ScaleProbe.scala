package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Exact._
import graft.sources.Tables

/** Dev probe: replays the flagship query shapes on N unioned copies of
  * sf0.1 (≈ N×600k lineitem rows) to observe scaling behavior of the
  * plans — linearity here is the local evidence that the partitioning /
  * broadcast choices hold as data grows. Not part of the library surface.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    // optional args 2+: probe-name prefixes for targeted runs
    // (`runMain graft.tools.ScaleProbe /root/testdata/sf0.1 10 q122 q126`);
    // none = the full sweep
    val only = args.drop(2).toSeq
    val spark = graft.GraftSession.get("graft-scale-probe")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def enlarged(df: DataFrame): DataFrame =
      (1 to copies).map(i => df.withColumn("copy", lit(i))).reduce(_ unionByName _)

    /** N copies with a per-copy key shift so distinct-key cardinality
      * scales with the data (a realistic larger dataset). */
    def replicateShifted(df: DataFrame, keyCol: String, stride: Long): DataFrame =
      (1 to copies).map(i =>
        df.withColumn(keyCol, col(keyCol) + lit(i.toLong * stride)))
        .reduce(_ unionByName _)

    def time(name: String)(f: => Long): Unit =
      if (only.isEmpty || only.exists(name.startsWith)) {
        val t0 = System.nanoTime()
        val n = f
        println(f"[scale] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }

    val li1 = Tables.lineitem(spark, dir)
    val liN = enlarged(li1)

    // q01 shape: wide decimal hash aggregate
    def q01(li: DataFrame): Long =
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(exactSum(money(col("l_quantity"))).as("sum_qty"),
             exactSum(money(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("rev"),
             count(lit(1)).as("n"))
        .count()

    // q02 shape: fact⋈fact shuffle join + broadcast dims. BOTH fact
    // sides scale (join keys shifted per copy so distinct-key cardinality
    // grows with the data, like a real larger dataset).
    def q02(li: DataFrame, o: DataFrame): Long = {
      val c = Tables.customer(spark, dir)
      val n = Tables.nation(spark, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(exactSum(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .count()
    }
    val o1 = Tables.orders(spark, dir)
    val liNShifted = replicateShifted(li1, "l_orderkey", 1000000000L)
    val oNShifted = replicateShifted(o1, "o_orderkey", 1000000000L)

    time("q01 agg 1x (600k)")(q01(li1))
    time("q01 agg 1x warm")(q01(li1))
    time(s"q01 agg ${copies}x (${copies * 600}k)")(q01(liN))
    time("q02 join 1x")(q02(li1, o1))
    time("q02 join 1x warm")(q02(li1, o1))
    time(s"q02 join ${copies}x both sides")(q02(liNShifted, oNShifted))

    // dedup shape at scale: shingle + minhash signature over enlarged
    // docs. Texts must differ per copy (a marker token replaces spaces)
    // or every doc gains `copies` identical twins and LSH pair count
    // grows quadratically by construction — the probe would measure a
    // synthetic duplicate explosion, not plan scaling.
    val d1 = Tables.documents(spark, dir)
    val dN = (1 to copies).map(i =>
      d1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text", regexp_replace(col("text"), " ", s" c$i ")))
      .reduce(_ unionByName _)
    def minhashCount(docs: DataFrame): Long =
      graft.operators.Dedup.minhashLshPairsOf(docs).count()
    time("minhash 1x (5k docs)")(minhashCount(d1))
    time(s"minhash ${copies}x (${copies * 5}k docs)")(minhashCount(dN))

    // q76 shape: the realistic scaling is a GROWING train corpus with a
    // CONSTANT contamination signal. Copy 1 keeps the original texts (the
    // overlap pairs of the 1x run survive); copies 2..N get the marker
    // rewrite, which destroys cross-doc trigram overlap (measured: the
    // all-marker dN yields 0 pairs) — i.e. they are pure added noise the
    // candidate join must wade through, exactly like fresh crawl data.
    val dCN = (1 to copies).map { i =>
      if (i == 1) d1
      else d1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text", regexp_replace(col("text"), " ", s" c$i "))
    }.reduce(_ unionByName _)
    def contaminationCount(docs: DataFrame): Long =
      graft.operators.Dedup.contaminationOf(docs).count()
    time("q76 contamination 1x (5k docs)")(contaminationCount(d1))
    time(s"q76 contamination ${copies}x corpus")(contaminationCount(dCN))

    // q52 shape: binned range join. Copies shift timestamps by a
    // year-scale stride so a 10x dataset models LONGER HISTORY at the
    // same order density (copies never share a day bin) — pair density
    // per row is constant and the plan must scale linearly. Shifting
    // density instead (same range, 10x rows/day) grows the OUTPUT
    // quadratically by definition, which would measure the data, not the
    // plan.
    val oRaw = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val oN52 = (1 to copies).map(i =>
      oRaw.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 1000000000L))
        .withColumn("o_orderdate",
          col("o_orderdate") + expr(s"INTERVAL ${(i - 1) * 4000} DAYS")))
      .reduce(_ unionByName _)
    def rangeJoinCount(o: DataFrame): Long =
      graft.operators.EventLog.rangeJoinNearbyOrdersOf(o).count()
    time("q52 range join 1x")(rangeJoinCount(oRaw))
    time(s"q52 range join ${copies}x")(rangeJoinCount(oN52))

    // q75/q84 shapes over enlarged embeddings. Each copy ROTATES the
    // vector dims (cosine of a random vector with its rotation is
    // ~N(0, 1/64) — far below the 0.4 near-dup threshold), so copies
    // don't create synthetic near-duplicates or skew one sign bucket;
    // copy 1 is the identity so the q84 probe set (vec_id < 20) exists.
    val e1 = Tables.embeddings(spark, dir)
    // only 63 distinct non-identity rotations exist: copy 65 would repeat
    // copy 2's rotation and reintroduce the synthetic cosine-1.0 twins
    // this construction exists to avoid
    require(copies <= 64, s"embedding probe supports <= 64 copies, got $copies")
    val eN = (1 to copies).map { i =>
      val r = (i - 1) % 63 + 1 // rotation in [1, 63]; copy 1 handled below
      if (i == 1) e1
      else e1
        .withColumn("vec_id", col("vec_id") + lit((i - 1).toLong * 10000000L))
        .withColumn("embedding",
          expr(s"concat(slice(embedding, ${r + 1}, ${64 - r}), slice(embedding, 1, $r))"))
    }.reduce(_ unionByName _)
    def nearDupCount(e: DataFrame): Long =
      graft.operators.Dedup.embeddingNearDupPairsOf(e).count()
    def ivfCount(e: DataFrame): Long =
      graft.operators.Similarity.annIvfOf(e).count()
    time("q75 embed near-dup 1x (5k)")(nearDupCount(e1))
    time(s"q75 embed near-dup ${copies}x")(nearDupCount(eN))
    time("q84 IVF ANN 1x (5k)")(ivfCount(e1))
    time(s"q84 IVF ANN ${copies}x")(ivfCount(eN))

    // q77 shape: connected components over duplicate CHAINS — the worst
    // case for label propagation (plain min-propagation needs n-1 rounds
    // on a chain of n). The pointer-jumping implementation must stay
    // O(log n): 64x more chain links may add only a handful of rounds.
    for (n <- Seq(64L, 1024L, 4096L)) {
      val pairs = spark.range(1, n)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val t0 = System.nanoTime()
      // smallCutoff = 0: probe the distributed propagation itself
      val (labels, iters) = graft.operators.Dedup.clusterLabels(pairs, smallCutoff = 0)
      val resolved = labels.filter(col("label") === 1).count()
      require(resolved == n, s"chain of $n resolved $resolved to min label")
      println(f"[scale] q77 chain n=$n%-5d iters=$iters ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // q68 vs q69 shape: ONE giant source. q68's per-source ROWS window
    // serializes every row through a single task; q69's (source, shard)
    // window runs `PackShards` independent running sums — the sharded
    // row should beat the unsharded one by roughly the task parallelism.
    val giant = spark.range(2000000L)
      .select(col("id").as("doc_id"), lit("one_source").as("source"),
        (pmod(col("id"), lit(100L)) + 1).as("n_tokens"))
    def packed(df: DataFrame): Long =
      graft.operators.TextOps.packSequencesOf(df, 2048L).count()
    def packedSharded(df: DataFrame): Long =
      graft.operators.TextOps.packSequencesShardedOf(df, 2048L, 16).count()
    time("q68 pack 2M docs 1 source")(packed(giant))
    time("q69 sharded pack 2M docs")(packedSharded(giant))

    // round-6 text shapes over dN (marker-rewritten copies: texts differ
    // per copy, so token/bigram/vocab cardinality grows with the data
    // like a real larger crawl, instead of every stat collapsing onto
    // `copies` identical twins). q86 shuffles distinct (doc, token/bigram)
    // rows; q88 adds the DF anti-join gate + order-preserving rebuild;
    // q93 adds the vocab-sized probability broadcast.
    def repCount(docs: DataFrame): Long =
      graft.operators.TextOps.repetitionSignalsOf(docs).count()
    def stripCount(docs: DataFrame): Long =
      graft.operators.TextOps.stripBoilerplateOf(docs).count()
    def surprisalCount(docs: DataFrame): Long =
      graft.operators.TextOps.lmSurprisalOf(docs).count()
    time("q86 repetition 1x (5k docs)")(repCount(d1))
    time(s"q86 repetition ${copies}x")(repCount(dN))
    time("q88 boilerplate 1x (5k docs)")(stripCount(d1))
    time(s"q88 boilerplate ${copies}x")(stripCount(dN))
    time("q93 surprisal 1x (5k docs)")(surprisalCount(d1))
    time(s"q93 surprisal ${copies}x")(surprisalCount(dN))

    // q96 shape over the rotated embeddings (eN): pair join + clustering
    // + accounting — rotations add no synthetic duplicates, so the
    // cluster graph stays fixture-sized while the candidate join and the
    // accounting left-join scale with the corpus.
    def semCount(e: DataFrame): Long =
      graft.operators.Dedup.semanticDedupOf(e).count()
    time("q96 semantic dedup 1x (5k)")(semCount(e1))
    time(s"q96 semantic dedup ${copies}x")(semCount(eN))

    // round-6b shapes: q97 is a pure narrow map + explode and should
    // track the scan; q98's threshold table stays #languages-sized while
    // the corpus passes once through a broadcast join + filter; q99
    // composes the exact-hash semi-join with the gated-shingle join
    // (q76's shape, flipped to a verdict); q100 runs `iters` broadcast +
    // min_by-collapse passes whose model stays k×64 no matter the corpus.
    def chunkCount(docs: DataFrame): Long =
      graft.operators.TextOps.chunkDocumentsOf(docs).count()
    def mixCount(docs: DataFrame): Long =
      graft.operators.TextOps.mixToUniformOf(docs).count()
    def incCount(docs: DataFrame): Long =
      graft.operators.Dedup.incrementalDedupOf(docs).count()
    def kmeansCount(e: DataFrame): Long =
      graft.operators.Similarity.kmeansTrainOf(e).count()
    time("q97 chunking 1x (5k docs)")(chunkCount(d1))
    time(s"q97 chunking ${copies}x")(chunkCount(dN))
    time("q98 mixture 1x (5k docs)")(mixCount(d1))
    time(s"q98 mixture ${copies}x")(mixCount(dN))
    time("q99 incr dedup 1x (5k docs)")(incCount(d1))
    time(s"q99 incr dedup ${copies}x")(incCount(dN))
    time("q100 kmeans 1x (5k)")(kmeansCount(e1))
    time(s"q100 kmeans ${copies}x")(kmeansCount(eN))
    def pqCount(e: DataFrame): Long =
      graft.operators.Similarity.pqTrainOf(e).count()
    time("q101 pq train 1x (5k)")(pqCount(e1))
    time(s"q101 pq train ${copies}x")(pqCount(eN))
    // q103 shape: the bigram-vocabulary probability table grows with the
    // marker-rewritten copies (unlike q93's unigram vocab it is pair-
    // cardinality), so this row watches the conditional-prob join scale
    def bigramCount(docs: DataFrame): Long =
      graft.operators.TextOps.bigramSurprisalOf(docs).count()
    time("q103 bigram srp 1x (5k docs)")(bigramCount(d1))
    time(s"q103 bigram srp ${copies}x")(bigramCount(dN))
    // q110 timing vs q103 on the same enlarged corpus: the floor prunes
    // both sides of the probability join, so the 10x row should come in
    // well under q103's (the r6 verdict's steepest honest row)
    def flooredCount(docs: DataFrame): Long =
      graft.operators.TextOps.bigramSurprisalFlooredOf(docs).count()
    time("q110 floored srp 1x (5k docs)")(flooredCount(d1))
    time(s"q110 floored srp ${copies}x")(flooredCount(dN))
    // the floor's BOUND needs a corpus with a genuine Zipf tail — the
    // fixture's synthetic texts have no hapax pairs (vocab at cnt>=1 ==
    // cnt>=2), so neither d1 nor the marker-rewritten dN can show it.
    // Constructed corpus: each doc carries head pairs shared corpus-wide
    // plus two pairs unique to the doc, so the unfloored pair vocabulary
    // grows LINEARLY in docs while the attested->=2 head stays ~fixed —
    // exactly the join-side blowup the floor exists to cap.
    def zipfDocs(n: Long): DataFrame =
      spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ",
          concat(lit("h"), pmod(col("id"), lit(40L))),
          concat(lit("h"), pmod(col("id") + 1, lit(40L))),
          concat(lit("h"), pmod(col("id"), lit(7L))),
          concat(lit("u"), col("id")),
          concat(lit("v"), col("id"))).as("text"))
    def pairVocab(docs: DataFrame, m: Long): Long =
      graft.operators.TextOps.pairVocabularySize(docs, m)
    for (n <- Seq(50000L, 500000L); m <- Seq(1L, 2L))
      println(s"[scale]   zipf-tail pair vocab docs=$n (cnt>=$m) = ${pairVocab(zipfDocs(n), m)}")

    // q106/q107 shapes: the probe set and both models are fixed-size, so
    // the corpus-side codes table is the only thing that grows — the ADC
    // scan (q106) and the cell-gated scan + index-build join (q107)
    // should track the training passes, not explode with candidates
    def adcCount(e: DataFrame): Long =
      graft.operators.Similarity.pqSearchOf(e).count()
    def ivfPqCount(e: DataFrame): Long =
      graft.operators.Similarity.ivfPqSearchOf(e).count()
    time("q106 ADC search 1x (5k)")(adcCount(e1))
    time(s"q106 ADC search ${copies}x")(adcCount(eN))
    time("q107 IVF-PQ search 1x (5k)")(ivfPqCount(e1))
    time(s"q107 IVF-PQ search ${copies}x")(ivfPqCount(eN))

    // round-7 curation shapes over dN/eN: q113's windows partition by
    // doc (state bounded by the longest doc); q114 is explode + one
    // map-side-collapsed aggregate; q116 replaces the per-lang window
    // with the value-count join, so NO task ever holds a whole language;
    // q117's only global structure is the top-1000 TakeOrdered over the
    // (growing) vocabulary; q118's sketch state stays ≤200 counters per
    // partial buffer no matter the corpus. All five should track the
    // scan near-linearly.
    def collapseCount(docs: DataFrame): Long =
      graft.operators.Curation.collapseRepeatsOf(docs).count()
    def classifierCount(docs: DataFrame): Long =
      graft.operators.Curation.qualityClassifierOf(docs).count()
    def gateCount(docs: DataFrame): Long =
      graft.operators.Curation.qualityFilterPerLangOf(docs).count()
    def zipfCount(docs: DataFrame): Long =
      graft.operators.Curation.zipfStatsOf(docs).count()
    def hhCount(docs: DataFrame): Long =
      graft.operators.Curation.heavyHittersOf(docs).count()
    def rpCount(e: DataFrame): Long =
      graft.operators.Curation.randomProjectionOf(e).count()
    time("q113 collapse 1x (5k docs)")(collapseCount(d1))
    time(s"q113 collapse ${copies}x")(collapseCount(dN))
    time("q114 classifier 1x (5k docs)")(classifierCount(d1))
    time(s"q114 classifier ${copies}x")(classifierCount(dN))
    time("q115 projection 1x (5k)")(rpCount(e1))
    time(s"q115 projection ${copies}x")(rpCount(eN))
    time("q116 quantile gate 1x (5k docs)")(gateCount(d1))
    time(s"q116 quantile gate ${copies}x")(gateCount(dN))
    time("q117 zipf 1x (5k docs)")(zipfCount(d1))
    time(s"q117 zipf ${copies}x")(zipfCount(dN))
    time("q118 heavy hitters 1x (5k docs)")(hhCount(d1))
    time(s"q118 heavy hitters ${copies}x")(hhCount(dN))

    // q119's global rank must scale like a sort (range shuffle + local
    // windows), NOT like a single-task corpus window; q120 is a
    // #sources-row plan over a narrow scan; q121 adds the vocab join.
    def curriculumCount(docs: DataFrame): Long =
      graft.operators.Curation.curriculumOrderOf(docs).count()
    def epochCount(docs: DataFrame): Long =
      graft.operators.Curation.epochPlanOf(docs).count()
    def klCount(docs: DataFrame): Long =
      graft.operators.Curation.sourceDriftKlOf(docs).count()
    time("q119 curriculum 1x (5k docs)")(curriculumCount(d1))
    time(s"q119 curriculum ${copies}x")(curriculumCount(dN))
    time("q120 epoch plan 1x (5k docs)")(epochCount(d1))
    time(s"q120 epoch plan ${copies}x")(epochCount(dN))
    time("q121 drift KL 1x (5k docs)")(klCount(d1))
    time(s"q121 drift KL ${copies}x")(klCount(dN))

    // round-7 profiling shapes over dN: q122 is the narrow NFC map; q123
    // collapses to a #sources-row card; q124's cumulative-distinct trick
    // must scale like ONE token agg (min-bucket per type), not 10
    // distinct-counts; q125 aggregates per distinct text; q126's rank
    // windows partition by source (the shifted copies keep ~5 sources, so
    // each source grows N× — the honest worst case for the per-source
    // sort). All should track the scan near-linearly.
    def nfcCount(docs: DataFrame): Long =
      graft.operators.Profiling.normalizeTextOf(docs).count()
    def cardCount(docs: DataFrame): Long =
      graft.operators.Profiling.sourceDatacardOf(docs).count()
    def growthCount(docs: DataFrame): Long =
      graft.operators.Profiling.vocabGrowthOf(docs).count()
    def leakCount(docs: DataFrame): Long =
      graft.operators.Profiling.splitLeakageOf(docs).count()
    def fixedCount(docs: DataFrame): Long =
      graft.operators.Profiling.fixedSampleOf(docs).count()
    time("q122 nfc normalize 1x (5k docs)")(nfcCount(d1))
    time(s"q122 nfc normalize ${copies}x")(nfcCount(dN))
    time("q123 data card 1x (5k docs)")(cardCount(d1))
    time(s"q123 data card ${copies}x")(cardCount(dN))
    time("q124 vocab growth 1x (5k docs)")(growthCount(d1))
    time(s"q124 vocab growth ${copies}x")(growthCount(dN))
    time("q125 leakage audit 1x (5k docs)")(leakCount(d1))
    time(s"q125 leakage audit ${copies}x")(leakCount(dN))
    time("q126 fixed sample 1x (5k docs)")(fixedCount(d1))
    time(s"q126 fixed sample ${copies}x")(fixedCount(dN))

    // r7d shapes: q127 re-aggregates the packer's chunk table (scales
    // like q68's per-source windows); q128 is a codegen'd narrow map
    // whose per-row cost is the deflate itself
    def packEffCount(docs: DataFrame): Long =
      graft.operators.Profiling.packEfficiencyOf(
        graft.operators.TextOps.packSequencesOf(
          docs.select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens")),
          budget = graft.operators.TextOps.PackBudget)).count()
    def deflateCount(docs: DataFrame): Long =
      graft.operators.Profiling.compressionSignalOf(docs).count()
    time("q127 pack efficiency 1x (5k docs)")(packEffCount(d1))
    time(s"q127 pack efficiency ${copies}x")(packEffCount(dN))
    time("q128 deflate signal 1x (5k docs)")(deflateCount(d1))
    time(s"q128 deflate signal ${copies}x")(deflateCount(dN))

    // r10 span-dedup shape: positional span hashes → single-distinct
    // gate → semi-join flags → bounded doc-window. dN's marker rewrite
    // keeps each copy's INTERNAL dup-span structure (the rewrite is
    // uniform within a copy) while the copies stay mutually disjoint —
    // N× docs with N× dup structure, the honest scaling direction.
    def spanCount(docs: DataFrame): Long =
      graft.operators.SpanDedup.dupSpanStatsOf(docs).count()
    time("q132 span dedup 1x (5k docs)")(spanCount(d1))
    time(s"q132 span dedup ${copies}x")(spanCount(dN))

    // r10 decontamination family: the train-span set and the containment
    // join both grow with the corpus; the q141 provenance pair join is
    // the row to watch — its fan-out must stay bounded by the span-DF
    // gate even as replicated spans approach the cap
    def decontamCount(docs: DataFrame): Long =
      graft.operators.SpanDedup.decontaminateOf(docs).count()
    def provCount(docs: DataFrame): Long =
      graft.operators.SpanDedup.contaminationProvenanceOf(docs).count()
    time("q138 decontam 1x (5k docs)")(decontamCount(d1))
    time(s"q138 decontam ${copies}x")(decontamCount(dN))
    time("q141 provenance 1x (5k docs)")(provCount(d1))
    time(s"q141 provenance ${copies}x")(provCount(dN))

    // r10 funnel shape: per-stage aggregate + per-user equi transitions
    // — must scale like three filtered scans, not like a per-user window
    def funnelUsers(ev: DataFrame): Long = {
      val r = graft.operators.EventLog.funnelConversionOf(ev).collect()
      r.map(_.getLong(1)).sum
    }
    val ev1 = spark.read.parquet(s"$dir/events.parquet")
    val evN =
      if (copies == 1) ev1
      else (1 to copies).map(i =>
        ev1.withColumn("user_id", col("user_id") + lit(i * 1000000L))
          .withColumn("event_id", col("event_id") + lit(i * 100000000L))
      ).reduce(_ unionByName _)
    time("q142 funnel 1x (10k events)")(funnelUsers(ev1))
    time(s"q142 funnel ${copies}x users+events")(funnelUsers(evN))

    // r10 cohort-retention shape: user cardinality AND rows scale (the
    // evN shift); min-per-user + equi-join back + per-(cohort,offset)
    // distinct — must grow like two keyed aggregates, no window
    def cohortCount(ev: DataFrame): Long =
      graft.operators.EventLog.cohortRetentionOf(ev).count()
    time("q146 cohort 1x (10k events)")(cohortCount(ev1))
    time(s"q146 cohort ${copies}x users+events")(cohortCount(evN))

    // r10 token-budget cap: N× docs per source means the budget binds
    // harder (output flat per source) while the per-source sort grows —
    // the probe watches the window's growth, the output stays ~capped
    def capCount(docs: DataFrame): Long =
      graft.operators.Profiling.tokenBudgetCapOf(docs).count()
    time("q148 token cap 1x (5k docs)")(capCount(d1))
    time(s"q148 token cap ${copies}x")(capCount(dN))

    // r10 GroupTopK shape vs the window formulation: both rows AND
    // distinct keys scale (shifted custkeys). Shuffle volume is equal
    // (Spark's WindowGroupLimit already map-side-limits the window
    // form); the contested cost is the two partition SORTS the window
    // path runs around its exchange vs GroupTopK's sort-free bounded
    // heaps — at probe scale the sorts are cheap, so expect parity-ish
    // wall clock and look at the shuffle-bytes rows for the structural
    // story.
    def gtk(o: DataFrame): Long =
      graft.plans.GroupTopK.topKPerKey(
        o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"),
        Seq(graft.plans.GroupTopK.Key("o_totalprice", desc = true),
          graft.plans.GroupTopK.Key("o_orderkey")), 5).count()
    def wtk(o: DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count()
    }
    val oCustShifted = replicateShifted(o1, "o_custkey", 1000000000L)
    time("q143 group-topk 1x")(gtk(o1))
    time(s"q143 group-topk ${copies}x")(gtk(oCustShifted))
    time("q143 window-topk 1x")(wtk(o1))
    time(s"q143 window-topk ${copies}x")(wtk(oCustShifted))

    // low-cardinality keys: 5 distinct o_orderpriority values, so both
    // map-side limiters (GroupTopK's heaps, WindowGroupLimit's
    // sort+limit) collapse each input partition to ≤ 5·k rows and the
    // exchange all but disappears; the cost difference is each input
    // partition fully SORTED (window path) vs heap-scanned (GroupTopK)
    def gtkLow(o: DataFrame): Long =
      graft.plans.GroupTopK.topKPerKey(
        o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_orderpriority"),
        Seq(graft.plans.GroupTopK.Key("o_totalprice", desc = true),
          graft.plans.GroupTopK.Key("o_orderkey")), 5).count()
    def wtkLow(o: DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).count()
    }
    time(s"q143 group-topk lowcard ${copies}x")(gtkLow(oCustShifted))
    time(s"q143 window-topk lowcard ${copies}x")(wtkLow(oCustShifted))

    // wall-clock is ambient-noisy at probe scale; shuffled bytes are
    // the deterministic witness that BOTH formulations map-side-reduce
    // identically (ratio 1.00) — the honest record that GroupTopK's
    // edge is the sorts it skips, not shuffle volume
    def shuffledBytes(df: DataFrame): Long = {
      df.collect()
      def nodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val more = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => nodes(a.executedPlan)
          case _ => Nil
        }
        (p +: more) ++ p.children.flatMap(nodes)
      }
      nodes(df.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          s.metrics.get("dataSize").map(_.value).getOrElse(0L)
      }.sum
    }
    // NOTE the reduction depends on per-partition key co-occurrence,
    // exactly like partial aggregation: with high-cardinality scattered
    // keys (custkey) each input partition holds ~1 row per key and the
    // map side can't reduce (ratio ≈ 1); with grouping-level keys
    // (orderpriority) the map side collapses each partition to ≤ 5·k
    // rows and the exchange all but disappears. Print both.
    if (only.isEmpty || only.exists("q143 shuffle".startsWith) || only.contains("q143")) {
      def both(keyCol: String, label: String): Unit = {
        val oSel = oCustShifted.select(col(keyCol), col("o_orderkey"), col("o_totalprice"))
        val g = shuffledBytes(graft.plans.GroupTopK.topKPerKey(oSel, Seq(keyCol),
          Seq(graft.plans.GroupTopK.Key("o_totalprice", desc = true),
            graft.plans.GroupTopK.Key("o_orderkey")), 5))
        val w0 = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val w = shuffledBytes(oSel.withColumn("rn", row_number().over(w0)).filter(col("rn") <= 5))
        println(f"[scale] q143 shuffle bytes $label ${copies}x: group-topk=$g window=$w ratio=${w.toDouble / g}%.2f")
      }
      both("o_custkey", "hicard")
      both("o_orderpriority", "lowcard")
    }

    // r10 winnowing family: fingerprint selection (q157) is a linear
    // explode + one keyed aggregation; pair detection (q158) rides the
    // DF-gated fp equi-join. Replication is a PER-TOKEN copy suffix:
    // each copy's within-corpus overlap structure is preserved exactly
    // (every 1x doc pair replicates once per copy) and cross-copy
    // 5-gram overlap is zero — "Nx corpus, Nx signal". The q76-style
    // marker INSERTION is wrong for the span family: markers between
    // tokens mean 3 shared real tokens already collide as a 5-gram,
    // and measured pairs explode ~1500x instead of 10x.
    val dTok = (1 to copies).map(i =>
      d1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1x$i")))
      .reduce(_ unionByName _)
    def winnowCount(docs: DataFrame): Long =
      graft.operators.SpanDedup.winnowedFingerprintsOf(docs).count()
    def winnowPairsCount(docs: DataFrame): Long =
      graft.operators.SpanDedup.winnowedOverlapPairsOf(docs).count()
    time("q157 winnow select 1x (5k docs)")(winnowCount(d1))
    time(s"q157 winnow select ${copies}x")(winnowCount(dTok))
    time("q158 winnow pairs 1x (5k docs)")(winnowPairsCount(d1))
    time(s"q158 winnow pairs ${copies}x")(winnowPairsCount(dTok))

    // r10 DSIR shape: narrow token-hash pass + (doc, bucket) count
    // aggregate + <=512-row roll-ups + a broadcast weight join — should
    // track the scan linearly (the weight table is size-constant by
    // design). Plain doc_id-shifted replication: uniform count scaling
    // leaves the bucket distributions (and thus the plan's work shape)
    // unchanged, which is exactly the timing question here.
    val dIdShift = (1 to copies).map(i =>
      d1.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    def dsirTarget(docs: DataFrame): DataFrame =
      docs.filter(col("doc_id") % 2 === 0).select("doc_id")
    def dsirCount(docs: DataFrame): Long =
      graft.operators.Curation.dsirLogWeightsOf(docs, dsirTarget(docs)).count()
    def dsirSelCount(docs: DataFrame): Long =
      graft.operators.Curation.dsirSelectOf(docs, dsirTarget(docs)).count()
    time("q161 dsir weights 1x (5k docs)")(dsirCount(d1))
    time(s"q161 dsir weights ${copies}x")(dsirCount(dIdShift))
    time("q162 dsir select 1x (5k docs)")(dsirSelCount(d1))
    time(s"q162 dsir select ${copies}x")(dsirSelCount(dIdShift))

    // r10 CDC chunker shape: O(n) rolling chunker in the scan + two
    // keyed aggregates — should track the scan linearly. id-shifted
    // replication keeps each copy's chunks distinct per doc while the
    // (source, sha) dedup aggregate sees copies-x duplicate chunks —
    // the worst case for the aggregate, the realistic case at scale.
    def cdcAgg(docs: DataFrame): Long =
      graft.operators.Dedup.cdcChunkDedupOf(docs).count()
    time("q165 cdc chunk dedup 1x (5k docs)")(cdcAgg(d1))
    time(s"q165 cdc chunk dedup ${copies}x")(cdcAgg(dIdShift))

    // r10/r11 funnel-provenance shape (q163): the full funnel (quality
    // pass, keep-first, DF-gated pair pipeline over survivors) plus the
    // content-key keeper lookup and two doc_id joins. dN's marker rewrite
    // keeps copies mutually distinct, so the pair pipeline sees Nx docs
    // with Nx internal near-dup structure — the honest direction.
    def auditCount(docs: DataFrame): Long =
      graft.operators.Curation.rejectionAuditOf(docs).count()
    time("q163 rejection audit 1x (5k docs)")(auditCount(d1))
    time(s"q163 rejection audit ${copies}x")(auditCount(dN))

    // r10 snapshot-delta shape (q166): two codegen chunker passes, one
    // sha anti-join, #source roll-ups. id-shifted replication: the new
    // snapshot's patched docs scale with the corpus; the chunk store's
    // distinct-sha side sees copies-x duplicate chunks (dup-heavy store,
    // the realistic worst case for the anti-join's build side).
    def deltaCount(docs: DataFrame): Long =
      graft.operators.Dedup.snapshotDeltaBytesOf(
        docs, graft.operators.Dedup.patchedSnapshot(docs)).count()
    time("q166 snapshot delta 1x (5k docs)")(deltaCount(
      d1.select(col("source"), col("doc_id"), col("text"))))
    time(s"q166 snapshot delta ${copies}x")(deltaCount(
      dIdShift.select(col("source"), col("doc_id"), col("text"))))

    // r10 T5 span-corruption shape (q168): narrow per-doc map (token
    // split, deterministic span grid, sentinel substitution) — must
    // track the scan. id-shifted replication keeps the corruption grid
    // identical per copy (hash offsets depend on doc_id, which shifts).
    def corruptCount(docs: DataFrame): Long =
      graft.operators.TextOps.spanCorruptionOf(docs).count()
    time("q168 span corruption 1x (5k docs)")(corruptCount(d1))
    time(s"q168 span corruption ${copies}x")(corruptCount(dIdShift))

    // r10 classifier-lift shape (q169): two narrow scoring passes joined
    // on doc_id, two scalar extremes broadcast back, 10-bin aggregate
    def liftCount(docs: DataFrame): Long =
      graft.operators.Curation.classifierLiftOf(docs).count()
    time("q169 classifier lift 1x (5k docs)")(liftCount(d1))
    time(s"q169 classifier lift ${copies}x")(liftCount(dN))

    // r10/r11 ANN audit shapes over the rotated embeddings (eN): q171
    // re-runs the full IVF-PQ search + the probes x corpus exact chain
    // (the audit is corpus-linear BY DESIGN — its exact side is the
    // ground-truth scan the index exists to avoid); q172 re-runs the
    // gated search + a probes x m exact re-score whose cost is constant
    // in the corpus — the pair of rows documents exactly that contrast.
    def recallCount(e: DataFrame): Long =
      graft.operators.Similarity.annRecallOf(e).count()
    def rerankCount(e: DataFrame): Long =
      graft.operators.Similarity.ivfPqRerankOf(e).count()
    time("q171 ann recall 1x (5k)")(recallCount(e1))
    time(s"q171 ann recall ${copies}x")(recallCount(eN))
    time("q172 ann rerank 1x (5k)")(rerankCount(e1))
    time(s"q172 ann rerank ${copies}x")(rerankCount(eN))

    // r11 steady-state funnel (q173/q174): the artifact tables are
    // PRE-BUILT (untimed parquet writes, as in production where q129
    // paid them once); the timed body is what a steady-state pass costs
    // — quality pass + doc_id semi/anti joins (+ content-key keeper
    // lookup for the audit). Uses dN so survivors stay corpus-sized.
    // r11 q176 shape: frozen-base delta admission. dN's marker rewrite
    // keeps copies mutually distinct, so base and delta BOTH scale 10x
    // with their internal near-dup structure preserved (the doc_id shift
    // stride is a multiple of 5, so each copy keeps the same mod-5 split).
    def appendCount(docs: DataFrame): Long =
      graft.operators.Dedup.neardupAppendOf(
        docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0).select(col("doc_id"), col("text")),
        docs.filter(pmod(col("doc_id"), lit(5L)) === 0).select(col("doc_id"), col("text"))).count()
    time("q176 artifact append 1x (5k docs)")(appendCount(d1))
    time(s"q176 artifact append ${copies}x")(appendCount(dN))

    val steadyRowNames = Seq(
      "q173 steady funnel 1x (5k docs)", s"q173 steady funnel ${copies}x",
      "q174 steady audit 1x (5k docs)", s"q174 steady audit ${copies}x")
    if (only.isEmpty || steadyRowNames.exists(n => only.exists(n.startsWith))) {
      def steadyTables(docs: DataFrame, tag: String): (String, String) = {
        val sv = graft.operators.Dedup.exactSurvivors(docs)
        val pairs = graft.operators.Dedup.jaccardPairsUnsorted(
            sv.select(col("doc_id"), col("text")), scope = "dedup.purge.shingles")
          .select(col("doc_a"), col("doc_b"))
        val (labels, _) = graft.operators.Dedup.clusterLabels(pairs)
        val base = s"/tmp/graft-scaleprobe-steady-$tag"
        sv.select(col("doc_id")).write.mode("overwrite").parquet(s"$base/sv")
        labels.write.mode("overwrite").parquet(s"$base/labels")
        (s"$base/sv", s"$base/labels")
      }
      val (sv1, lb1) = steadyTables(d1.select(col("doc_id"), col("text"), col("source")), "1x")
      val (svN, lbN) = steadyTables(dN.select(col("doc_id"), col("text"), col("source")), s"${copies}x")
      def steadyFunnel(docs: DataFrame, sv: String, lb: String): Long =
        graft.operators.Curation.steadyFunnelFrom(
          graft.operators.TextOps.qualityScoresOf(docs)
            .select(col("doc_id"), col("quality"), col("n_tokens")),
          spark.read.parquet(sv), spark.read.parquet(lb)).count()
      def steadyAudit(docs: DataFrame, sv: String, lb: String): Long =
        graft.operators.Curation.steadyAuditFrom(
          graft.operators.TextOps.qualityScoresOf(docs)
            .select(col("doc_id"), col("quality")),
          // the production key, identical expression to the shipped plan
          docs.select(col("doc_id"),
            graft.operators.Dedup.contentKeyNullSafe(col("text")).as("tkey")),
          spark.read.parquet(sv), spark.read.parquet(lb)).count()
      time("q173 steady funnel 1x (5k docs)")(steadyFunnel(d1, sv1, lb1))
      time(s"q173 steady funnel ${copies}x")(steadyFunnel(dN, svN, lbN))
      time("q174 steady audit 1x (5k docs)")(steadyAudit(d1, sv1, lb1))
      time(s"q174 steady audit ${copies}x")(steadyAudit(dN, svN, lbN))
    }

    // r11 late shapes. q177 is q72's probed geometry with a different
    // projection (one-pass dual-direction explode) — the row certifies
    // the restructure didn't change the growth class. q179's exact side
    // is CANDIDATE-BOUNDED (pair x shingles equi-joins through the LSH
    // gate); dN's marker rewrite keeps copies mutually distinct, so the
    // candidate set scales linearly, never quadratically. q178 times the
    // steady-state body only — the label table is pre-built untimed (the
    // q173/q174 convention: production reads the q129 artifact).
    def containCount(docs: DataFrame): Long =
      graft.operators.Dedup.containmentPairsOf(
        docs.select(col("doc_id"), col("text"))).count()
    time("q177 containment 1x (5k docs)")(containCount(d1))
    time(s"q177 containment ${copies}x")(containCount(dN))
    def estErrCount(docs: DataFrame): Long =
      graft.operators.Dedup.minhashEstimateErrorOf(
        docs.select(col("doc_id"), col("text"))).count()
    time("q179 estimate error 1x (5k docs)")(estErrCount(d1))
    time(s"q179 estimate error ${copies}x")(estErrCount(dN))
    // q217: three bandings over the ONE ScopedCache'd signature pass,
    // each candidate-bounded like q179 — the card must scale like 3x
    // q179's audit, never like an all-pairs join
    def geomCardCount(docs: DataFrame): Long =
      graft.operators.Dedup.lshGeometryCardOf(
        docs.select(col("doc_id"), col("text")))
        .agg(sum(col("n_cand") + col("n_est_dup")).cast("long"))
        .collect()(0).getLong(0)
    time("q217 geometry card 1x (5k docs)")(geomCardCount(d1))
    time(s"q217 geometry card ${copies}x")(geomCardCount(dN))
    val softRowNames = Seq(
      "q178 soft weights 1x (5k docs)", s"q178 soft weights ${copies}x")
    if (only.isEmpty || softRowNames.exists(n => only.exists(n.startsWith))) {
      def softTables(docs: DataFrame, tag: String): String = {
        val sv = graft.operators.Dedup.exactSurvivors(docs)
        val pairs = graft.operators.Dedup.jaccardPairsUnsorted(
            sv.select(col("doc_id"), col("text")), scope = "dedup.purge.shingles")
          .select(col("doc_a"), col("doc_b"))
        val (labels, _) = graft.operators.Dedup.clusterLabels(pairs)
        val base = s"/tmp/graft-scaleprobe-soft-$tag"
        labels.write.mode("overwrite").parquet(base)
        base
      }
      val slb1 = softTables(d1.select(col("doc_id"), col("text")), "1x")
      val slbN = softTables(dN.select(col("doc_id"), col("text")), s"${copies}x")
      def softCount(docs: DataFrame, lb: String): Long =
        graft.operators.Dedup.softDedupWeightsOf(
          docs.select(col("doc_id"), col("source")),
          spark.read.parquet(lb)).count()
      time("q178 soft weights 1x (5k docs)")(softCount(d1, slb1))
      time(s"q178 soft weights ${copies}x")(softCount(dN, slbN))
    }

    // r11 session-3 shapes. q182 SemDeDup: kmeans training is linear per
    // iteration (broadcast assign + per-(cluster,dim) partials) and the
    // pair comparison is an equi-join blocked on the cluster id. The
    // production posture scales k WITH the corpus (the paper trains
    // ~100k clusters for billions of examples), so the 10x row trains
    // 10x the clusters and keeps the per-cluster pair count flat — the
    // honest contrast is sub-quadratic growth, not a flat line (Lloyd
    // pays k x corpus distance evaluations per iteration). q183 BM25:
    // two narrow corpus passes; only query-term hits survive to the
    // shuffle and the top-20 is TakeOrderedAndProject.
    def semdedupCount(e: DataFrame, k: Int): Long =
      graft.operators.Similarity.semdedupPruneOf(e, k = k)
        .filter(col("pruned")).count()
    time("q182 semdedup 1x (5k, k=8)")(semdedupCount(e1, 8))
    time(s"q182 semdedup ${copies}x (k=${8 * copies})")(
      semdedupCount(eN, 8 * copies))
    def bm25Count(docs: DataFrame): Long =
      graft.operators.TextOps.bm25RankOf(
        docs.select(col("doc_id"), col("text"))).count()
    time("q183 bm25 1x (5k docs)")(bm25Count(d1))
    time(s"q183 bm25 ${copies}x")(bm25Count(dN))

    // r12 shapes, all on the q173/q174 convention: corpus-derived
    // artifacts are PRE-BUILT untimed (production reads them from the
    // store), the timed body is what a steady-state pass costs.
    // q181: timed = the eval side's winnow pass + fingerprint semi-join
    // — linear in the EVAL split, never re-derives the train index.
    val winRowNames = Seq(
      "q181 winnow screen 1x (5k docs)", s"q181 winnow screen ${copies}x")
    if (only.isEmpty || winRowNames.exists(n => only.exists(n.startsWith))) {
      def winnowIndex(docs: DataFrame, tag: String): String = {
        val base = s"/tmp/graft-scaleprobe-winnow-$tag"
        graft.operators.SpanDedup.writeWinnowIndex(
          docs.withColumn("split", graft.operators.TextOps.splitAssign), base)
        s"$base/train_fps"
      }
      val w1 = winnowIndex(d1, "1x"); val wN = winnowIndex(dN, s"${copies}x")
      def screenCount(docs: DataFrame, fps: String): Long =
        graft.operators.SpanDedup.winnowScreenOf(spark.read.parquet(fps),
          docs.withColumn("split", graft.operators.TextOps.splitAssign)
            .filter(col("split") =!= "train")).count()
      time("q181 winnow screen 1x (5k docs)")(screenCount(d1, w1))
      time(s"q181 winnow screen ${copies}x")(screenCount(dN, wN))
    }
    // q176 steady tail + q185 fold: the five-table base index pre-built
    // once per scale, read back as parquet. q176's timed body is the
    // admission alone (the number bench passes 2+ measure). q185 runs
    // with the delta FIXED at 1x size against a 1x and a Nx base — the
    // fold's claim is growth ∝ delta + gate-affected set, so a 10x
    // corpus under the same delta must grow sublinearly (scan-bound).
    val foldRowNames = Seq(
      "q176 steady admission 1x (5k docs)", s"q176 steady admission ${copies}x",
      "q185 compact fold 1x (5k docs)", s"q185 compact fold ${copies}x base, 1x delta")
    if (only.isEmpty || foldRowNames.exists(n => only.exists(n.startsWith))) {
      def baseIndex(docs: DataFrame, tag: String): String = {
        val out = s"/tmp/graft-scaleprobe-ndbase-$tag"
        val (bsv, hot, bsh, bpairs, bl) = graft.operators.Dedup.appendBaseParts(
          docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0)
            .select(col("doc_id"), col("text")))
        bsv.select(col("doc_id"), col("tkey"))
          .join(bsh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh")),
            Seq("doc_id"), "left").na.fill(0L, Seq("nsh"))
          .write.mode("overwrite").parquet(s"$out/bsv")
        hot.write.mode("overwrite").parquet(s"$out/hot")
        bsh.write.mode("overwrite").parquet(s"$out/bsh")
        bpairs.write.mode("overwrite").parquet(s"$out/bpairs")
        bl.write.mode("overwrite").parquet(s"$out/blabels")
        out
      }
      val b1 = baseIndex(d1, "1x"); val bN = baseIndex(dN, s"${copies}x")
      def deltaOf(docs: DataFrame) =
        docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
          .select(col("doc_id"), col("text"))
      def admitCount(b: String, docs: DataFrame): Long =
        graft.operators.Dedup.neardupAppendAgainst(
          spark.read.parquet(s"$b/bsv"), spark.read.parquet(s"$b/hot"),
          spark.read.parquet(s"$b/bsh"), spark.read.parquet(s"$b/blabels"),
          deltaOf(docs)).count()
      time("q176 steady admission 1x (5k docs)")(admitCount(b1, d1))
      time(s"q176 steady admission ${copies}x")(admitCount(bN, dN))
      def foldTime(b: String, delta: DataFrame, tag: String): Long = {
        val out = s"/tmp/graft-scaleprobe-ndcompact-$tag"
        graft.operators.Dedup.writeCompactedNeardup(
          spark.read.parquet(s"$b/bsv"), spark.read.parquet(s"$b/hot"),
          spark.read.parquet(s"$b/bsh"), spark.read.parquet(s"$b/bpairs"),
          delta, out)
        spark.read.parquet(s"$out/bpairs").count()
      }
      time("q185 compact fold 1x (5k docs)")(foldTime(b1, deltaOf(d1), "1x"))
      time(s"q185 compact fold ${copies}x base, 1x delta")(
        foldTime(bN, deltaOf(d1), s"${copies}x"))
    }
    // q186 steady tail: posting artifact pre-built untimed; timed = the
    // term-pushed posting scan + broadcast score/rank tail.
    val bmIdxRowNames = Seq(
      "q186 indexed bm25 1x (5k docs)", s"q186 indexed bm25 ${copies}x",
      "q190 appended bm25 1x base, 1x delta",
      s"q190 appended bm25 ${copies}x base, 1x delta",
      "q194 tfidf keywords 1x (5k docs)", s"q194 tfidf keywords ${copies}x")
    if (only.isEmpty || bmIdxRowNames.exists(n => only.exists(n.startsWith))) {
      def postingIndex(docs: DataFrame, tag: String): String = {
        val out = s"/tmp/graft-scaleprobe-bm25-$tag"
        val base = docs.select(col("doc_id"),
          split(col("text"), " ").as("tk"))
        base.select(col("doc_id"), size(col("tk")).as("dl"),
            explode(col("tk")).as("tok"))
          .groupBy(col("doc_id"), col("dl"), col("tok"))
          .agg(count(lit(1)).as("tf"))
          .write.mode("overwrite").parquet(s"$out/postings")
        spark.read.parquet(s"$out/postings")
          .groupBy(col("tok")).agg(count(lit(1)).as("df"))
          .write.mode("overwrite").parquet(s"$out/term_df")
        base.agg(count(lit(1)).as("n_docs"), avg(size(col("tk"))).as("avgdl"))
          .write.mode("overwrite").parquet(s"$out/stats")
        out
      }
      // lazy: time()'s body is by-name and skipped rows never force it,
      // so a targeted `--only q189 ...` run doesn't pay artifact builds
      // whose timed rows it skips (ADVICE r13)
      lazy val p1 = postingIndex(d1, "1x")
      lazy val pN = postingIndex(dN, s"${copies}x")
      def idxRank(b: String): Long = {
        val terms = graft.operators.TextOps.Bm25QueryTerms
        graft.operators.TextOps.bm25ScoreTailProbe(
          spark.read.parquet(s"$b/postings").filter(col("tok").isin(terms: _*)),
          spark.read.parquet(s"$b/term_df").filter(col("tok").isin(terms: _*)),
          spark.read.parquet(s"$b/stats")).count()
      }
      time("q186 indexed bm25 1x (5k docs)")(idxRank(p1))
      time(s"q186 indexed bm25 ${copies}x")(idxRank(pN))
      // q190 shape: append rank against a pre-built BASE-SPLIT artifact
      // (mod-5 docs excluded, exactly like the registered query's base —
      // a full-corpus artifact would double-count the delta's postings)
      // with a FIXED 1x delta — the claim is cost ∝ delta + pushed base
      // scan, so a 10x base under the same delta must grow sublinearly.
      // Stats stay the base split's (timing-neutral: one broadcast row).
      // lazy for the same reason as p1/pN: only forced by a selected row
      lazy val b190a = postingIndex(
        d1.filter(pmod(col("doc_id"), lit(5L)) =!= 0), "base1x")
      lazy val b190b = postingIndex(
        dN.filter(pmod(col("doc_id"), lit(5L)) =!= 0), s"base${copies}x")
      def appendRank(b: String, delta: DataFrame): Long = {
        val terms = graft.operators.TextOps.Bm25QueryTerms
        val dtk = delta.select(col("doc_id"), split(col("text"), " ").as("tk"))
        val dtf = dtk.select(col("doc_id"), size(col("tk")).as("dl"),
            explode(col("tk")).as("tok"))
          .filter(col("tok").isin(terms: _*))
          .groupBy(col("doc_id"), col("dl"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        graft.operators.TextOps.bm25ScoreTailProbe(
          spark.read.parquet(s"$b/postings").filter(col("tok").isin(terms: _*))
            .unionByName(dtf),
          spark.read.parquet(s"$b/term_df").filter(col("tok").isin(terms: _*))
            .unionByName(dtf.groupBy(col("tok")).agg(count(lit(1)).as("df")))
            .groupBy(col("tok")).agg(sum(col("df")).as("df")),
          spark.read.parquet(s"$b/stats")).count()
      }
      val deltaDocs = d1.filter(pmod(col("doc_id"), lit(5L)) === 0)
      time("q190 appended bm25 1x base, 1x delta")(appendRank(b190a, deltaDocs))
      time(s"q190 appended bm25 ${copies}x base, 1x delta")(appendRank(b190b, deltaDocs))
      // q194 shape: the keyword tail over the SAME pre-built posting
      // artifacts — posting scan + vocab idf join + GroupTopK; unlike
      // q186 there is no term predicate, so this row certifies the
      // full-posting-scan path (the worst case) stays linear.
      def tfidfCount(b: String): Long =
        graft.operators.TextOps.tfidfTailProbe(
          spark.read.parquet(s"$b/postings"),
          spark.read.parquet(s"$b/term_df"),
          spark.read.parquet(s"$b/stats")).count()
      time("q194 tfidf keywords 1x (5k docs)")(tfidfCount(p1))
      time(s"q194 tfidf keywords ${copies}x")(tfidfCount(pN))
    }
    // r13 shapes. q188: one narrow scan + a broadcast 20-row rate table —
    // the probe certifies the draw stays map-bounded as the corpus grows.
    // q189: the two-level running sum — per-source windows scale with the
    // corpus, the unkeyed offsets window stays |sources|-sized.
    def mixtureCount(docs: DataFrame): Long =
      graft.operators.Curation.mixtureSampleOf(
        docs.select(col("doc_id"), col("source"), col("text"))).count()
    time("q188 mixture sample 1x (5k docs)")(mixtureCount(d1))
    time(s"q188 mixture sample ${copies}x")(mixtureCount(dN))
    def shardCount(docs: DataFrame): Long =
      graft.operators.Curation.shardPackOf(
        docs.select(col("doc_id"), col("source"), col("text"))).count()
    time("q189 shard pack 1x (5k docs)")(shardCount(d1))
    time(s"q189 shard pack ${copies}x")(shardCount(dN))

    // r14 shapes. q192: the split's only corpus-sized op is a doc_id
    // equi-join against the label table + a per-row integer draw.
    // Synthetic labels hold the clustered fraction constant (20%, pairs
    // of adjacent even/odd ids) as the corpus grows, so the row
    // measures join+draw scaling, not artifact-build cost.
    def splitCount(docs: DataFrame): Long = {
      val labels = docs.select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(10L)) < 2)
        .select(col("doc_id").as("node"),
          (col("doc_id") - pmod(col("doc_id"), lit(2L))).as("label"))
      graft.operators.Dedup.clusterSplitAssignOf(
        docs.select(col("doc_id")), labels).count()
    }
    time("q192 split assign 1x (5k docs)")(splitCount(d1))
    time(s"q192 split assign ${copies}x")(splitCount(dN))
    // q193: the SQ8 ADC scan — fixed probe set (copy-1 ids), broadcast
    // scalar LUT, codes scan ∝ corpus: the join output is probes × dims
    // × corpus rows collapsing map-side, so the row must scale linearly.
    def sq8Count(e: DataFrame): Long =
      graft.operators.Similarity.sq8SearchOf(e).count()
    time("q193 sq8 search 1x (5k vecs)")(sq8Count(e1))
    time(s"q193 sq8 search ${copies}x")(sq8Count(eN))
    // q195: PMI pair generation is per-row map work; the aggregates and
    // vocab joins grow with distinct pairs/terms (the dN marker rewrite
    // grows the vocab by one term per copy, so the pair space scales
    // realistically rather than collapsing onto the 1x keys).
    def pmiCount(docs: DataFrame): Long =
      graft.operators.TextOps.pmiCollocationsOf(docs).count()
    time("q195 pmi collocations 1x (5k docs)")(pmiCount(d1))
    time(s"q195 pmi collocations ${copies}x")(pmiCount(dN))
    // q196: the SQ8 audit pairs q193's gated scan with the brute-force
    // exact side — the exact kernel is O(probes × corpus) by definition
    // (that is what makes it the acceptance baseline, q171's shape), so
    // the row certifies the audit stays ∝ corpus, not worse.
    def sq8RecallCount(e: DataFrame): Long =
      graft.operators.Similarity.sq8RecallOf(e).count()
    time("q196 sq8 recall 1x (5k vecs)")(sq8RecallCount(e1))
    time(s"q196 sq8 recall ${copies}x")(sq8RecallCount(eN))
    // q198: featurizer = explode + keyed aggregates, output ∝ docs×32 —
    // must scale linearly (the dN marker rewrite grows the vocab, so the
    // idf table grows realistically too, not just the doc count)
    def hashedVecCount(docs: DataFrame): Long =
      graft.operators.TextOps.hashedDocVectorsOf(
        docs.select(col("doc_id"), col("text"))).count()
    time("q198 hashed vectors 1x (5k docs)")(hashedVecCount(d1))
    time(s"q198 hashed vectors ${copies}x")(hashedVecCount(dN))
    // q199: the matrix tail is #sources²×32 — constant as docs grow
    // (same 20 sources per copy), so the row isolates the corpus-sized
    // featurize + (source, dim) aggregate front
    def srcSimCount(docs: DataFrame): Long =
      graft.operators.TextOps.sourceSimilarityOf(
        docs.select(col("doc_id"), col("text"), col("source"))).count()
    time("q199 source similarity 1x (5k docs)")(srcSimCount(d1))
    time(s"q199 source similarity ${copies}x")(srcSimCount(dN))
    // q200: two sha-keyed aggregates + a key-min join; distinct canonical
    // keys grow with the corpus (the marker rewrite keeps copies unequal)
    def normDedupCount(docs: DataFrame): Long =
      graft.operators.Profiling.normalizedDedupOf(
        docs.select(col("doc_id"), col("source"), col("text"))).count()
    time("q200 normalized dedup 1x (5k docs)")(normDedupCount(d1))
    time(s"q200 normalized dedup ${copies}x")(normDedupCount(dN))
    // q201: two sha-keyed corpus aggregates + a label-table aggregate —
    // synthetic labels (20% clustered, like the q192 row) keep the
    // cluster fraction constant so the row measures aggregate scaling
    def methodCardCount(docs: DataFrame): Long = {
      val labels = docs.select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(10L)) < 2)
        .select(col("doc_id").as("node"),
          (col("doc_id") - pmod(col("doc_id"), lit(2L))).as("label"))
      graft.operators.Profiling.dedupMethodCardOf(
        docs.select(col("doc_id"), col("text")), labels).count()
    }
    time("q201 method card 1x (5k docs)")(methodCardCount(d1))
    time(s"q201 method card ${copies}x")(methodCardCount(dN))
    // q202: five unrolled LR-GD steps — each is two shuffles over the
    // (docs × 33)-row feature table; the model (33 doubles) is the only
    // driver state, so the row must scale ∝ corpus
    def lrTrainCount(docs: DataFrame): Long =
      graft.operators.Curation.lrQualityTrainOf(
        docs.select(col("doc_id"), col("lang"), col("source"),
          col("text"), col("n_chars"))).count()
    time("q202 lr train 1x (5k docs)")(lrTrainCount(d1))
    time(s"q202 lr train ${copies}x")(lrTrainCount(dN))
    // q203: scoring = the featurizer front + a pure per-row fold; the
    // model is trained ONCE on d1 and applied to both sizes (the real
    // deployment shape: frozen model, growing corpus)
    locally {
      val model = graft.operators.Curation.lrQualityTrainOf(d1)
        .orderBy(col("dim")).collect().map(_.getDouble(1))
      def scoreCount(docs: DataFrame): Long =
        graft.operators.Curation.lrScoreOf(
          docs.select(col("doc_id"), col("text")), model).count()
      time("q203 lr score 1x (5k docs)")(scoreCount(d1))
      time(s"q203 lr score ${copies}x")(scoreCount(dN))
    }
    // q204: the eval instrument refits idf + model on the 80% train
    // bucket and scores the 10% val bucket — the whole pipeline scales
    // ∝ corpus like q202+q203, with the confusion table the only output
    def evalCount(docs: DataFrame): Long =
      graft.operators.Curation.classifierEvalOf(docs).count()
    time("q204 classifier eval 1x (5k docs)")(evalCount(d1))
    time(s"q204 classifier eval ${copies}x")(evalCount(dN))
    // q206: the sweep adds ONE label pass and a <=22-row histogram on
    // top of q203's scorer — threshold count never touches the corpus
    locally {
      val model = graft.operators.Curation.lrQualityTrainOf(d1)
        .orderBy(col("dim")).collect().map(_.getDouble(1))
      def sweepCount(docs: DataFrame): Long =
        graft.operators.Curation.lrThresholdSweepOf(docs, model).count()
      time("q206 threshold sweep 1x (5k docs)")(sweepCount(d1))
      time(s"q206 threshold sweep ${copies}x")(sweepCount(dN))
      // q215: q213's scored-population pass materializes ONCE into the
      // cached (z, y) table; the 12 Platt GD steps then aggregate over
      // that 2-column cache and the card is a <=10-bin rollup — the
      // per-step cost scales with the cache, not the featurizer
      def plattCount(docs: DataFrame): Long =
        graft.operators.Curation.plattRecalibrationOf(docs, model).count()
      time("q215 platt recalibration 1x (5k docs)")(plattCount(d1))
      time(s"q215 platt recalibration ${copies}x")(plattCount(dN))
      // q224: the method card's corpus work is q215's — one cached (z,y)
      // pass + the fit; the isotonic stage adds three joins over <=11-bin
      // aggregates (model-sized). Must track q215. Anchored on the card's
      // mean_score mass so no branch can be pruned.
      def methodCardCount(docs: DataFrame): Long =
        graft.operators.Curation.calibrationMethodCardOf(docs, model)
          .agg(sum((col("mean_score") + col("n_docs"))
            .cast(DecimalType(38, 12))).cast("long"))
          .collect()(0).getLong(0)
      time("q224 calib method card 1x (5k docs)")(methodCardCount(d1))
      time(s"q224 calib method card ${copies}x")(methodCardCount(dN))
      // q219: serving under a FROZEN (w, a, b) triple fit on d1 (the
      // deployment shape) — a pure map over the margin, must scale like
      // q203's scorer; anchored on the score sum so pruning can't
      // hollow the fold
      locally {
        val lab = graft.operators.TextOps.qualityScoresOf(d1)
          .select(col("doc_id"),
            when(col("quality") >= graft.operators.Curation.FunnelQualityMin,
              1.0).otherwise(0.0).as("y"))
        val zy = graft.operators.Curation.plattScoresOf(d1, model, 1.0, 0.0)
          .select(col("doc_id"), col("z")).join(lab, Seq("doc_id"))
          .select(col("z"), col("y"))
        val (pa, pb) = graft.operators.Curation.plattFit(zy)
        def servedCount(docs: DataFrame): Long =
          graft.operators.Curation.plattScoresOf(docs, model, pa, pb)
            .agg(sum((col("score_raw") + col("score_cal"))
              .cast(DecimalType(38, 12))).cast("long"))
            .collect()(0).getLong(0)
        time("q219 platt served 1x (5k docs)")(servedCount(d1))
        time(s"q219 platt served ${copies}x")(servedCount(dN))
      }
    }
    // q205: one BPE round = pair recount (map-side-combined, pair-vocab
    // sized) + a pure-map merge apply; rounds multiply the constant,
    // not the exponent. Probe one full recount + apply at both sizes.
    def bpeRoundCount(docs: DataFrame): Long = {
      val (rows, fin) = graft.operators.TextOps.bpeTrainState(
        docs.select(col("doc_id"), col("text")), rounds = 1)
      val n = fin.count()
      graft.functions.ScopedCache.releaseCheckpoint(fin)
      n + rows.size
    }
    time("q205 bpe round 1x (5k docs)")(bpeRoundCount(d1))
    time(s"q205 bpe round ${copies}x")(bpeRoundCount(dN))
    // q210: serving encode under a FROZEN merge table (trained on d1 —
    // the real deployment shape) is a pure shuffle-free map chain; the
    // row must scale ~linearly with the corpus
    locally {
      val (mrows, mfin) = graft.operators.TextOps.bpeTrainState(
        d1.select(col("doc_id"), col("text")))
      graft.functions.ScopedCache.releaseCheckpoint(mfin)
      val merges = mrows.map(r => (r._2, r._3))
      def encodeCount(docs: DataFrame): Long =
        graft.operators.TextOps.bpeEncodeStatsOf(
          docs.select(col("doc_id"), col("text")), merges).count()
      time("q210 bpe encode 1x (5k docs)")(encodeCount(d1))
      time(s"q210 bpe encode ${copies}x")(encodeCount(dN))
      // q216: q210's frozen-model encode plus one <=|langs|-row rollup
      // and a broadcast 1-row total — must track q210's scaling
      // anchored on the mass columns (not count()) so column pruning
      // cannot strip the merge kernel out of the rollup branch
      def fertilityCount(docs: DataFrame): Long =
        graft.operators.TextOps.bpeFertilityCardOf(
          docs.select(col("doc_id"), col("lang"), col("text")), merges)
          .agg(sum(col("n_bpe") + col("n_raw")).cast("long"))
          .collect()(0).getLong(0)
      time("q216 fertility card 1x (5k docs)")(fertilityCount(d1))
      time(s"q216 fertility card ${copies}x")(fertilityCount(dN))
      // q218: |depths| frozen-model encode scans over the cached token
      // table, each into a vocabulary-sized aggregate — scales like a
      // few q210 passes, never worse
      def depthSweepCount(docs: DataFrame): Long =
        graft.operators.TextOps.bpeDepthSweepOf(
          docs.select(col("doc_id"), col("text")), merges)
          .agg(sum(col("n_symbols") + col("vocab_size")).cast("long"))
          .collect()(0).getLong(0)
      time("q218 depth sweep 1x (5k docs)")(depthSweepCount(d1))
      time(s"q218 depth sweep ${copies}x")(depthSweepCount(dN))
    }
    // q207: q103's shape plus two aggregates over the ALREADY-collapsed
    // pair table — the continuation stats are pair-vocab-sized, so the
    // scaling is q103's (the honest sublinear-join caveat q110 fixes)
    def smoothedCount(docs: DataFrame): Long =
      graft.operators.TextOps.smoothedBigramSurprisalOf(
        docs.select(col("doc_id"), col("text"))).count()
    time("q207 smoothed surprisal 1x (5k docs)")(smoothedCount(d1))
    time(s"q207 smoothed surprisal ${copies}x")(smoothedCount(dN))
    // q211: q207's scoring pass + a grid histogram whose window state is
    // bounded by the milli-nat DESIGN constant — the tertile tail must
    // add ~nothing over q207 at any size
    def bucketsCount(docs: DataFrame): Long =
      graft.operators.TextOps.perplexityBucketsOf(
        docs.select(col("doc_id"), col("text"))).count()
    time("q211 ppl buckets 1x (5k docs)")(bucketsCount(d1))
    time(s"q211 ppl buckets ${copies}x")(bucketsCount(dN))
    // q208 composes the q171/q175/q196 audits verbatim (each probed
    // above / in their own rows) and adds a 3-row union — no new scaling
    // surface of its own.

    // q214: paragraph explode + sha-keyed keeper aggregate + doc rebuild.
    // Every doc gets a unique body paragraph (marker-rewritten per copy)
    // plus ONE corpus-wide boilerplate footer — the real CCNet shape and
    // the natural hot key: the footer keeper map-side-combines, and the
    // join-back's skewed key is AQE skew-join territory; the row must
    // stay ~linear regardless
    // sum(length(clean_text)): a bare count() would let Catalyst
    // ELIMINATE the unique-key left joins and the rebuild entirely
    // (measured 0.14 s — a pruned scan, not the operator); anchoring the
    // action on the rebuilt text charges the full dataflow
    def paraDedupCount(docs: DataFrame): Long =
      graft.operators.Profiling.paragraphDedupOf(
        docs.select(col("doc_id"),
          concat(col("text"), lit("\nCopyright Footer Paragraph"))
            .as("text")))
        .agg(sum(length(col("clean_text"))).cast("long")).collect()(0).getLong(0)
    time("q214 para dedup 1x (5k docs)")(paraDedupCount(d1))
    time(s"q214 para dedup ${copies}x")(paraDedupCount(dN))
    // q220: q214's chain + one doc_id join + a #source-row rollup —
    // must track q214 (anchored on the mass columns)
    def paraBySourceCount(docs: DataFrame): Long =
      graft.operators.Profiling.paragraphDedupBySourceOf(
        docs.select(col("doc_id"), col("source"),
          concat(col("text"), lit("\nCopyright Footer Paragraph"))
            .as("text")))
        .agg(sum(col("n_kept") + col("n_dropped")).cast("long"))
        .collect()(0).getLong(0)
    time("q220 para profile 1x (5k docs)")(paraBySourceCount(d1))
    time(s"q220 para profile ${copies}x")(paraBySourceCount(dN))
    // q221/q225: the CCNet composition — q214's dedup + a narrow langid
    // map + q211's chain over the survivors. Must track ~(q214 + q211);
    // the footer injection keeps the dedup stage honest. Anchored on the
    // kept-corpus mass (q221) and the funnel counts (q225) so no stage
    // can be pruned out from under the probe.
    def ccnetDocs(docs: DataFrame) =
      docs.select(col("doc_id"), col("source"), col("lang"),
        concat(col("text"), lit("\nCopyright Footer Paragraph")).as("text"))
    def ccnetCount(docs: DataFrame): Long =
      graft.operators.Profiling.ccnetCorpusOf(ccnetDocs(docs))
        .agg(sum(length(col("clean_text"))).cast("long"))
        .collect()(0).getLong(0)
    time("q221 ccnet corpus 1x (5k docs)")(ccnetCount(d1))
    time(s"q221 ccnet corpus ${copies}x")(ccnetCount(dN))
    def ccnetFunnelCount(docs: DataFrame): Long =
      graft.operators.Profiling.ccnetFunnelOf(ccnetDocs(docs))
        .agg(sum(col("n_in") + col("n_kept")).cast("long"))
        .collect()(0).getLong(0)
    time("q225 ccnet funnel 1x (5k docs)")(ccnetFunnelCount(d1))
    time(s"q225 ccnet funnel ${copies}x")(ccnetFunnelCount(dN))
    // q222: q68's pack + per-source rank + the 48-step Feistel walk as
    // a narrow map — must scale like the pack itself (the walk is ~flat
    // per-row arithmetic). Anchored on the permuted positions so the
    // walk cannot be pruned.
    def shuffleCount(docs: DataFrame): Long =
      graft.operators.Curation.epochShuffleOf(
        graft.operators.TextOps.packSequencesOf(
          docs.select(col("doc_id"), col("source"),
            expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tokens")),
          budget = graft.operators.TextOps.PackBudget)
          .select(col("source"), col("chunk_id"), col("chunk_tokens")))
        .agg(sum(col("pos") + col("chunk_tokens")).cast("long"))
        .collect()(0).getLong(0)
    time("q222 epoch shuffle 1x (5k docs)")(shuffleCount(d1))
    time(s"q222 epoch shuffle ${copies}x")(shuffleCount(dN))
    // q223: q103's corpus pass into a #sources-row loss table; the MW
    // iteration is driver-held over those rows — must track q103.
    // Anchored on loss+weight mass so neither side prunes.
    def doremiCount(docs: DataFrame): Long =
      graft.operators.Curation.doremiWeightsOf(
        docs.select(col("doc_id"), col("source"), col("text")))
        .agg(sum((col("proxy_loss") + col("weight") + col("n_bigrams"))
          .cast(DecimalType(38, 12))).cast("long"))
        .collect()(0).getLong(0)
    time("q223 doremi weights 1x (5k docs)")(doremiCount(d1))
    time(s"q223 doremi weights ${copies}x")(doremiCount(dN))
    // q226: q223's weight fit + a broadcast rate gate over a narrow
    // (doc_id, source) scan — must track q223 with ~no gate overhead.
    // Anchored on kept rows' rate mass.
    def doremiSampleCount(docs: DataFrame): Long =
      graft.operators.Curation.doremiSampleOf(
        docs.select(col("doc_id"), col("source"), col("text")))
        .agg(sum(col("rate_ppm") + col("doc_id")).cast("long"))
        .collect()(0).getLong(0)
    time("q226 doremi sample 1x (5k docs)")(doremiSampleCount(d1))
    time(s"q226 doremi sample ${copies}x")(doremiSampleCount(dN))
    // q227: q221's chain + the clean-text pack + the codegen'd walk —
    // must track q221 (the pack and walk add per-source windows and a
    // narrow map). Anchored on position+token mass.
    def trainingChunksCount(docs: DataFrame): Long =
      graft.operators.Profiling.ccnetTrainingChunksOf(ccnetDocs(docs))
        .agg(sum(col("pos") + col("chunk_tokens")).cast("long"))
        .collect()(0).getLong(0)
    time("q227 training chunks 1x (5k docs)")(trainingChunksCount(d1))
    time(s"q227 training chunks ${copies}x")(trainingChunksCount(dN))
    // q228: one corpus pass through the broadcast 3·|langs|-row threshold
    // table into a bounded (scheme, lang) aggregate — must scale like the
    // scan. Anchored on thr+kept mass so neither side prunes.
    def mixtureCardCount(docs: DataFrame): Long =
      graft.operators.TextOps.mixtureMethodCardOf(docs)
        .agg(sum(col("thr") + col("n_kept") + col("kept_tokens")).cast("long"))
        .collect()(0).getLong(0)
    time("q228 mixture card 1x (5k docs)")(mixtureCardCount(d1))
    time(s"q228 mixture card ${copies}x")(mixtureCardCount(dN))
    // q229: the two decontamination audits it compares (q138 full-index
    // + q181 winnow) — must track their sum; card assembly adds ≤4-row
    // broadcast work. Anchored on index+flag mass so neither side prunes.
    def decontamCardCount(docs: DataFrame): Long =
      graft.operators.SpanDedup.decontamMethodCardOf(docs)
        .agg(sum(col("index_size") + col("n_flagged") + col("n_missed"))
          .cast("long"))
        .collect()(0).getLong(0)
    time("q229 decontam card 1x (5k docs)")(decontamCardCount(d1))
    time(s"q229 decontam card ${copies}x")(decontamCardCount(dN))

    spark.stop()
  }
}
