package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PolyHash
import graft.operators.{Dedup, SpanDedup}

/** Span-level dedup (q132-q134): positional hash parity, a brute-force
  * coverage oracle over the real fixture, cross-query consistency, and a
  * constructed corpus with known duplicated runs.
  */
class SpanDedupSpec extends AnyFunSuite with SparkSpec {

  private def foldRef(s: String): Long = PolyHash.foldToken(s, PolyHash.M1)

  test("graft_spans_poly: positional hashes match the reference fold") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.sql("SELECT graft_spans_poly('a b c d e f') AS h")
    val got = df.collect()(0).getSeq[Long](0)
    val toks = "a b c d e f".split(" ")
    val th = toks.map(foldRef)
    val want = (0 to 1).map { i =>
      (1 until 5).foldLeft(th(i)) { (b, k) =>
        (b * PolyHash.M1 + th(i + k)) % PolyHash.P
      }
    }
    assert(got === want)
    // below n tokens -> empty, not null
    assert(spark.sql("SELECT graft_spans_poly('a b') AS h")
      .collect()(0).getSeq[Long](0).isEmpty)
  }

  /** Brute-force coverage on the sf0.001 fixture: span STRINGS (not
    * hashes) in >=2 distinct docs, interval-covered positions computed
    * in driver Scala. The operator must agree doc-for-doc (the one
    * mirrored-collision caveat is a hash-vs-string difference; assert
    * equality and let a failure here flag a real collision on this
    * corpus — there is none). */
  test("q132 coverage matches a driver brute force on sf0.001") {
    val docs = sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = SpanDedup.SpanN
    val spanDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, toks) <- docs; i <- 0 to toks.length - n) {
      val s = toks.slice(i, i + n).mkString(" ")
      spanDocs(s) = spanDocs.getOrElse(s, Set.empty) + id
    }
    val dup = spanDocs.filter(_._2.size >= SpanDedup.MinSpanDocs).keySet
    val want = docs.map { case (id, toks) =>
      val covered = new Array[Boolean](toks.length)
      for (i <- 0 to toks.length - n
           if dup.contains(toks.slice(i, i + n).mkString(" ")); j <- i until i + n)
        covered(j) = true
      id -> ((toks.length.toLong, covered.count(identity).toLong))
    }.toMap
    val got = SpanDedup.dupSpanStats(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === want)
  }

  test("q133 strip is consistent with q132 counts and is order-preserving") {
    val stats = SpanDedup.dupSpanStats(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val stripped = SpanDedup.stripDupSpans(spark, sf0001).collect()
    assert(stripped.length === stats.size)
    val texts = sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (r <- stripped) {
      val (nTok, nCov) = stats(r.getLong(0))
      assert(r.getLong(1) === nTok)
      assert(r.getLong(2) === nTok - nCov, s"doc ${r.getLong(0)}")
      // kept tokens appear in original order: clean_text tokens must be a
      // subsequence of the original token stream
      val orig = texts(r.getLong(0)).split(" ", -1)
      val clean = r.getString(3).split(" ", -1).filter(_ => true)
      if (r.getLong(2) == 0L) assert(r.getString(3) === "")
      else {
        var i = 0
        for (t <- clean) {
          while (i < orig.length && orig(i) != t) i += 1
          assert(i < orig.length, s"doc ${r.getLong(0)}: '$t' out of order")
          i += 1
        }
      }
    }
  }

  test("q134 per-source profile re-aggregates q132 exactly") {
    val docs = sources.Tables.documents(spark, sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val stats = SpanDedup.dupSpanStats(spark, sf0001).collect()
    val want = stats.groupBy(r => docs(r.getLong(0))).map { case (src, rs) =>
      src -> ((rs.length.toLong, rs.count(_.getLong(2) > 0).toLong,
        rs.map(_.getLong(1)).sum, rs.map(_.getLong(2)).sum))
    }
    val got = SpanDedup.spanDupBySource(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === want)
  }

  test("constructed corpus: injected shared run is covered, unique doc untouched") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"
    val corpus = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"five $shared six seven eight"),
      (3L, "nine ten eleven twelve thirteen fourteen fifteen"))
      .toDF("doc_id", "text")
    val cov = SpanDedup.coveredTokens(corpus)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), sum($"covered").as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the shared run is 6 tokens = two overlapping 5-gram spans, both in
    // 2 docs -> exactly those 6 positions are covered in docs 1 and 2
    assert(cov(1L) === ((10L, 6L)))
    assert(cov(2L) === ((10L, 6L)))
    assert(cov(3L) === ((7L, 0L)))
  }

  test("q138: shared-span val doc flagged, clean and short docs not, train ignored") {
    import spark.implicits._
    // doc_id mod 10: 0-7 train, 8 val, 9 test (THE q67 assignment)
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // train
      (1L, "one two three four five six"), // train
      (8L, "pre alpha beta gamma delta epsilon post"), // val: shares a 5-gram with doc 0
      (18L, "tiny doc"), // val: < 5 tokens, no spans, counted clean
      (9L, "unique apple banana cherry date fig"), // test: clean
      (19L, "one two three four five six")) // test: exact copy of train doc 1
      .toDF("doc_id", "text")
    val got = SpanDedup.decontaminateOf(corpus).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // val: 2 docs; doc 8 has 3 spans, 1 of which ("alpha..epsilon") is in
    // train; doc 18 contributes no spans but still counts as a doc
    assert(got("val") === ((2L, 1L, 3L, 1L)))
    // test: doc 9's 2 spans miss, doc 19's 2 spans BOTH hit (exact copy)
    assert(got("test") === ((2L, 1L, 4L, 2L)))
    // contam_rate column is n_contaminated / n_docs
    val rates = SpanDedup.decontaminateOf(corpus).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(rates("val") === 0.5 && rates("test") === 0.5)

    // q140 is the complement: clean docs = all eval docs minus the
    // contaminated ones, short docs included with n_spans = 0
    val clean = SpanDedup.cleanEvalSetOf(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(clean === Set(("val", 18L, 0L), ("test", 9L, 2L)))

    // q141 attributes each contaminated doc to ITS train source
    val prov = SpanDedup.contaminationProvenanceOf(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(prov === Set(("val", 8L, 0L, 1L), ("test", 19L, 1L, 2L)))
  }

  test("q141 boilerplate gate: hot spans attribute nothing, rare spans win") {
    import spark.implicits._
    val boiler = "common header alpha beta gamma"
    // 60 train docs all carry the boilerplate span (df 60 > cap 50); one
    // also shares a RARE span with eval doc 8
    val rare = "rare quote delta epsilon zeta"
    val train = (0 until 60).map { i =>
      val id = (i / 8) * 10 + (i % 8) // doc_id mod 10 in 0..7 -> train
      (id.toLong, s"$boiler filler$i" + (if (i == 3) s" $rare" else ""))
    }
    val corpus = (train ++ Seq(
      (8L, s"intro $rare outro x"), // val: rare (attributable) + none of boiler
      (18L, s"pre $boiler post"), // val: ONLY the boilerplate span
      (9L, "totally unrelated words here now"))) // test: clean
      .toDF("doc_id", "text")
    val audit = SpanDedup.decontaminateOf(corpus).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // q138 counts BOTH val docs contaminated (no gate there)
    assert(audit("val") === 2L && audit("test") === 0L)
    val prov = SpanDedup.contaminationProvenanceOf(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // doc 8 attributes to the train doc carrying the rare span (i=3 ->
    // id 3); doc 18's only shared span is boilerplate-hot -> absent
    assert(prov.toSet === Set(("val", 8L, 3L)))
  }

  test("q153 index admission is indistinguishable from q138 inline recomputation") {
    val inline = SpanDedup.decontaminate(spark, sf001)
      .collect().map(_.toString).toSeq
    val indexed = SpanDedup.decontaminateIndexed(spark, sf001)
      .collect().map(_.toString).toSeq
    assert(indexed === inline)
    // and the build's accounting matches a fresh count of the stored set
    val base = SpanDedup.ensureSpanIndex(spark, sf001)
    val stored = spark.read.parquet(s"$base/train_spans").count()
    val built = SpanDedup.spanIndexBuild(spark, sf001).collect().head
    assert(built.getLong(built.fieldIndex("n_spans")) === stored)
  }

  /** Driver winnowing reference: rightmost minimum of each w-window over
    * the positional span hashes; a doc with fewer spans than w winnows
    * its single truncated window. */
  private def winnowRef(toks: Array[String]): Set[(Int, Long)] = {
    val n = SpanDedup.SpanN; val w = SpanDedup.WinnowW
    if (toks.length < n) return Set.empty
    val th = toks.map(foldRef)
    val h = (0 to toks.length - n).map { i =>
      (1 until n).foldLeft(th(i)) { (b, k) => (b * PolyHash.M1 + th(i + k)) % PolyHash.P }
    }.toArray
    val m = h.length
    val starts = if (m < w) Seq(0) else 0 to (m - w)
    starts.map { s =>
      val end = math.min(s + w - 1, m - 1)
      var best = s
      for (j <- s to end) if (h(j) <= h(best)) best = j // rightmost min
      (best + 1, h(best))
    }.toSet
  }

  test("q157 winnowing matches the driver reference on sf0.001") {
    val docs = sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val want = docs.flatMap { case (id, toks) =>
      winnowRef(toks).map { case (pos, fp) => (id, pos, fp) }
    }.toSet
    assert(want.nonEmpty)
    val got = SpanDedup.winnowedFingerprints(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("q157 guarantee: any shared run of SpanN+W-1 tokens shares a fingerprint") {
    val session = spark
    import session.implicits._
    val runLen = SpanDedup.SpanN + SpanDedup.WinnowW - 1
    val shared = (1 to runLen).map(i => s"sh$i").mkString(" ")
    for (off <- Seq(0, 3, 7)) {
      val a = (((1 to off).map(i => s"a$i") :+ shared) ++ (1 to 5).map(i => s"az$i")).mkString(" ")
      val b = (((1 to off + 2).map(i => s"b$i") :+ shared) ++ (1 to 3).map(i => s"bz$i")).mkString(" ")
      val fps = SpanDedup.winnowedFingerprintsOf(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      val fa = fps.filter(_._1 == 1L).map(_._2).toSet
      val fb = fps.filter(_._1 == 2L).map(_._2).toSet
      assert((fa & fb).nonEmpty, s"offset $off: no shared fingerprint")
    }
    // fully-distinct docs share none
    val disj = SpanDedup.winnowedFingerprintsOf(Seq(
        (1L, (1 to 20).map(i => s"x$i").mkString(" ")),
        (2L, (1 to 20).map(i => s"y$i").mkString(" "))).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert((disj.filter(_._1 == 1L).map(_._2).toSet &
      disj.filter(_._1 == 2L).map(_._2).toSet).isEmpty)
  }

  test("q157 short docs: fewer spans than the window still fingerprint once") {
    val session = spark
    import session.implicits._
    // 6 tokens -> 2 spans (m=2 < W): exactly one pick, the rightmost min
    val fps = SpanDedup.winnowedFingerprintsOf(
        Seq((7L, "t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fps.length === 1)
    val want = winnowRef("t1 t2 t3 t4 t5 t6".split(" "))
    assert(fps.map(f => (f._2, f._3)).toSet === want)
    // below SpanN tokens -> no spans, no fingerprints, no crash
    assert(SpanDedup.winnowedFingerprintsOf(
      Seq((8L, "t1 t2 t3")).toDF("doc_id", "text")).count() === 0)
  }

  test("q157 law: operator equals the reference winnow for arbitrary corpora and partitioning") {
    val session = spark
    import session.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small alphabet so repeats (equal-hash ties) are frequent; ""
    // exercises the empty-token fold (double spaces survive split -1)
    val alphabet = Vector("a", "b", "c", "ab", "", "zz")
    val genDoc: Gen[String] = for {
      n <- Gen.choose(0, 24)
      toks <- Gen.listOfN(n, Gen.oneOf(alphabet))
    } yield toks.mkString(" ")
    val genCorpus: Gen[List[(Long, String)]] = for {
      m <- Gen.choose(1, 5)
      docs <- Gen.listOfN(m, genDoc)
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val p = Prop.forAllNoShrink(genCorpus, Gen.choose(1, 4)) { (docs, parts) =>
      val want = docs.flatMap { case (id, t) =>
        winnowRef(t.split(" ", -1)).map { case (pos, fp) => (id, pos, fp) }
      }.toSet
      val got = SpanDedup.winnowedFingerprintsOf(
          docs.toDF("doc_id", "text").repartition(parts))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("q158 candidate pairs match a driver brute force on sf0.001") {
    val docs = sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val fps = docs.flatMap { case (id, toks) =>
      winnowRef(toks).map { case (_, fp) => (id, fp) }
    }.distinct
    val df = fps.groupBy(_._2).map { case (fp, xs) => fp -> xs.length }
    val gated = fps.filter { case (_, fp) => df(fp) <= SpanDedup.MaxFpDF }
    val want = gated.groupBy(_._2).values
      .flatMap { xs =>
        val ids = xs.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
      }
      .groupBy(identity).map { case (p, hits) => (p._1, p._2, hits.size.toLong) }
      .filter(_._3 >= SpanDedup.MinSharedFps).toSet
    val got = SpanDedup.winnowedOverlapPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture should contain at least one candidate pair")
  }

  test("q181 winnow screen: guarantee catches a >=8-token leak; flags a subset of the full audit") {
    val session = spark
    import session.implicits._
    // guarantee case: an eval doc embedding an 8-token run from a train
    // doc MUST be flagged (8 = SpanN + WinnowW - 1, the winnowing
    // detection bound — both sides winnow with the same W)
    val trainDocs = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val tf = SpanDedup.winnowedFingerprintsOf(trainDocs)
      .select($"fp").distinct()
    val evalDocs = Seq(
      (100L, "x1 x2 " + (5 to 12).map(i => s"t$i").mkString(" ") + " x3 x4", "val"),
      (101L, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10", "val") // disjoint, stays clean
    ).toDF("doc_id", "text", "split")
    val out = SpanDedup.winnowScreenOf(tf, evalDocs).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 2L && out(0).getLong(2) === 1L,
      s"expected 1 of 2 flagged: ${out.toSeq}")
    // subset law on the fixture: winnowed fingerprints are a subset of
    // the full positional span set, so the sampled screen can only miss
    // relative to q138's full-index audit, never add false positives
    val fullBySplit = SpanDedup.decontaminate(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val winnowBySplit = SpanDedup.winnowScreen(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(winnowBySplit.keySet === fullBySplit.keySet)
    winnowBySplit.foreach { case (split, flagged) =>
      assert(flagged <= fullBySplit(split),
        s"$split: winnow flagged $flagged > full ${fullBySplit(split)}")
    }
  }

  test("q158 hot-fingerprint gate suppresses boilerplate pairs, keeps genuine overlap") {
    val session = spark
    import session.implicits._
    // 120 identical boilerplate docs (every fp from them has df=120 >
    // MaxFpDF) + 2 docs sharing a distinct genuine run
    val boiler = (1 to 20).map(i => s"bo$i").mkString(" ")
    val gen = (1 to 20).map(i => s"ge$i").mkString(" ")
    val docs = ((1 to 120).map(i => (i.toLong, boiler)) ++ Seq(
      (201L, gen + " " + (1 to 5).map(i => s"p$i").mkString(" ")),
      (202L, gen + " " + (1 to 5).map(i => s"q$i").mkString(" ")))).toDF("doc_id", "text")
    val pairs = SpanDedup.winnowedOverlapPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((201L, 202L)), s"genuine pair missing: $pairs")
    // no pair among the 120 boilerplate docs survives the gate
    assert(pairs.forall { case (a, b) => a > 120L && b > 120L }, s"boilerplate leaked: $pairs")
  }

  test("q229 method card: each row invisible vs its standalone screen; missed/ratio accounting exact") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // the q138 constructed corpus (doc_id mod 10: 0-7 train, 8 val, 9 test)
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "one two three four five six"),
      (8L, "pre alpha beta gamma delta epsilon post"),
      (18L, "tiny doc"),
      (9L, "unique apple banana cherry date fig"),
      (19L, "one two three four five six"))
      .toDF("doc_id", "text")
    val card = SpanDedup.decontamMethodCardOf(corpus).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getLong(7), r.getLong(8)))).toMap
    assert(card.size === 4)
    // invisibility: full rows ≡ q138's roll-up on the same corpus
    val full = SpanDedup.decontaminateOf(corpus).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // winnowed rows ≡ q181's screen core with the train-split index
    val trainFps = SpanDedup.winnowedFingerprintsOf(
      corpus.filter($"doc_id" % 10 < 8)).select($"fp").distinct()
    val evalD = corpus.filter($"doc_id" % 10 >= 8)
      .withColumn("split", when($"doc_id" % 10 === 8, "val").otherwise("test"))
    val win = SpanDedup.winnowScreenOf(trainFps, evalD).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // index sizes recomputed directly from the shared span/fp kernels
    val fullIdx = corpus.filter($"doc_id" % 10 < 8)
      .select(explode(array_distinct(expr("graft_spans_poly(text)"))).as("s"))
      .distinct().count()
    val winIdx = trainFps.count()
    Seq("val", "test").foreach { split =>
      val (fIdx, fRatio, fDocs, fFlag, _, fMiss, fGuar) = card(("full_span", split))
      assert((fDocs, fFlag) === full(split), s"full/$split")
      assert(fIdx === fullIdx && fRatio === 1.0 && fMiss === 0L && fGuar === 5L)
      val (wIdx, wRatio, wDocs, wFlag, wRate, wMiss, wGuar) = card(("winnowed", split))
      assert((wDocs, wFlag) === win(split), s"winnow/$split")
      assert(wIdx === winIdx && wGuar === 8L)
      assert(wRatio === BigDecimal(winIdx.toDouble / fullIdx)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // the subset law, priced: missed = full's catch minus winnow's, >= 0
      assert(wMiss === full(split)._2 - wFlag && wMiss >= 0L, s"missed/$split")
      assert(wRate === wFlag.toDouble / wDocs)
    }
    // the sampled index is strictly smaller on multi-window train docs
    assert(winIdx < fullIdx, s"winnow index $winIdx !< full $fullIdx")
  }
}
