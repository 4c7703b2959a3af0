package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Constructed-corpus checks for the round-7 curation operators
  * (q113/q114/q116/q117): hand-computable fixtures pin the semantics the
  * DuckDB oracle then re-verifies at sf0.01.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
      schema)
  }

  test("q113 collapses runs to 2, keeps legitimate doubles, preserves order") {
    val d = docs(
      (1L, "en", "ha ha ha ha ha end"),   // run of 5 -> 2
      (2L, "en", "a b a b a b"),           // alternation: no run > 1, untouched
      (3L, "en", "x x y y y x"),           // runs 2,3,1 -> 2,2,1
      (4L, "en", "solo"))
    val out = Curation.collapseRepeatsOf(d).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) === ((6, 3L, "ha ha end")))
    assert(out(2L) === ((6, 6L, "a b a b a b")))
    assert(out(3L) === ((6, 5L, "x x y y x")))
    assert(out(4L) === ((1, 1L, "solo")))
  }

  test("q114 weights are deterministic, repeat-sensitive, and mean-scored") {
    val d = docs((1L, "en", "tok tok"), (2L, "en", "tok"), (3L, "en", "other"))
    val out = Curation.qualityClassifierOf(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5))))
      .toMap
    val (n1, w1, s1, k1) = out(1L)
    val (n2, w2, s2, k2) = out(2L)
    // same token twice = exactly twice the single-occurrence sum; the
    // mean score is identical; keep agrees with the sum's sign
    assert(n1 === 2L && n2 === 1L)
    assert(w1 === 2 * w2)
    assert(s1 === s2 && s2 === w2.toDouble)
    assert(k1 === k2 && k2 === (w2 > 0))
    // weights live in the documented range
    Seq(w2, out(3L)._2).foreach(w => assert(w >= -1000L && w <= 1000L))
    // distinct tokens map to distinct weights here (not a collision test,
    // just a guard that the hash actually varies with the input)
    assert(w2 !== out(3L)._2)
  }

  test("q116 keeps the top diversity half per language, ties broken by doc_id") {
    val d = docs(
      (1L, "en", "a a a a"),     // diversity 0.25
      (2L, "en", "a b a b"),     // 0.5
      (3L, "en", "a b c d"),     // 1.0
      (4L, "en", "a b c c"),     // 0.75
      (5L, "de", "x x"),         // 0.5  de rank 0/1 -> dropped
      (6L, "de", "x y"))         // 1.0  de rank 1/1 -> kept
    val kept = Curation.qualityFilterPerLangOf(d).collect()
      .map(r => (r.getLong(0), r.getDouble(5))).toMap
    // en percent_ranks: 0, 1/3, 2/3, 1 for docs 1,2,4,3 -> keep pr >= 0.5
    assert(kept.keySet === Set(3L, 4L, 6L))
    assert(kept(3L) === 1.0 && kept(4L) === 2.0 / 3 && kept(6L) === 1.0)
  }

  test("q117 fits the exact slope on a constructed two-point distribution") {
    // freq 8 at rank 1, freq 4,4 at ranks 2,3 (tie broken by token name);
    // regression over {(ln r, ln cnt)}: slope from the closed form
    val d = docs((1L, "en", Seq.fill(8)("top").mkString(" ") + " " +
      Seq.fill(4)("mid").mkString(" ") + " " + Seq.fill(4)("mad").mkString(" ")))
    val r = Curation.zipfStatsOf(d).collect()(0)
    assert(r.getAs[Long]("vocab_size") === 3L)
    assert(r.getAs[Long]("total_tokens") === 16L)
    assert(r.getAs[Long]("head_n") === 3L)
    assert(r.getAs[Double]("top100_frac") === 1.0)
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(8.0, 4.0, 4.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-6)
  }

  test("q115 projects a unit basis vector onto its matrix column") {
    // input e_i: the projection output j is exactly R(j, i), the LCG
    // matrix entry, rounded to 6 — checked against the formula in Scala
    val i = 7
    val vec = Array.fill(Curation.RpInDim)(0.0f).updated(i, 1.0f)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val e = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, vec.toSeq)), 1), schema)
    val out = Curation.randomProjectionOf(e).collect()(0)
    (0 until Curation.RpOutDim).foreach { j =>
      val k = j.toLong * Curation.RpInDim + i
      val r = ((k * Curation.RpMult + Curation.RpAdd)
        % Curation.RpMod % Curation.RpRange - 1000L).toDouble / 1000.0
      val got = out.getAs[Double](f"p$j%02d")
      assert(math.abs(got - BigDecimal(r).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"j=$j")
    }
  }

  test("q118 finds exactly the true heavy hitters past the sketch's capacity") {
    // vocabulary (1 heavy + 600 rare) is 3× the sketch capacity (200), so
    // Misra-Gries decrements MUST fire — the candidate set is lossy, but
    // the guarantee keeps the heavy token and the recount makes the final
    // output exact. heavy: 300 of 900 tokens (33% > 1%); rares: 1 each
    // (0.11% each, below threshold).
    val heavyText = Seq.fill(300)("heavy").mkString(" ")
    val rareText = (0 until 600).map(i => s"rare$i").mkString(" ")
    val d = docs((1L, "en", heavyText), (2L, "en", rareText))
    val out = Curation.heavyHittersOf(d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("heavy", 300L)))
    // merge-order robustness: many tiny partitions -> same final rows
    val out2 = Curation.heavyHittersOf(d.repartition(13)).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out2.toSeq === Seq(("heavy", 300L)))
  }

  test("q118 survives a >64KB token (buffer serde is length-prefixed, not writeUTF)") {
    // writeUTF caps modified-UTF-8 keys at 64KB: one space-free run past
    // that (minified JSON, base64 spam) becoming a counter key would
    // crash the whole job at shuffle-serialize time under the old serde
    val giant = "x" * 70000
    val d = docs((1L, "en", s"$giant $giant a"), (2L, "en", "a b c"))
      .repartition(2) // force partial buffers through serialize/merge
    val out = Curation.heavyHittersOf(d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out(giant) === 2L) // 2 of 6 tokens = 33% > 1%
    assert(out("a") === 2L)
  }

  test("q118 candidate sketch is a superset of all true heavy hitters (fixture)") {
    import org.apache.spark.sql.functions.{col, explode, expr, split}
    val spark2 = spark
    graft.functions.GraftFunctions.ensureRegistered(spark2)
    val tok = sources.Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("tok"))
    val cands = tok.agg(expr("graft_heavy_hitters(tok)").as("c"))
      .selectExpr("explode(c) AS tok").collect().map(_.getString(0)).toSet
    assert(cands.size <= graft.functions.HeavyHitters.Capacity)
    val trueHeavy = Curation.heavyHitters(spark, sf001).collect()
      .map(_.getString(0)).toSet
    assert(trueHeavy.nonEmpty, "fixture should have >1% tokens")
    assert(trueHeavy.subsetOf(cands), s"missing: ${trueHeavy -- cands}")
  }

  test("q119 bounded-state rank/deciles match the single-window ntile ground truth") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions.{col, ntile, row_number}
    // 23 docs (n % 10 = 3) exercises the NTILE remainder branch: the
    // first 3 deciles get 3 rows, the rest 2. Distinct texts give
    // distinct surprisals; a few duplicated texts create rank ties broken
    // by doc_id.
    val rows = (1L to 23L).map { i =>
      val text = if (i <= 3) "tie tie alpha" // 3-way surprisal tie
      else (0 until i.toInt).map(j => s"w${(i + j) % 17}").mkString(" ")
      (i, "en", text)
    }
    val d = docs(rows: _*)
    val mine = Curation.curriculumOrderOf(d)
      .select("doc_id", "rank", "decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val truth = graft.operators.TextOps.lmSurprisalOf(d)
      .withColumn("rank", row_number().over(
        W.orderBy(col("avg_surprisal_nats"), col("doc_id"))).cast("long"))
      .withColumn("decile", ntile(Curation.CurriculumTiles).over(
        W.orderBy(col("avg_surprisal_nats"), col("doc_id"))).cast("long"))
      .select("doc_id", "rank", "decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mine === truth)
    // rank invariance under input partitioning
    val mine7 = Curation.curriculumOrderOf(d.repartition(7))
      .select("doc_id", "rank", "decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mine7 === truth)
  }

  test("q120 weights follow sqrt(tokens), tiny sources hit the epoch cap") {
    val big = (1L to 16L).map(i => (i, "big", Seq.fill(100)("w").mkString(" ")))
    val tiny = Seq((100L, "tiny", "x")) // 1 token: target share >> size -> cap
    val d = docs((big ++ tiny): _*).withColumnRenamed("lang", "source")
    val out = Curation.epochPlanOf(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    val (bigTok, bigW, bigE) = out("big")
    val (tinyTok, tinyW, tinyE) = out("tiny")
    assert(bigTok === 1600L)
    assert(tinyTok === 1L)
    // sqrt weights: 40 vs 1 -> shares 40/41, 1/41
    assert(math.abs(bigW - 40.0 / 41) < 1e-6)
    assert(math.abs(tinyW - 1.0 / 41) < 1e-6)
    // tiny source's target (1601/41 ≈ 39 tokens) is 39x its size -> capped
    assert(tinyE === Curation.EpochCap)
    assert(bigE < Curation.EpochCap)
  }

  test("q121 KL is zero for an identically-distributed source, positive for drift") {
    val d = docs(
      (1L, "en", "a b c d"), (2L, "en", "a b c d"), // src en
      (3L, "de", "a b c d"),                        // same distribution
      (4L, "fr", "z z z z"))                        // divergent
      .withColumnRenamed("lang", "source")
    val out = Curation.sourceDriftKlOf(d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // en and de share the per-source distribution {a,b,c,d: 1/4 each};
    // corpus has z mass, so even they drift a little — but equally
    assert(out("en") === out("de"))
    assert(out("fr") > out("en"))
    // one-source corpus: KL must be exactly 0
    val solo = Curation.sourceDriftKlOf(
      docs((1L, "en", "a b b c")).withColumnRenamed("lang", "source"))
      .collect()(0).getDouble(2)
    assert(solo === 0.0)
  }

  test("q115 kernel fast-path quantization equals the BigDecimal reference") {
    import java.math.{BigDecimal => JBD}
    val k = graft.functions.RandomProjectKernel
    def ref(d: Double): Long = k.quantize12(JBD.valueOf(d))
    val rnd = new scala.util.Random(42)
    // random magnitudes across the float-embedding range, plus
    // adversarial values engineered to sit ON and NEAR the .5 decimal
    // rounding boundary (these must take the slow path and still agree)
    val randoms = Seq.fill(200000) {
      val mag = math.pow(10.0, rnd.nextInt(10) - 6) // 1e-6 .. 1e3
      (rnd.nextDouble() * 2 - 1) * mag
    }
    val adversarial = Seq(0.5e-12, 1.5e-12, 2.5e-12, -0.5e-12, -1.5e-12,
      1.0000000000005, -1.0000000000005, 0.9999999999995,
      123.4567890123455, 1e-13, -1e-13, 0.0, 1e3, -1e3)
    (randoms ++ adversarial).foreach { d =>
      assert(k.quantize12(d) === ref(d), s"d=$d")
    }
  }

  test("q113/q116/q117 run on the fixture with sane global properties") {
    val collapsed = Curation.collapseRepeats(spark, sf0001)
    // trimming never grows a doc and never drops a doc
    assert(collapsed.filter("n_kept > n_tokens").count() === 0L)
    assert(collapsed.count() ===
      sources.Tables.documents(spark, sf0001).count())
    val gate = Curation.qualityFilterPerLang(spark, sf0001)
    // the gate keeps roughly half of each language (>= floor(n/2) rows
    // kept means pr >= 0.5 covered the upper half inclusive)
    val perLang = gate.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langTotals = sources.Tables.documents(spark, sf0001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (l, k) =>
      assert(k <= langTotals(l) / 2 + 1, s"lang $l kept $k of ${langTotals(l)}")
    }
    val z = Curation.zipfStats(spark, sf0001).collect()(0)
    // natural-ish corpus: negative slope, head mass below 1
    assert(z.getAs[Double]("zipf_slope") < 0.0)
    val frac = z.getAs[Double]("top100_frac")
    assert(frac > 0.0 && frac <= 1.0)
  }

  test("q160 funnel stages match the constituent operators, monotonically") {
    val session = spark
    import session.implicits._
    val rows = Curation.curationFunnel(spark, sf0001).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3))
    val byStage = rows.map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // independent recomputation from the operators each stage names
    val text = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val q = graft.operators.TextOps.qualityScores(spark, sf0001)
      .select("doc_id", "quality", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(byStage(0) === ((q.length.toLong, q.map(_._3.toLong).sum)))
    val gated = q.filter(_._2 >= Curation.FunnelQualityMin)
    assert(byStage(1) === ((gated.length.toLong, gated.map(_._3.toLong).sum)))
    val sv = gated.groupBy(d => text(d._1)).values
      .map(_.minBy(_._1)).toSeq.sortBy(_._1)
    assert(byStage(2) === ((sv.length.toLong, sv.map(_._3.toLong).sum)))
    val drops = graft.operators.Dedup.neardupClustersOf(
        sv.map(d => (d._1, text(d._1))).toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter { case (c, d) => c != d }
      .map(_._2).toSet
    val kept3 = sv.filterNot(d => drops.contains(d._1))
    assert(byStage(3) === ((kept3.length.toLong, kept3.map(_._3.toLong).sum)))
    // the funnel only ever shrinks
    (0 to 2).foreach { s =>
      assert(byStage(s)._1 >= byStage(s + 1)._1)
      assert(byStage(s)._2 >= byStage(s + 1)._2)
    }
  }

  // ---- q170: source-interleaved training order ----------------------------

  test("q170 round-robins sources and degrades gracefully as they exhaust") {
    val session = spark
    import session.implicits._
    val d = Seq(
      ("s1", 1L), ("s1", 2L), ("s1", 3L),
      ("s2", 4L), ("s2", 5L),
      ("s3", 6L)).toDF("source", "doc_id")
    val out = Curation.interleavedOrderOf(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, "s1", 1L), (1L, "s2", 4L), (1L, "s3", 6L),
      (2L, "s1", 2L), (2L, "s2", 5L),
      (3L, "s1", 3L)))
    // fixture law: while every source still has docs, the k-th cycle
    // contains each source exactly once
    val fx = Curation.interleavedOrder(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nSources = fx.map(_._2).distinct.length
    val minSize = fx.groupBy(_._2).values.map(_.length).min
    (1 to minSize).foreach { k =>
      val cycle = fx.filter(_._1 == k.toLong).map(_._2)
      assert(cycle.length === nSources && cycle.distinct.length === nSources, s"cycle $k")
    }
  }

  // ---- q169: classifier lift audit ----------------------------------------

  test("q169 bins partition the corpus and conserve the gate counts") {
    val out = Curation.classifierLift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = graft.sources.Tables.documents(spark, sf0001).count()
    val nGood = graft.operators.TextOps.qualityScores(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("quality")
        >= Curation.FunnelQualityMin).count()
    assert(out.map(_._2).sum === nDocs)  // every doc lands in exactly one bin
    assert(out.map(_._3).sum === nGood)  // gate decisions conserved
    out.foreach { case (bin, n, good, rate) =>
      assert(bin >= 0L && bin < Curation.LiftBins)
      assert(good <= n && rate >= 0.0 && rate <= 1.0)
    }
    // the audit is deterministic
    val again = Curation.classifierLift(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq === out.toSeq)
  }

  // ---- q161/q162: DSIR importance weights + resampling -------------------

  /** Driver mirror of the hashed-bigram feature map (131/2^31−1 portable
    * family, 512 buckets). */
  private def dsirBuckets(text: String): Seq[Long] = {
    val th = text.split(" ", -1).map(w =>
      graft.functions.PolyHash.foldToken(w, graft.functions.PolyHash.M1))
    if (th.length < 2) Seq.empty
    else (0 until th.length - 1).map(i => (th(i) * 131L + th(i + 1)) % 2147483647L % 512L)
  }

  private def r6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver mirror of dsirPerDoc: per-doc (n_feats, unrounded decimal
    * term sum) under the Laplace-smoothed log-ratio weights. */
  private def dsirRef(corpus: Seq[(Long, String)], target: Set[Long])
      : Map[Long, (Long, BigDecimal)] = {
    val perDoc = corpus.map { case (id, t) =>
      id -> dsirBuckets(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val cr = perDoc.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val ct = perDoc.filter(kv => target(kv._1)).values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nr = cr.values.sum
    val nt = ct.values.sum
    val lr = cr.map { case (b, cn) =>
      val tn = ct.getOrElse(b, 0L)
      b -> math.log(((tn + 1).toDouble * (nr + 512L)) / ((cn + 1) * (nt + 512L)))
    }
    perDoc.map { case (id, counts) =>
      val s = counts.toSeq.map { case (b, n) =>
        BigDecimal.valueOf(n * lr(b)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      id -> ((counts.values.sum, s))
    }
  }

  test("q161 weights are identically zero when target = corpus, equal for equal text") {
    val session = spark
    import session.implicits._
    val corpus = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha beta gamma delta"), // exact twin of 1
      (3L, "en", "echo foxtrot golf hotel india"),
      (4L, "en", "one"), // single token: no features
      (5L, "en", "kilo lima mike november"))
    val d = docs(corpus: _*)
    val allIds = corpus.map(_._1).toDF("doc_id")
    val out = Curation.dsirLogWeightsOf(d, allIds).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // p_target == p_raw bucket-for-bucket => every log-ratio is ln(1) = 0
    assert(out.values.forall(_._2 === 0.0))
    assert(out(4L) === ((0L, 0.0)))
    assert(out(1L)._1 === 3L) // 4 tokens -> 3 bigram features
    assert(out(1L) === out(2L))
  }

  test("q161 matches the driver reference and orders target-like above raw-like") {
    val session = spark
    import session.implicits._
    val corpus = Seq(
      (1L, "en", "alpha beta alpha beta alpha beta"),
      (2L, "en", "alpha beta alpha beta gamma delta"),
      (3L, "en", "gamma delta gamma delta gamma delta"),
      (4L, "en", "gamma delta epsilon zeta gamma delta"))
    val target = Set(1L, 2L)
    val out = Curation.dsirLogWeightsOf(docs(corpus: _*),
        target.toSeq.toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val ref = dsirRef(corpus.map(c => (c._1, c._3)), target)
    corpus.foreach { case (id, _, _) =>
      assert(out(id)._1 === ref(id)._1, s"n_feats doc $id")
      assert(out(id)._2 === r6(ref(id)._2.toDouble), s"log_w doc $id")
    }
    // the pure-target doc outscores the pure-raw doc
    assert(out(1L)._2 > 0.0 && out(3L)._2 < out(1L)._2)
  }

  /** Driver mirror of the q162 Gumbel grid (offset +59 family, 2^20). */
  private def gumbelOf(id: Long): Double = {
    val uk = (((id + 59L) % 1000003L + 1000003L) % 1000003L
      * 2654435761L % 1048576L + 1048576L) % 1048576L
    -math.log(-math.log((uk + 0.5) / 1048576.0))
  }

  test("q162 selection is exactly the driver's Gumbel-top-k, deterministically") {
    val session = spark
    import session.implicits._
    val corpus = (1L to 40L).map(i =>
      (i, "en", if (i % 2 == 0) "alpha beta gamma delta" else s"tok$i blob$i mix$i"))
    val target = corpus.collect { case (i, _, _) if i % 2 == 0 => i }.toSet
    val d = docs(corpus: _*)
    val tdf = target.toSeq.toDF("doc_id")
    val out = Curation.dsirSelectOf(d, tdf, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(out.length === 10)
    val ref = dsirRef(corpus.map(c => (c._1, c._3)), target)
    val expect = ref.toSeq.map { case (id, (_, s)) =>
      (id, r6(s.toDouble), r6(s.toDouble + gumbelOf(id)))
    }.sortBy { case (id, _, sc) => (-sc, id) }.take(10)
    assert(out.toSeq === expect)
    // deterministic: a second run returns the identical selection
    val again = Curation.dsirSelectOf(d, tdf, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(again.toSeq === out.toSeq)
  }

  // ---- q163: per-doc rejection audit -------------------------------------

  test("q163 statuses partition the corpus and reconcile with the q160 funnel") {
    val audit = Curation.rejectionAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val funnel = Curation.curationFunnel(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // exactly one row per raw doc
    assert(audit.length.toLong === funnel(0))
    assert(audit.map(_._1).distinct.length === audit.length)
    // per-status counts are the funnel's stage deltas
    val by = audit.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(by.getOrElse("dropped_quality", 0L) === funnel(0) - funnel(1))
    assert(by.getOrElse("dropped_exact_dup", 0L) === funnel(1) - funnel(2))
    assert(by.getOrElse("dropped_near_dup", 0L) === funnel(2) - funnel(3))
    assert(by.getOrElse("kept", 0L) === funnel(3))
    // kept_by is present exactly for the duplicate drops, and names a doc
    // that won its own stage: an exact-dup's keeper survives to the
    // near-dup stage (status kept or dropped_near_dup); a near-dup's
    // cluster representative survives the whole funnel
    val status = audit.map(a => a._1 -> a._2).toMap
    audit.foreach { case (id, st, kb) =>
      assert(kb.isDefined === (st == "dropped_exact_dup" || st == "dropped_near_dup"), s"doc $id")
      kb.foreach(k => assert(k != id))
      if (st == "dropped_exact_dup")
        assert(Set("kept", "dropped_near_dup")(status(kb.get)), s"doc $id keeper")
      if (st == "dropped_near_dup")
        assert(status(kb.get) === "kept", s"doc $id rep")
    }
    // at least the kept class is populated on the fixture
    assert(by("kept") > 0L)
  }

  // ---- q173/q174: steady-state (artifact-backed) funnel -------------------

  test("q173/q174 steady-state semantics on a corpus WITH exact and near duplicates") {
    val session = spark
    import session.implicits._
    // the fixture is duplicate-free, so the interesting paths are pinned
    // on a constructed corpus via the shared cores: docs 0/1 share a text
    // (keeper 0), 2/3 are near-dups (rep 2), 4 fails quality, 6/7 share a
    // text whose keeper 6 is ITSELF near-dup-purged (rep 5) — stage-local
    // provenance must still name 6 as 7's keeper
    val quality = Seq(
      (0L, 0.9, 10L), (1L, 0.9, 10L), (2L, 0.8, 10L), (3L, 0.8, 10L),
      (4L, 0.2, 10L), (5L, 0.7, 10L), (6L, 0.9, 10L), (7L, 0.9, 10L)
    ).toDF("doc_id", "quality", "n_tokens")
    val keys = Seq(
      (0L, "A"), (1L, "A"), (2L, "B"), (3L, "C"),
      (4L, "D"), (5L, "E"), (6L, "F"), (7L, "F")
    ).toDF("doc_id", "tkey")
    val survivorIds = Seq(0L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val svLabels = Seq((2L, 2L), (3L, 2L), (5L, 5L), (6L, 5L)).toDF("node", "label")

    val audit = Curation.steadyAuditFrom(
        quality.select($"doc_id", $"quality"), keys, survivorIds, svLabels)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(audit === Seq(
      (0L, "kept", None),
      (1L, "dropped_exact_dup", Some(0L)),
      (2L, "kept", None),
      (3L, "dropped_near_dup", Some(2L)),
      (4L, "dropped_quality", None),
      (5L, "kept", None),
      (6L, "dropped_near_dup", Some(5L)),
      (7L, "dropped_exact_dup", Some(6L))))

    val funnel = Curation.steadyFunnelFrom(quality, survivorIds, svLabels).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(funnel === Seq(
      (0, "raw", 8L, 80L),
      (1, "exact_dedup", 6L, 60L),
      (2, "neardup_purge", 4L, 40L),
      (3, "quality_gate", 3L, 30L)))
  }

  test("q174 null-text and null-quality docs reconcile with the funnel (out-of-contract rows)") {
    val session = spark
    import session.implicits._
    // docs 0/1 share a NULL text: groupBy(tkey) makes them ONE keep-first
    // group (survivor 0), so the audit's keeper join must be null-safe —
    // doc 1 is dropped_exact_dup, not silently 'kept'. Doc 2 has null
    // quality: the gate filter drops it, so the audit must too.
    val quality = Seq((0L, Some(0.9), 10L), (1L, Some(0.9), 10L),
      (2L, None, 10L), (3L, Some(0.8), 10L))
      .toDF("doc_id", "quality", "n_tokens")
    val keys = Seq((0L, "NULLGRP"), (1L, "NULLGRP"), (2L, "C"), (3L, "D"))
      .toDF("doc_id", "tkey") // callers sentinel null keys to one group
    val survivorIds = Seq(0L, 2L, 3L).toDF("doc_id")
    val svLabels = Seq.empty[(Long, Long)].toDF("node", "label")
    val audit = Curation.steadyAuditFrom(
        quality.select($"doc_id", $"quality"), keys, survivorIds, svLabels)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(audit === Seq((0L, "kept"), (1L, "dropped_exact_dup"),
      (2L, "dropped_quality"), (3L, "kept")))
    val funnel = Curation.steadyFunnelFrom(quality, survivorIds, svLabels).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // stage deltas == per-status counts, including the null rows
    assert(funnel(0) - funnel(1) === 1L) // exact dedup drops doc 1
    assert(funnel(2) - funnel(3) === 1L) // quality gate drops doc 2
  }

  test("q174 reconciles with q173 stage deltas on the fixture (artifact path)") {
    val audit = Curation.rejectionAuditFromArtifact(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val funnel = Curation.funnelFromArtifact(spark, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(audit.length.toLong === funnel(0))
    val by = audit.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(by.getOrElse("dropped_exact_dup", 0L) === funnel(0) - funnel(1))
    assert(by.getOrElse("dropped_near_dup", 0L) === funnel(1) - funnel(2))
    assert(by.getOrElse("dropped_quality", 0L) === funnel(2) - funnel(3))
    assert(by.getOrElse("kept", 0L) === funnel(3))
    assert(by("kept") > 0L)
  }
}
