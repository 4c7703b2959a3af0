package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHash, MinHashAgg, SimHashAgg}

/** Unit tests for the custom Catalyst surface: CosineSimilarity
  * (codegen + interpreted parity), MinHashAgg (order/partition
  * invariance, serde roundtrip), SimHashAgg (weighting + sign packing).
  */
class ExpressionSpec extends AnyFunSuite with SparkSpec {

  test("graft_cosine: known values, self-similarity, orthogonality") {
    val session = spark
    import session.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal
      (Array(1.0, 2.0), Array(1.0, 2.0)),   // identical
      (Array(1.0, 0.0), Array(-1.0, 0.0)),  // opposite
      (Array(3.0, 4.0), Array(4.0, 3.0)))   // cos = 24/25
      .toDF("a", "b")
    val got = df.select(expr("graft_cosine(a, b)")).as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-15)
    assert(math.abs(got(1) - 1.0) < 1e-15)
    assert(math.abs(got(2) + 1.0) < 1e-15)
    assert(math.abs(got(3) - 0.96) < 1e-15)
  }

  test("graft_cosine: codegen and interpreted paths agree") {
    val session = spark
    import session.implicits._
    val df = sources.Tables.embeddings(spark, sf0001).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = df.as("x").crossJoin(df.as("y"))
      .select(expr("graft_cosine(x.v, y.v)").as("sim"))
    val fromCodegen = pairs.as[Double].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = pairs.as[Double].collect()
      assert(fromCodegen.toSeq === interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("graft_random_project: codegen and interpreted paths agree") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // rebuilt per phase: a Dataset caches its executed plan at first
    // action, so reusing one instance would compare codegen to itself
    def run() = sources.Tables.embeddings(spark, sf0001).limit(50)
      .select((0 until graft.functions.RandomProjectKernel.OutDim)
        .map(j => expr(s"graft_random_project(embedding, $j)").as(s"p$j")): _*)
      .collect().map(_.toSeq)
    val fromCodegen = run()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = run()
      assert(fromCodegen.toSeq === interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("graft_cosine: null elements are 0.0 — counterpart keeps its norm") {
    val session = spark
    import session.implicits._
    // a = (1, NULL, 2), b = (1, 3, 2) under null=0.0:
    // dot = 1 + 0 + 4 = 5; |a| = sqrt(5); |b| = sqrt(14)
    val expected = 5.0 / (math.sqrt(5.0) * math.sqrt(14.0))
    val df = Seq(1).toDF("i")
      .select(expr("array(1.0D, CAST(NULL AS DOUBLE), 2.0D)").as("a"),
              expr("array(1.0D, 3.0D, 2.0D)").as("b"))
      .select(expr("graft_cosine(a, b)").as("sim"))
    val fromCodegen = df.as[Double].head()
    assert(math.abs(fromCodegen - expected) < 1e-15)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.as[Double].head()
      assert(interpreted === fromCodegen)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("graft_cosine accepts float arrays via implicit cast") {
    val session = spark
    import session.implicits._
    val one = sources.Tables.embeddings(spark, sf0001).limit(1)
      .select(expr("graft_cosine(embedding, embedding)").as("s")).as[Double].head()
    assert(math.abs(one - 1.0) < 1e-12)
  }

  test("graft_minhash: invariant to row order and partitioning") {
    val session = spark
    import session.implicits._
    val vals = (1L to 500L).map(x => x * 7919L % MinHash.P)
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(expr("graft_minhash(v)").as("s")).as[Seq[Long]].head()
    val a = sig(vals.toDF("v").repartition(13))
    val b = sig(scala.util.Random.shuffle(vals).toDF("v").repartition(1))
    assert(a === b)
    assert(a.length === MinHash.NumHashes)
    // every slot is a true minimum of the hash family over the input
    val expected = (0 until MinHash.NumHashes).map { i =>
      vals.map(x => (MinHash.coeffA(i) * x + MinHash.coeffB(i)) % MinHash.P).min
    }
    assert(a === expected)
  }

  test("graft_shingles matches the declarative formulation bit-for-bit") {
    val session = spark
    import session.implicits._
    val docs = sources.Tables.documents(spark, sf0001).limit(100)
      .select($"doc_id", $"text")
      .union(Seq((90001L, "a b"), (90002L, "one two three"),
        (90003L, "x y z x y z")).toDF("doc_id", "text"))
    val fast = docs.select($"doc_id", expr("graft_shingles(text)").as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val slow = docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", expr(
        "CASE WHEN size(toks) < 3 THEN array() ELSE " +
          "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> xxhash64(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) END").as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    fast.foreach { case (id, s) =>
      assert(s === slow(id), s"doc $id")
    }
    assert(fast(90001L).isEmpty) // fewer than 3 tokens → no shingles
    assert(fast(90003L).length === 3) // "x y z","y z x","z x y" — dup collapsed
  }

  test("MinHashAgg/SimHashAgg buffer serde roundtrips") {
    val one = org.apache.spark.sql.catalyst.expressions.Literal(1L)
    val m = new MinHashAgg(one)
    val buf = Array.tabulate(MinHash.NumHashes)(i => i * 1234567L)
    assert(m.deserialize(m.serialize(buf)).toSeq === buf.toSeq)
    val s = new SimHashAgg(one)
    val sbuf = Array.tabulate(64)(i => (i - 32).toLong)
    assert(s.deserialize(s.serialize(sbuf)).toSeq === sbuf.toSeq)
  }

  test("graft_simhash: identical multisets agree, disjoint ones differ") {
    val session = spark
    import session.implicits._
    def sig(rows: Seq[String]): Long =
      rows.toDF("tok").withColumn("h", xxhash64(col("tok")))
        .agg(expr("graft_simhash(h)")).as[Long].head()
    val a = sig(Seq("spark", "join", "spark", "scan"))
    val b = sig(scala.util.Random.shuffle(Seq("spark", "spark", "join", "scan")))
    assert(a === b) // multiset-identical → identical signature
    val c = sig(Seq("completely", "different", "words", "here"))
    assert(java.lang.Long.bitCount(a ^ c) > 0)
  }

  test("graft_nfc: composes, passes normalized text through, null-safe") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val session = spark
    import session.implicits._
    val decomposed = "e\u0301te\u0301"  // NFD rendering of "\u00e9t\u00e9": 5 chars
    val df = Seq(decomposed).toDF("t")
      .select(expr("graft_nfc(t)").as("n"), expr("CAST(NULL AS STRING)").as("z"))
      .select(col("n"), length(col("n")).as("len"), expr("graft_nfc(z)").as("nz"))
    val r = df.collect().head
    assert(r.getString(0) === "\u00e9t\u00e9" && r.getInt(1) === 3)
    assert(r.isNullAt(2))
    // already-NFC input comes back identical
    assert(Seq("plain ascii", "\u00e9t\u00e9").toDF("t")
      .select(expr("graft_nfc(t) = t")).as[Boolean].collect().forall(identity))
  }

  test("graft_nfc: codegen and interpreted paths agree") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val session = spark
    import session.implicits._
    // decomposed e-acute, composed e-acute, decomposed a-ring, ascii,
    // empty, and an NFC-invariant compatibility ligature (\ufb03 only
    // changes under NFKC)
    val df = Seq("e\u0301", "\u00e9", "a\u030a", "plain", "", "f\ufb03")
      .toDF("t").select(expr("graft_nfc(t)").as("n"))
    val fromCodegen = df.as[String].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.as[String].collect()
      assert(fromCodegen.toSeq === interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("graft_nfc_lower: simple 1:1 mapping, locale-independent, composes first") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val session = spark
    import session.implicits._
    // ascii, decomposed E-acute (compose THEN lower), dotted capital I
    // (U+0130: Java's FULL mapping gives i + combining dot = 2 codepoints;
    // the SIMPLE mapping both this kernel and DuckDB's utf8proc use gives
    // plain 'i' = 1), and sharp s (no 1:M 'ss' expansion under simple)
    val got = Seq("MiXeD", "E\u0301te\u0301", "\u0130", "STRA\u00dfE")
      .toDF("t").select(expr("graft_nfc_lower(t)").as("n"), length(col("n")))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got(0) === (("mixed", 5)))
    assert(got(1) === (("\u00e9t\u00e9", 3)))
    assert(got(2) === (("i", 1)))
    assert(got(3) === (("stra\u00dfe", 6)))
  }

  test("graft_nfc_lower: codegen and interpreted paths agree") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val session = spark
    import session.implicits._
    val df = Seq("e\u0301", "\u00c9", "A\u030a", "PLAIN", "", "\u0130\u0131")
      .toDF("t").select(expr("graft_nfc_lower(t)").as("n"))
    val fromCodegen = df.as[String].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.as[String].collect()
      assert(fromCodegen.toSeq === interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("graft_deflate_len: codegen and interpreted paths agree; null-safe") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val session = spark
    import session.implicits._
    // rebuilt per phase: a Dataset caches its executed plan at first
    // action, so reusing one instance would compare codegen to itself
    def run() = Seq("a" * 500, "short", "", "the quick brown fox " * 20)
      .toDF("t").select(expr("graft_deflate_len(t)").as("n"),
        expr("graft_deflate_len(CAST(NULL AS STRING))").as("z"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1)))
    val fromCodegen = run()
    assert(fromCodegen.forall(_._2)) // null in, null out
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = run()
      assert(fromCodegen.toSeq === interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    // 500 identical bytes deflate to a handful
    assert(fromCodegen(0)._1 < 30L)
  }

  // ---- graft_cdc_cuts: content-defined chunking (q165) -------------------

  /** Independent windowed-fold reference: for each code-point position
    * i >= W, fold the last W code points from scratch (the definition
    * the rolling identity in CdcChunker must reproduce). */
  private def cdcCutsRef(s: String): Seq[Int] = {
    import graft.functions.{CdcChunker, PolyHash}
    val cps = s.codePoints().toArray
    val n = cps.length
    val content = (CdcChunker.Window to n).filter { i =>
      var h = 0L
      ((i - CdcChunker.Window) until i).foreach(k => h = (h * PolyHash.M1 + cps(k)) % PolyHash.P)
      h % CdcChunker.Divisor == 0L
    }
    if (n == 0) Seq.empty
    else if (content.nonEmpty && content.last == n) content else content :+ n
  }

  private def cutsOf(texts: String*): Map[String, Seq[Int]] = {
    val session = spark
    import session.implicits._
    texts.toDF("text")
      .selectExpr("text", "graft_cdc_cuts(text) AS cuts")
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSeq).toMap
  }

  test("graft_cdc_cuts: rolling hash equals the from-scratch windowed fold") {
    val rnd = new scala.util.Random(42)
    val texts = (1 to 30).map(_ =>
      (1 to (20 + rnd.nextInt(400))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString) ++
      Seq("short", "x", "", "exactly sixteen!", // boundary-length cases
        "café " * 40, "😀ab " * 30) // multi-byte + surrogate pairs
    val got = cutsOf(texts.filter(_.nonEmpty).distinct: _*)
    got.foreach { case (t, cuts) =>
      assert(cuts === cdcCutsRef(t), s"cuts mismatch for ${t.take(40)}")
      // cuts are ascending, 1-based, end exactly at the code-point length
      assert(cuts.last === t.codePointCount(0, t.length))
      assert(cuts === cuts.sorted && cuts.distinct === cuts)
    }
    // short texts (< window) are a single whole-text chunk
    assert(got("short") === Seq(5))
  }

  test("graft_cdc_cuts: boundaries re-synchronize after a prefix edit (the CDC law)") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "INSERTED-PREFIX-" + base // shifts every fixed-size grid
    val cb = cutsOf(base)(base)
    val ce = cutsOf(edited)(edited)
    def chunksOf(t: String, cuts: Seq[Int]): Seq[String] =
      cuts.zip(0 +: cuts.dropRight(1)).map { case (e, s) => t.substring(s, e) }
    val shared = chunksOf(base, cb).toSet intersect chunksOf(edited, ce).toSet
    // after the first post-edit boundary the streams align again: the
    // overwhelming majority of the base's chunks survive verbatim
    assert(shared.size >= chunksOf(base, cb).size - 3,
      s"only ${shared.size} of ${chunksOf(base, cb).size} chunks re-synced")
    // and chunks always tile the document exactly
    assert(chunksOf(base, cb).mkString === base)
    assert(chunksOf(edited, ce).mkString === edited)
  }

  // ---- graft_bpe_merge: one BPE merge, greedy left-to-right (q205) ------

  private def bpeOf(pairs: (String, String)*): Map[String, Seq[String]] = {
    val session = spark
    import session.implicits._
    // drive every fixture through ONE merge (a, a) plus one (a, b) case
    // selected by the l/r columns riding in per row
    pairs.zipWithIndex.map { case ((text, lr), i) =>
      val Array(l, r) = lr.split("/")
      val got = Seq((text, l, r)).toDF("text", "l", "r")
        .selectExpr("coalesce(graft_bpe_merge(split(text, ' '), l, r), split(text, ' ')) AS t")
        .as[Seq[String]].collect()(0)
      s"$text|$lr" -> got
    }.toMap
  }

  test("graft_bpe_merge: greedy left-to-right non-overlapping, hand-computed") {
    val got = bpeOf(
      ("a a a", "a/a"),        // odd run: merge first pair, keep the tail
      ("a a a a", "a/a"),      // even run: two non-overlapping merges
      ("b a a b", "a/a"),      // interior match
      ("a b a b", "a/b"),      // adjacent non-overlapping matches (l != r)
      ("b a b", "b/a"),        // merged symbol does not re-match as l
      ("x y", "a/b"),          // no occurrence: untouched
      ("a", "a/a"))            // single token: untouched
    assert(got("a a a|a/a") === Seq("a a", "a"))
    assert(got("a a a a|a/a") === Seq("a a", "a a"))
    assert(got("b a a b|a/a") === Seq("b", "a a", "b"))
    assert(got("a b a b|a/b") === Seq("a b", "a b"))
    assert(got("b a b|b/a") === Seq("b a", "b"))
    assert(got("x y|a/b") === Seq("x", "y"))
    assert(got("a|a/a") === Seq("a"))
  }

  test("graft_bpe_merge: null pair passes the sequence through via coalesce") {
    val session = spark
    import session.implicits._
    val got = Seq(("a a b", Option.empty[String], Option.empty[String]))
      .toDF("text", "l", "r")
      .selectExpr("coalesce(graft_bpe_merge(split(text, ' '), l, r), split(text, ' ')) AS t")
      .as[Seq[String]].collect()(0)
    assert(got === Seq("a", "a", "b"))
  }

  test("graft_bpe_merge: codegen and interpreted paths agree") {
    val session = spark
    import session.implicits._
    val df = sources.Tables.documents(spark, sf0001).limit(80)
      .selectExpr("graft_bpe_merge(split(text, ' '), 'row', 'batch') AS t")
    val fromCodegen = df.as[Seq[String]].collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.as[Seq[String]].collect()
      assert(fromCodegen.toSeq === interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("graft_feistel_walk: codegen and interpreted paths agree; kernel is a bijection") {
    val session = spark
    import session.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // n = 100 → m = 7: every index walks within [0, 100) and the image
    // is exactly a permutation, per epoch
    val df = spark.range(100).crossJoin(spark.range(2).select(col("id").as("epoch")))
      .selectExpr("epoch", "graft_feistel_walk(id, epoch, 100L, 7) AS pos")
    val fromCodegen = df.as[(Long, Long)].collect()
    for (e <- 0L to 1L)
      assert(fromCodegen.filter(_._1 == e).map(_._2).sorted.toSeq === (0L until 100L))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.as[(Long, Long)].collect()
      assert(fromCodegen.sorted.toSeq === interpreted.sorted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
