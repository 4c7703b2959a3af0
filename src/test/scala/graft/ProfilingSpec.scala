package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiling

/** Constructed-corpus checks for the round-7 profiling/audit operators
  * (q122–q126): hand-computable fixtures pin the semantics the DuckDB
  * oracle then re-verifies at sf0.01.
  */
class ProfilingSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String, String)*) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3, r._4)), 2),
      schema)
  }

  test("q122 composes NFC, lowercases, trims, collapses spaces; flags changes") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = docs(
      (1L, "fr", "s", "Été   CHAUD "),  // decomposed + case + spaces
      (2L, "en", "s", "already clean"),
      (3L, "en", "s", "MIXED Case"))
    val out = Profiling.normalizeTextOf(d).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3), r.getInt(4)))).toMap
    // NFC composes e+combining-acute into é (1 char), so the normalized
    // string is shorter than the input in CHARACTERS, not just trimmed
    assert(out(1L) === (("été chaud", 9, 1)))
    assert(out(2L) === (("already clean", 13, 0)))
    assert(out(3L) === (("mixed case", 10, 1)))
  }

  test("q123 data card: counts, shares as exact divisions, tie-broken top lang") {
    val d = docs(
      (1L, "en", "A", "a b"),
      (2L, "en", "A", "c"),
      (3L, "fr", "A", "d e f"),
      (4L, "fr", "B", "x"),
      (5L, "de", "C", "t"),
      (6L, "fr", "C", "u"))
    val out = Profiling.sourceDatacardOf(d).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getString(7), r.getLong(8)))
    }.toMap
    // corpus tokens = 6 (A) + 1 (B) + 2 (C) = 9
    assert(out("A") === ((3L, 2L, 6L, 9L, 2.0, 0.666667, "en", 2L)))
    assert(out("B") === ((1L, 1L, 1L, 1L, 1.0, 0.111111, "fr", 1L)))
    // C: de and fr tie at 1 doc each -> lang asc tiebreak picks de
    assert(out("C")._7 === "de")
  }

  test("q124 growth curve: new types counted at first bucket only, cumulative") {
    // n_docs = 3: buckets are doc_id*10 div 3 + 1 -> 1, 4, 7
    val d = docs(
      (0L, "en", "s", "a b"),
      (1L, "en", "s", "a"),
      (2L, "en", "s", "c"))
    val out = Profiling.vocabGrowthOf(d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out === Array(
      (1, 2L, 2L, 2L, 2L),   // "a b": 2 tokens, both new
      (4, 1L, 0L, 3L, 2L),   // "a" re-treads: no new types
      (7, 1L, 1L, 4L, 3L)))  // "c" is novel
  }

  test("q125 leakage: cross-split dup texts counted; within-split dups separate") {
    val d = docs(
      (0L, "en", "s", "dup one"),          // train
      (18L, "en", "s", "dup one"),         // 18 % 10 = 8 -> val: LEAKED
      (1L, "en", "s", "same split dup"),   // train
      (11L, "en", "s", "same split dup"),  // train: within-split dup
      (9L, "en", "s", "unique"))           // test
    val r = Profiling.splitLeakageOf(d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((3L, 5L, 1L, 2L, 1L)))
  }

  test("q126 fixed sample: exactly k per source, portable key, full tiebreak") {
    val big = (0L to 7L).map(i => (i, "en", "big", s"doc $i"))
    val small = Seq((100L, "en", "small", "x"), (101L, "en", "small", "y"))
    val d = docs((big ++ small): _*)
    val rows = Profiling.fixedSampleOf(d).collect()
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc("big").length === Profiling.FixedSampleK)
    assert(bySrc("small").length === 2)
    // ranks are 1..k dense per source
    assert(bySrc("big").map(_.getLong(1)).sorted === (1L to 5L).toArray)
    // the key is the documented engine-portable arithmetic, and the kept
    // set is the k smallest (key, doc_id) pairs
    def key(id: Long): Long = (((id + 17) % 1000003L) * 2654435761L) % 1048573L
    rows.foreach(r => assert(r.getLong(4) === key(r.getLong(2))))
    val expectBig = (0L to 7L).map(i => (key(i), i)).sorted.take(5).map(_._2).toSet
    assert(bySrc("big").map(_.getLong(2)).toSet === expectBig)
  }

  test("q127 efficiency report: hand-computed fill, overflow, and padding") {
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("chunk_id", LongType),
      StructField("n_docs", LongType), StructField("chunk_tokens", LongType)))
    // budget 2048: chunk 0 exactly full, chunk 1 overfull, chunk 2 a stub
    val rows = Seq(Row("s", 0L, 3L, 2048L), Row("s", 1L, 2L, 2100L), Row("s", 2L, 1L, 500L))
    val chunks = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val r = Profiling.packEfficiencyOf(chunks).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      === ((3L, 6L, 4648L, 1L, 1548L)))
    assert(r.getDouble(6) === math.rint(4648.0 / 6144 * 1e6) / 1e6)
  }

  test("q128 compression signal: repetition compresses, ratios deterministic") {
    val d = docs(
      (1L, "en", "s", "spam " * 200),             // highly repetitive
      (2L, "en", "s", (1 to 200).map(i => s"w${i * 7919 % 997}x${i}").mkString(" ")),
      (3L, "en", "s", ""))                        // empty: no ratio
    val out = Profiling.compressionSignalOf(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rep = out(1L); val div = out(2L)
    assert(rep.getLong(1) === 1000L && rep.getLong(2) > 0L)
    // the signal's whole point: repetitive text compresses far harder
    assert(rep.getDouble(3) < div.getDouble(3))
    assert(rep.getDouble(3) < 0.1 && div.getDouble(3) > 0.3)
    assert(out(3L).getLong(1) === 0L && out(3L).isNullAt(3))
    // deterministic across invocations (same JVM zlib)
    val again = Profiling.compressionSignalOf(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again === out.map { case (k, r) => k -> r.getLong(2) })
  }

  test("q122/q125 hold oracle-shape on the sf0.001 fixture (rows > 0, scalar cols)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val norm = Profiling.normalizeText(spark, sf0001)
    assert(norm.count() > 0)
    // synthetic fixture text is already lowercase single-spaced ASCII:
    // the normalization pass must be a no-op there (changed = 0 rows)
    assert(norm.agg(sum(col("changed"))).collect().head.getLong(0) === 0L)
    val leak = Profiling.splitLeakage(spark, sf0001).collect().head
    assert(leak.getLong(0) > 0 && leak.getLong(1) >= leak.getLong(0))
  }

  // ---- q167: OOV rate vs vocabulary size ----------------------------------

  test("q167 reads coverage off the count-of-counts table, hand-checked") {
    // counts: a=10, b=5, c=5, d=e=f=1  (6 types, 23 tokens)
    val d = docs(
      (1L, "en", "s", Seq.fill(10)("a").mkString(" ")),
      (2L, "en", "s", "b b b b b c c c c c"),
      (3L, "en", "s", "d e f"))
    val out = Profiling.oovRateCurveOf(d, Seq(1L, 2L, 3L, 4L, 10L)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    def r6(x: Double) =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(
      1L -> ((10L, 23L, r6(1 - 10.0 / 23))),   // top class alone
      2L -> ((15L, 23L, r6(1 - 15.0 / 23))),   // straddles the f=5 class
      3L -> ((20L, 23L, r6(1 - 20.0 / 23))),   // f=5 class exhausted
      4L -> ((21L, 23L, r6(1 - 21.0 / 23))),   // one hapax in
      10L -> ((23L, 23L, 0.0))))               // k past the vocab: full cover
  }

  test("q167 equals the brute-force ranked-vocabulary curve on the fixture") {
    val out = Profiling.oovRateCurve(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // brute force: rank the actual vocabulary, sum the top-k counts —
    // coverage must agree for ANY tie order (the tie-invariance the
    // count-of-counts shortcut rests on); take ties by token ascending
    val counts = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (tok, n) => (-n, tok) }
    val total = counts.map(_._2).sum
    out.foreach { case (k, covered, tot, oov) =>
      val brute = counts.take(k.toInt).map(_._2).sum
      assert(tot === total)
      assert(covered === brute, s"k=$k")
      assert(oov === BigDecimal.valueOf(1 - brute.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"k=$k")
    }
    // the curve is monotone non-increasing in k
    assert(out.map(_._4).toSeq === out.map(_._4).sorted.reverse.toSeq)
  }
}
