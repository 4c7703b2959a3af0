package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Event, EventStreams}

/** Algebraic laws (SURVEY.md §5.3) checked over ScalaCheck-generated
  * inputs, each law exercised through real Spark plans: DLQ split is a
  * partition, dedup is idempotent, compaction = last-write-wins,
  * tumbling windows partition the stream, splits re-union to the input.
  */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private val base = 1704067200000L
  private val genEvent: Gen[Event] = for {
    id <- Gen.choose(0L, 500L)
    offMin <- Gen.choose(0L, 120L)
    user <- Gen.choose(0L, 5L)
    typ <- Gen.oneOf("click", "view", "purchase", "error")
    value <- Gen.choose(0, 10000).map(_ / 100.0)
  } yield Event(id, new Timestamp(base + offMin * 60000), user, typ, value, "{}")

  private val genEvents: Gen[List[Event]] = Gen.listOfN(40, genEvent)

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("GroupTopK law: equals the reference top-k for arbitrary data, k, and direction") {
    val session = spark
    import session.implicits._
    val genK = Gen.choose(1, 6)
    val genDesc = Gen.oneOf(true, false)
    checkProp(Prop.forAllNoShrink(genEvents, genK, genDesc) { (evs, k, desc) =>
      // dedupe ids so (value, event_id) is a total order per key — the
      // determinism contract both formulations share
      val rows = evs.distinctBy(_.event_id)
      val df = rows.toDF().select($"user_id", $"event_id", $"value")
      val got = graft.plans.GroupTopK.topKPerKey(
          df, Seq("user_id"),
          Seq(graft.plans.GroupTopK.Key("value", desc), graft.plans.GroupTopK.Key("event_id")), k)
        .as[(Long, Long, Double)].collect().toSet
      val expect = rows.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (if (desc) -e.value else e.value, e.event_id))
        sorted.take(k).map(e => (e.user_id, e.event_id, e.value))
      }.toSet
      got == expect
    })
  }

  test("DLQ split is a partition: good ∪ dlq = input, good ∩ dlq = ∅") {
    val session = spark
    import session.implicits._
    checkProp(Prop.forAllNoShrink(genEvents) { evs =>
      val df = evs.toDF()
      val (good, dlq) = EventStreams.dlqSplit(df)
      good.count() + dlq.count() == evs.size &&
        dlq.filter($"event_type" =!= "error").count() == 0 &&
        good.filter($"event_type" === "error").count() == 0
    })
  }

  test("exact dedup is idempotent and keeps one row per key") {
    val session = spark
    import session.implicits._
    checkProp(Prop.forAllNoShrink(genEvents) { evs =>
      val df = evs.toDF()
      val once = df.dropDuplicates("event_id")
      val twice = once.dropDuplicates("event_id")
      once.count() == twice.count() &&
        once.count() == evs.map(_.event_id).distinct.size
    })
  }

  test("latest-per-key compaction equals last-write-wins map semantics") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    checkProp(Prop.forAllNoShrink(genEvents) { evs =>
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      val compacted = evs.toDF().withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id").as[(Long, Long)].collect().toMap
      val expected = evs
        .groupBy(_.user_id)
        .map { case (u, es) => u -> es.maxBy(e => (e.ts.getTime, e.event_id)).event_id }
      compacted == expected
    })
  }

  test("tumbling windows partition events: each event in exactly one window") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    checkProp(Prop.forAllNoShrink(genEvents) { evs =>
      val windowed = evs.toDF()
        .select($"event_id", $"ts", window($"ts", "10 minutes").as("w"))
      val n = windowed.count()
      val misassigned = windowed
        .filter(!($"ts" >= $"w.start" && $"ts" < $"w.end")).count()
      n == evs.size && misassigned == 0
    })
  }

  test("sequence packing laws hold for arbitrary doc sizes (incl. oversize docs)") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions._
    val budget = 100L
    // token counts deliberately straddle the budget (oversize docs make
    // chunk ids legitimately sparse — the case the fixture can't produce)
    val genDoc: Gen[(Long, String, Long)] = for {
      id <- Gen.choose(0L, 10000L)
      src <- Gen.oneOf("web", "books", "code")
      n <- Gen.oneOf(Gen.choose(1L, 80L), Gen.choose(150L, 400L))
    } yield (id, src, n)
    val genDocs: Gen[List[(Long, String, Long)]] =
      Gen.listOfN(60, genDoc).map(_.distinctBy(_._1))
    checkProp(Prop.forAllNoShrink(genDocs) { rows =>
      val d = rows.toDF("doc_id", "source", "n_tokens")
      val packed = graft.operators.TextOps.packSequencesOf(d, budget).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // conservation: every doc and every token lands in exactly one chunk
      val docsOk = packed.map(_._3).sum == rows.size
      val tokensOk = packed.map(_._4).sum == rows.map(_._3).sum
      // per source: first chunk starts at 0 iff docs exist; chunk token
      // totals never exceed budget by more than one doc's overhang
      val perSource = rows.groupBy(_._2)
      val boundsOk = perSource.forall { case (src, srcRows) =>
        val chunks = packed.filter(_._1 == src)
        val maxDoc = srcRows.map(_._3).max
        chunks.map(_._2).min == 0L &&
          chunks.forall { case (_, _, _, tokens) => tokens < budget + maxDoc }
      }
      // chunk id of every doc equals its prefix sum div budget (the
      // defining greedy-packing law), recomputed independently in Scala
      val expectedChunks = perSource.flatMap { case (src, srcRows) =>
        val sorted = srcRows.sortBy(_._1)
        val prefix = sorted.scanLeft(0L)(_ + _._3)
        sorted.zip(prefix).map { case ((_, _, n), before) => (src, before / budget, n) }
      }
      val expectedAgg = expectedChunks.groupBy(t => (t._1, t._2))
        .map { case ((src, c), ts) => (src, c, ts.size.toLong, ts.map(_._3).sum) }
        .toSet
      docsOk && tokensOk && boundsOk && packed.toSet == expectedAgg
    })
  }

  test("chunking laws: stride==chunk partitions; stride<chunk de-overlaps losslessly") {
    val session = spark
    import session.implicits._
    val genText: Gen[String] = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "ddd", "e1"))
    } yield toks.mkString(" ")
    val genDocs: Gen[List[(Long, String)]] =
      Gen.listOfN(15, for {
        id <- Gen.choose(0L, 100000L); t <- genText
      } yield (id, t)).map(_.distinctBy(_._1))
    checkProp(Prop.forAllNoShrink(genDocs) { rows =>
      val d = rows.toDF("doc_id", "text")
      // law 1: stride == chunk is a partition — concatenating a doc's
      // chunks in chunk_id order reproduces the text exactly
      val part = graft.operators.TextOps.chunkDocumentsOf(d, 7, 7).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      val rebuilt = part.groupBy(_._1).map { case (id, cs) =>
        id -> cs.sortBy(_._2).map(_._3).mkString(" ") }
      // law 2: stride < chunk — taking each non-final chunk's first
      // `stride` tokens plus the whole final chunk de-overlaps losslessly
      val over = graft.operators.TextOps.chunkDocumentsOf(d, 5, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      val rebuilt2 = over.groupBy(_._1).map { case (id, cs) =>
        val sorted = cs.sortBy(_._2)
        val parts = sorted.init.map(_._3.split(" ").take(3).mkString(" ")) :+
          sorted.last._3
        id -> parts.mkString(" ")
      }
      rebuilt == rows.toMap && rebuilt2 == rows.toMap
    })
  }

  test("sharded packing = per-shard greedy packing with interleaved chunk ids") {
    val session = spark
    import session.implicits._
    val budget = 100L
    val shards = 4
    val genDoc: Gen[(Long, String, Long)] = for {
      id <- Gen.choose(0L, 10000L)
      src <- Gen.oneOf("web", "books", "code")
      n <- Gen.oneOf(Gen.choose(1L, 80L), Gen.choose(150L, 400L))
    } yield (id, src, n)
    val genDocs: Gen[List[(Long, String, Long)]] =
      Gen.listOfN(60, genDoc).map(_.distinctBy(_._1))
    checkProp(Prop.forAllNoShrink(genDocs) { rows =>
      val d = rows.toDF("doc_id", "source", "n_tokens")
      val row6 = (r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
         r.getLong(4), r.getLong(5))
      val sharded = graft.operators.TextOps
        .packSequencesShardedOf(d, budget, shards).collect().map(row6)
      // conservation survives sharding: every doc/token in exactly one chunk
      val docsOk = sharded.map(_._3).sum == rows.size
      val tokensOk = sharded.map(_._4).sum == rows.map(_._3).sum
      // defining law: the sharded operator IS q68 run per doc_id-mod slice
      // with chunk ids interleaved (local * shards + shard) — including
      // first/last doc bookkeeping
      val expected = (0 until shards).flatMap { s =>
        val slice = rows.filter(r => Math.floorMod(r._1, shards) == s.toLong)
        if (slice.isEmpty) Nil
        else graft.operators.TextOps
          .packSequencesOf(slice.toDF("doc_id", "source", "n_tokens"), budget)
          .collect().map(row6)
          .map(t => (t._1, t._2 * shards + s, t._3, t._4, t._5, t._6))
      }.toSet
      docsOk && tokensOk && sharded.toSet == expected
    })
  }

  test("union of splits reconstructs the input multiset") {
    val session = spark
    import session.implicits._
    checkProp(Prop.forAllNoShrink(genEvents) { evs =>
      val df = evs.toDF()
      val (good, dlq) = EventStreams.dlqSplit(df)
      val reunited = good.unionByName(
        dlq.drop("origin_topic", "origin_partition", "origin_offset"))
      reunited.exceptAll(df).count() == 0 && df.exceptAll(reunited).count() == 0
    })
  }

  // ---- profiling-family laws (q122/q124/q125/q126) ----------------------

  // mixed case, composed AND decomposed accents, occasional empty token
  // (a double space once joined) — the inputs normalization exists for
  private val genDoc: Gen[(Long, String, String, String)] = for {
    id <- Gen.choose(0L, 60L)
    lang <- Gen.oneOf("en", "fr", "de")
    src <- Gen.oneOf("s0", "s1", "s2")
    n <- Gen.choose(1, 8)
    ts <- Gen.listOfN(n, Gen.oneOf("a", "B", "cc", "Dd", "É", "é", ""))
  } yield (id, lang, src, ts.mkString(" "))

  private val genCorpus: Gen[List[(Long, String, String, String)]] =
    Gen.listOfN(30, genDoc).map(_.groupBy(_._1).map(_._2.head).toList)

  private def corpusDf(docs: List[(Long, String, String, String)]) = {
    val session = spark
    import session.implicits._
    docs.toDF("doc_id", "lang", "source", "text")
  }

  test("q122 normalization is idempotent: re-normalizing changes nothing") {
    checkProp(Prop.forAllNoShrink(genCorpus) { docs =>
      docs.isEmpty || {
        val once = operators.Profiling.normalizeTextOf(corpusDf(docs))
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("lang"),
            org.apache.spark.sql.functions.col("norm_text").as("text"))
        val twice = operators.Profiling.normalizeTextOf(once)
        twice.filter(org.apache.spark.sql.functions.col("changed") =!= 0).count() == 0
      }
    })
  }

  test("q205 merge kernel laws: detok preserved, no (l,r) survives, equals greedy reference") {
    // collision-rich sequences over a 3-token alphabet exercise every
    // overlap regime (runs of l=r, adjacent non-overlapping matches)
    val genSeq = Gen.listOfN(12, Gen.oneOf("a", "b", "c"))
      .flatMap(t => Gen.choose(0, 11).map(n => t.take(1 + n)))
    val genPair = for {
      l <- Gen.oneOf("a", "b", "c"); r <- Gen.oneOf("a", "b", "c")
    } yield (l, r)
    def greedyRef(t: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < t.size) {
        if (i + 1 < t.size && t(i) == l && t(i + 1) == r) {
          out += (l + " " + r); i += 2
        } else { out += t(i); i += 1 }
      }
      out.toList
    }
    val session = spark
    import session.implicits._
    checkProp(Prop.forAllNoShrink(Gen.listOfN(8, genSeq), genPair) { (seqs, lr) =>
      val (l, r) = lr
      val docs = seqs.zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" ")) }.toDF("doc_id", "text")
      val got = operators.TextOps.bpeEncode(docs, Seq((l, r)))
        .as[(Long, Seq[String])].collect().toMap
      seqs.zipWithIndex.forall { case (t, i) =>
        val g = got(i.toLong).toList
        g == greedyRef(t, l, r) &&
          g.mkString(" ") == t.mkString(" ") &&
          !g.iterator.sliding(2).withPartial(false)
            .exists(w => w.head == l && w(1) == r)
      }
    })
  }

  test("q124 growth curve conserves totals: final cums = corpus totals") {
    checkProp(Prop.forAllNoShrink(genCorpus) { docs =>
      docs.isEmpty || {
        val rows = operators.Profiling.vocabGrowthOf(corpusDf(docs)).collect()
        val toks = docs.flatMap(_._4.split(" ", -1))
        val cumTok = rows.last.getLong(3)
        val cumTyp = rows.last.getLong(4)
        val nonDec = rows.sliding(2).forall {
          case Array(a, b) => a.getLong(3) <= b.getLong(3) && a.getLong(4) <= b.getLong(4)
          case _ => true
        }
        cumTok == toks.size && cumTyp == toks.distinct.size && nonDec
      }
    })
  }

  test("q125 leakage accounting matches a direct recount") {
    checkProp(Prop.forAllNoShrink(genCorpus) { docs =>
      docs.isEmpty || {
        def split(id: Long): String = {
          val b = ((id % 10) + 10) % 10
          if (b < 8) "train" else if (b == 8) "val" else "test"
        }
        val byText = docs.groupBy(_._4)
        val leakedTexts = byText.count(_._2.map(d => split(d._1)).distinct.size > 1)
        val leakedDocs = byText.values
          .filter(_.map(d => split(d._1)).distinct.size > 1).map(_.size).sum
        val dupWithin = byText.count(g =>
          g._2.map(d => split(d._1)).distinct.size == 1 && g._2.size > 1)
        val r = operators.Profiling.splitLeakageOf(corpusDf(docs)).collect().head
        r.getLong(0) == byText.size && r.getLong(1) == docs.size &&
          r.getLong(2) == leakedTexts && r.getLong(3) == leakedDocs &&
          r.getLong(4) == dupWithin
      }
    })
  }

  test("q126 sample = the k smallest (key, doc_id) per source, exactly") {
    checkProp(Prop.forAllNoShrink(genCorpus) { docs =>
      docs.isEmpty || {
        def key(id: Long): Long = (((id + 17) % 1000003L) * 2654435761L) % 1048573L
        // .toSeq first: flatMap on a Map with pair results rebuilds a Map,
        // collapsing the k same-source pairs to one
        val expect = docs.groupBy(_._3).toSeq.flatMap { case (src, ds) =>
          ds.map(d => (key(d._1), d._1)).sorted
            .take(operators.Profiling.FixedSampleK).map(src -> _._2)
        }.toSet
        val got = operators.Profiling.fixedSampleOf(corpusDf(docs)).collect()
          .map(r => r.getString(0) -> r.getLong(2)).toSet
        got == expect
      }
    })
  }

  test("bucketed percentiles equal plain percentiles on random frames (q18 law)") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.expr
    // ties, negatives, tiny/huge magnitudes, null values, null group keys
    val genVal: Gen[Option[Double]] = Gen.frequency(
      5 -> Gen.choose(-1000, 1000).map(v => Some(v / 7.0)),
      2 -> Gen.oneOf(Seq(Some(0.0), Some(-0.0), Some(1e12), Some(-1e-9))),
      1 -> Gen.const(Option.empty[Double]))
    val genRow: Gen[(Option[String], Option[Double])] = for {
      g <- Gen.frequency(6 -> Gen.oneOf("A", "B", "C").map(Option(_)),
                         1 -> Gen.const(Option.empty[String]))
      v <- genVal
    } yield (g, v)
    val genP: Gen[Double] = Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)
    checkProp(Prop.forAllNoShrink(Gen.listOfN(60, genRow), genP, genP) { (rows, p1, p2) =>
      rows.nonEmpty && {
        val df = rows.toDF("l_returnflag", "v").repartition(7)
        val plain = df.groupBy($"l_returnflag")
          .agg(expr(s"percentile(v, $p1)").as("a"), expr(s"percentile(v, $p2)").as("b"))
          .collect().map(r => Option(r.get(0)) -> (Option(r.get(1)), Option(r.get(2)))).toMap
        val bucketed = operators.Analytics.bucketedPercentilesOf(
            df, "l_returnflag", "v", Seq(("a", p1), ("b", p2)))
          .collect().map(r => Option(r.get(0)) -> (Option(r.get(1)), Option(r.get(2)))).toMap
        bucketed == plain
      }
    })
  }

  test("KMV sketch equals the reference min-k computation under any partitioning (q27 law)") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.expr
    // a k SMALL enough that random inputs saturate it, so the estimate
    // path — bounded-eviction inserts and cross-partition merges — is
    // what the law checks, not just below-k exactness
    val k = 16
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_kmv16",
      exprs => new graft.functions.KmvAgg(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
          org.apache.spark.sql.types.LongType), k),
      "scala_udf")
    val genKeys: Gen[List[Long]] = for {
      n <- Gen.choose(1, 300)
      // key range comparable to list size: duplicates are frequent
      keys <- Gen.listOfN(n, Gen.choose(0L, 120L))
    } yield keys
    def refHash(x: Long): Long = {
      val u = ((x % graft.functions.Kmv.P) * graft.functions.PolyHash.MixA +
        graft.functions.PolyHash.MixB) % graft.functions.Kmv.P
      ((u * u) % graft.functions.Kmv.P * graft.functions.PolyHash.M1 + u) %
        graft.functions.Kmv.P
    }
    checkProp(Prop.forAllNoShrink(genKeys, Gen.choose(1, 8)) { (keys, parts) =>
      val distinctHashes = keys.map(refHash).distinct.sorted
      val expect =
        if (distinctHashes.size < k) distinctHashes.size.toLong
        else ((k - 1).toLong * graft.functions.Kmv.P) / distinctHashes(k - 1)
      // random partitioning exercises the merge path with arbitrary
      // buffer contents and orders
      val got = keys.toDF("x").repartition(parts)
        .select(graft.functions.Kmv.hashCol($"x").as("h"))
        .agg(expr("graft_kmv16(h)")).collect().head.getLong(0)
      got == expect
    })
  }

  test("q189 two-level shard packing equals the single global cumsum on random corpora") {
    val session = spark
    import session.implicits._
    // the operator's whole claim is that the distributed two-level form
    // (per-source windows + broadcast offsets) IS the sequential
    // definition — check it against brute force for arbitrary corpora,
    // budgets, and duplicate-free interleaved ids
    val genDoc = for {
      src <- Gen.oneOf("a", "b", "c", "d")
      n <- Gen.choose(1, 12)
    } yield (src, n)
    val genCorpus = Gen.listOfN(25, genDoc)
    val genBudget = Gen.choose(3L, 30L)
    checkProp(Prop.forAllNoShrink(genCorpus, genBudget) { (corpus, budget) =>
      val docs = corpus.zipWithIndex.map { case ((s, n), i) =>
        // ids descending so doc_id order ≠ packing order
        ((1000 - i).toLong, s, Seq.fill(n)("w").mkString(" "))
      }
      val got = operators.Curation
        .shardPackOf(docs.toDF("doc_id", "source", "text"), budget)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      val packed = docs.map { case (id, s, t) =>
        (id, s, t.split(" ", -1).length.toLong) }.sortBy(d => (d._2, d._1))
      val starts = packed.scanLeft(0L)(_ + _._3).init
      val expect = packed.zip(starts)
        .map { case ((id, _, _), st) => id -> st / budget }.toMap
      got == expect
    })
  }
}
