package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Cross-operator semantic checks (SURVEY.md §5.2/§5.3): relationships
  * between independent implementations of the same concept — dedup
  * variants agree on true duplicates, ANN results are bounded by brute
  * force, approx sketches stay near exact counts.
  */
class SemanticsSpec extends AnyFunSuite with SparkSpec {

  test("exact dup groups and keep-first dedup agree on survivor count") {
    val total = sources.Tables.documents(spark, sf0001).count()
    val dupGroups = Dedup.exactDupGroups(spark, sf0001)
    val extraCopies = dupGroups.selectExpr("sum(n_dups - 1) AS extra")
      .collect()(0).getAs[Long]("extra")
    val survivors = Dedup.dedupKeepFirst(spark, sf0001).count()
    assert(survivors === total - extraCopies)
  }

  /** Fixture ∪ shifted copy: every doc has exactly one exact duplicate
    * (doc_id + 100000) — guaranteed positives for the near-dup detectors
    * regardless of fixture content. */
  private def corpusWithDups = {
    val d = sources.Tables.documents(spark, sf0001).select("doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
    d.unionByName(d.withColumn("doc_id",
      org.apache.spark.sql.functions.col("doc_id") + 100000L))
  }

  test("minhash LSH finds every exact duplicate pair with est=1") {
    val docs = corpusWithDups
    val expected = (0L until 100L).map(i => (i, i + 100000L)).toSet
    val lsh = Dedup.minhashLshPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val lshPairs = lsh.map(t => (t._1, t._2)).toSet
    assert(expected.subsetOf(lshPairs), s"missing: ${expected -- lshPairs}")
    // exact duplicates must have full signature agreement
    lsh.filter(t => expected.contains((t._1, t._2))).foreach { case (_, _, est) =>
      assert(est === 1.0)
    }
  }

  test("simhash blocks identical documents at hamming distance 0") {
    val sim = Dedup.simhashPairsOf(corpusWithDups).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    (0L until 100L).map(i => (i, i + 100000L)).foreach { p =>
      assert(sim.get(p).contains(0), s"pair $p not at hamming 0: ${sim.get(p)}")
    }
  }

  test("exact-jaccard core reports 1.0 for identical docs") {
    val pairs = Dedup.ngramJaccardPairsOf(corpusWithDups)
      .filter("jaccard = 1.0").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 100L).map(i => (i, i + 100000L)).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected -- pairs}")
  }

  test("IVF ANN similarities never exceed the brute-force best") {
    val brute = Similarity.cosineTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(3)).toMap
    val ivf = Similarity.annIvf(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    assert(ivf.nonEmpty)
    ivf.filter(_._1 < 10).foreach { case (q, _, sim) =>
      val best = brute((q, 1))
      assert(sim <= best + 1e-9, s"query $q: ivf sim $sim > brute best $best")
    }
  }

  test("sign-bucket ANN results are a subset of same-bucket brute force") {
    // every reported neighbor must share the probe's bucket — verified by
    // recomputing the bucket from raw embeddings
    val rows = Similarity.annSignBuckets(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val emb = sources.Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bucket(v: Array[Float]): Int =
      (0 until 8).map(i => if (v(i) > 0) 1 << i else 0).sum
    rows.foreach { r =>
      val q = r.getLong(0); val n = r.getLong(2); val b = r.getInt(3)
      assert(bucket(emb(q)) === b)
      assert(bucket(emb(n)) === b)
    }
  }

  test("approx_count_distinct stays within 10% of exact") {
    Analytics.approxDistinctParts(spark, sf001).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.10,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("media stub decode is deterministic and batch-shaped") {
    val a = Multimodal.decodeFeatures(spark, sf0001).collect().toSeq
    val b = Multimodal.decodeFeatures(spark, sf0001).collect().toSeq
    assert(a === b)
    assert(a.map(_.getInt(0)).toSet.subsetOf(Set(1, 2, 3))) // channels ∈ 1..3
  }
}
