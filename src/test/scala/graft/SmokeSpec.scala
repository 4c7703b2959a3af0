package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke (SURVEY.md §5.4): the flagship entry returns rows and
  * every registered query executes at sf0.001 (catches runtime-only
  * failures — schema drift, overflow, bad expressions — across the whole
  * §2 inventory).
  */
class SmokeSpec extends AnyFunSuite with SparkSpec {

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has oracle SQL or is explicitly rows-only") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    val rowsOnly = q -- o
    // the intentionally non-SQL-expressible ops (sketches, stubs, raw
    // zlib bytes):
    // (q84 gained an oracle in r4: fixed-point centroid rounding makes the
    // IVF assignment deterministic across engines)
    // (q128 joined in r7: zlib bytes are engine-specific, like the hashes)
    // (q73/q74 LEFT in r8: the engine-portable multiplicative hash family
    // made the MinHash/SimHash signatures recomputable in DuckDB SQL)
    // (q27 LEFT in r10: portable KMV sketch, oracle replays the min-k set;
    // q18 LEFT in r10: the bucketed exact percentile is bit-equal to plain,
    // so it shares q35's QUANTILE_CONT oracle)
    assert(rowsOnly === Set("q92_decode_features", "q128_compression_signal"))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() >= 0)
    }
  }

  test("oracle-bearing queries emit only driver-sortable scalar columns") {
    // the driver's pandas comparator row-sorts every column before
    // hashing and crashes on array/map/struct cells (round 6: q105's
    // ArrayType codes column → 'unhashable numpy.ndarray', the only
    // non-green contract row of the round). Gate it at build time:
    // any query claiming an oracle must emit scalar top-level columns.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .flatMap { case (name, fn) =>
        fn(spark, sf0001).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      }
    assert(offenders.isEmpty,
      s"non-scalar top-level columns in oracle-bearing queries: $offenders")
  }

  test("queries that must be non-empty at sf0.001 are non-empty") {
    val mustBeNonEmpty = Seq(
      "q01_pricing_summary", "q02_revenue_by_nation", "q42_compact_latest_per_key",
      "q46_sessionize", "q60_word_count", "q63_quality_scores",
      "q80_cosine_topk", "q82_ann_sign_buckets", "q90_payload_metadata")
    mustBeNonEmpty.foreach { n =>
      assert(SparkEntry.queries(n)(spark, sf0001).count() > 0, s"$n is empty")
    }
  }
}
