package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Bucketing = pre-shuffled storage (SURVEY.md §2.3 K6 / the 100 TB
  * co-located-join posture): two tables bucketed on the join key join
  * with NO exchange on either side — at cluster scale this removes the
  * dominant fact⋈fact shuffle entirely.
  */
class BucketingSpec extends AnyFunSuite with SparkSpec {

  test("bucketed fact tables join with no shuffle exchange (K6 at rest)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // unique names: the in-memory catalog forgets tables across JVMs but
    // the warehouse directory persists
    val liTab = s"li_bucketed_${System.nanoTime()}"
    val oTab = s"o_bucketed_${System.nanoTime()}"
    try {
      Tables.lineitem(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(liTab)
      Tables.orders(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(oTab)
      val joined = spark.table(liTab)
        .join(spark.table(oTab), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      // same result…
      assert(joined.exceptAll(expected).count() === 0)
      // …but the bucketed join inserts no exchange on either join key
      // (the later groupBy legitimately shuffles on its own key)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan.take(4000))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan.take(4000))
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan.take(4000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $liTab")
      spark.sql(s"DROP TABLE IF EXISTS $oTab")
    }
  }
}
