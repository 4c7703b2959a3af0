package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe for q35's near-unique p25 branch: plain exact `percentile`
  * vs the range-bucketed refinement ([[graft.operators.Analytics
  * .p25PriceBucketedOf]]). Asserts bit-equality of the two answers, then
  * times both (noop sink, alternating passes). The measured outcome —
  * which branch q35 ships with — is recorded in BASELINE.md.
  */
object P25Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.get("graft-p25-probe")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = graft.sources.Tables.lineitem(spark, dir)

    def plain(): DataFrame = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25)").as("p25_price"))
    def bucketed(): DataFrame = graft.operators.Analytics.p25PriceBucketedOf(li)

    // Option-wrap both sides: an all-NULL-price group yields a NULL
    // percentile (and the group key itself is nullable) — the probe should
    // report a mismatch, not NPE (same comparison the SemanticsSpec uses)
    val p = plain().collect().map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    val b = bucketed().collect().map(r => Option(r.get(0)) -> Option(r.get(1))).toMap
    require(p == b, s"p25 mismatch: plain=$p bucketed=$b")
    println(s"[p25] bit-equal on ${p.size} groups: $p")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[p25] $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // alternate so ambient load hits both variants evenly
    for (i <- 1 to 5) {
      time(s"plain    #$i")(plain().write.format("noop").mode("overwrite").save())
      time(s"bucketed #$i")(bucketed().write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
