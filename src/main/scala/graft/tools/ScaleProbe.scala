package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

    def time(name: String)(f: => Long): Unit = {
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

    spark.stop()
  }
}
