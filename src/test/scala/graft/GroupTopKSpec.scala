package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GroupTopK
import graft.plans.GroupTopK.Key

/** The custom whole-operator extension (logical node + strategy +
  * partial/final exec pair): semantics against the row_number-over-window
  * formulation it replaces, the map-side key-cap fallback, and the plan
  * shape that makes it worth having (bounded heaps before the exchange,
  * no partition-wide sort, no Window).
  */
class GroupTopKSpec extends AnyFunSuite with SparkSpec {

  private def windowTopK(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5).drop("rn")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(_.toString).toSeq
  }

  private def orders = graft.sources.Tables.orders(spark, sf001)
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  test("topKPerKey matches the window top-k row for row (sf0.01 orders)") {
    val got = GroupTopK.topKPerKey(orders, Seq("o_custkey"),
        Seq(Key("o_totalprice", desc = true), Key("o_orderkey")), 5)
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(_.toString).toSeq
    assert(got == windowTopK(orders))
    assert(got.nonEmpty)
  }

  test("k larger than every group degrades to identity (modulo order)") {
    val few = orders.filter(col("o_custkey") <= 50)
    val got = GroupTopK.topKPerKey(few, Seq("o_custkey"),
        Seq(Key("o_totalprice", desc = true), Key("o_orderkey")), 1000000)
      .collect().map(_.toString).toSet
    assert(got == few.collect().map(_.toString).toSet)
  }

  test("map-side key cap streams overflow keys through without losing exactness") {
    val conf = "spark.graft.topk.maxPartialKeys"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, "1") // every key but one per partition passes through un-reduced
    try {
      val got = GroupTopK.topKPerKey(orders, Seq("o_custkey"),
          Seq(Key("o_totalprice", desc = true), Key("o_orderkey")), 5)
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
        .collect().map(_.toString).toSeq
      assert(got == windowTopK(orders))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(conf, v)
        case None => spark.conf.unset(conf)
      }
    }
  }

  test("ties beyond the tie-break stay deterministic: first k under the total order") {
    import spark.implicits._
    // 10 rows per key, all the same price — orderkey is the tie-break
    val df = (1 to 10).flatMap(i => Seq((1L, i.toLong, 100.0), (2L, i.toLong, 100.0)))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val got = GroupTopK.topKPerKey(df, Seq("o_custkey"),
        Seq(Key("o_totalprice", desc = true), Key("o_orderkey")), 3)
      .orderBy(col("o_custkey"), col("o_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L)))
  }

  test("plan shape: partial below one exchange, final above, no Window, no Sort of the input") {
    val df = GroupTopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(Key("o_totalprice", desc = true), Key("o_orderkey")), 5)
    df.collect()
    // AQE's toString prints the final AND the initial plan; count nodes
    // in the final section only
    val full = df.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    assert(plan.contains("GroupTopKPartial"), plan)
    assert(plan.contains("GroupTopKFinal"), plan)
    assert(!plan.contains("Window"), plan)
    // the only sort allowed is none at all here (no trailing orderBy in
    // this df) — the operator itself must not plan partition sorts
    assert(!plan.contains("Sort "), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    // partial must sit BELOW the exchange: in the bottom-up printed tree
    // the partial line is indented deeper than the exchange line
    val lines = plan.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange"))
    val partIdx = lines.indexWhere(_.contains("GroupTopKPartial"))
    assert(exIdx >= 0 && partIdx > exIdx, plan)
  }

  test("contrast: the window form sorts (WindowGroupLimit path), GroupTopK never does") {
    // pins the honest positioning in BASELINE.md: Spark already
    // map-side-limits the window form (same shuffle bytes); what
    // GroupTopK removes is the partition sorts on both sides
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wdf = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
    wdf.collect()
    val wplan = wdf.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(wplan.contains("WindowGroupLimit"), wplan)
    assert(wplan.contains("Sort "), wplan)
  }

  test("rewrite: SQL window top-k with the rank dropped plans GroupTopK automatically") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    graft.sources.Tables.orders(spark, sf001).createOrReplaceTempView("gtk_orders")
    val df = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM gtk_orders) t
        |WHERE rn <= 5""".stripMargin)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(plan.contains("GroupTopKFinal"), plan)
    assert(!plan.contains("Window"), plan)
    // row-for-row against the un-rewritten form (rank kept → no rewrite)
    val kept = spark.sql(
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM gtk_orders) t
        |WHERE rn <= 5""".stripMargin)
    assert(kept.queryExecution.executedPlan.toString.contains("Window"))
    assert(df.collect().map(_.toString).sorted.toSeq ==
      kept.drop("rn").collect().map(_.toString).sorted.toSeq)
  }

  test("rewrite does NOT fire for rank() (ties can exceed k) or kept rank columns") {
    graft.sources.Tables.orders(spark, sf001).createOrReplaceTempView("gtk_orders")
    val rankDf = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
        |  FROM gtk_orders) t
        |WHERE rk <= 5""".stripMargin)
    rankDf.collect()
    val plan = rankDf.queryExecution.executedPlan.toString
    assert(!plan.contains("GroupTopK"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("degenerate rn < Int.MinValue does not rewrite (no v-1 wraparound) and returns 0 rows") {
    graft.sources.Tables.orders(spark, sf001).createOrReplaceTempView("gtk_orders_deg")
    // rn < -2147483648 is always false; a naive v-1 limit would wrap to
    // Int.MaxValue and keep EVERY row via a 2^31-1-per-key GroupTopK
    val df = spark.sql(
      s"""SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
        |  FROM gtk_orders_deg) t
        |WHERE rn < ${Int.MinValue}""".stripMargin)
    assert(df.count() === 0)
    assert(!df.queryExecution.executedPlan.toString.contains("GroupTopK"),
      df.queryExecution.executedPlan.toString)
  }

  test("SQL-registered sessions also plan GroupTopK (ensureRegistered path)") {
    // ensureRegistered appends the strategy via experimental.extraStrategies;
    // calling it twice must not stack duplicates
    graft.functions.GraftFunctions.ensureRegistered(spark)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental.extraStrategies
    assert(exp.count(_ eq graft.plans.GroupTopKStrategy) <= 1)
  }
}
