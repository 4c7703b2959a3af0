package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Event

/** Typed Dataset surface (SURVEY.md §1.3 / §2.2): the reference's typed
  * callbacks — Flink MapFunction / FlatMapFunction / ReduceFunction
  * (flink/README.md:21-25) — as Dataset[T] operations with case-class
  * Encoders, plus model-scoring via a native expression instead of a UDF.
  */
class TypedOpsSpec extends AnyFunSuite with SparkSpec {

  private def events = {
    val session = spark
    import session.implicits._
    sources.Tables.events(spark, sf0001).as[Event]
  }

  test("typed map (1→1, MapFunction analog)") {
    val session = spark
    import session.implicits._
    val doubled = events.map(e => e.copy(value = e.value * 2)).limit(5).collect()
    val original = events.limit(5).collect()
    doubled.zip(original).foreach { case (d, o) =>
      assert(d.value === o.value * 2 && d.event_id === o.event_id)
    }
  }

  test("typed flatMap (1→0..n, FlatMapFunction analog — the word splitter)") {
    val session = spark
    import session.implicits._
    val docs = sources.Tables.documents(spark, sf0001)
      .select($"text").as[String].limit(10)
    val words = docs.flatMap(_.split(" ", -1)).collect() // limit -1 matches Spark's split
    val viaExplode = sources.Tables.documents(spark, sf0001).limit(10)
      .select(explode(split($"text", " "))).count()
    assert(words.length.toLong === viaExplode)
  }

  test("typed filter + groupByKey.reduceGroups (ReduceFunction analog)") {
    val session = spark
    import session.implicits._
    val maxPerUser = events
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .reduceGroups((a, b) => if (a.value >= b.value) a else b)
      .map { case (uid, e) => (uid, e.value) }
      .collect().toMap
    val expected = sources.Tables.events(spark, sf0001)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(max($"value"))
      .as[(Long, Double)].collect().toMap
    assert(maxPerUser === expected)
  }

  test("groupByKey.mapGroups (full-group access, WindowFunction analog)") {
    val session = spark
    import session.implicits._
    val spans = events
      .groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        val ts = it.map(_.ts.getTime).toSeq
        (uid, ts.max - ts.min)
      }
      .collect().toMap
    val expected = sources.Tables.events(spark, sf0001)
      .groupBy($"user_id")
      .agg((unix_millis(max($"ts")) - unix_millis(min($"ts"))).as("span"))
      .as[(Long, Long)].collect().toMap
    assert(spans === expected)
  }

  test("model scoring without a UDF: native cosine against a weight vector") {
    val session = spark
    import session.implicits._
    // a fixed 'model' = weight vector; score = cosine(features, weights),
    // the ML-scoring pattern (flink/README.md:45-59) kept inside codegen
    val weights = Array.tabulate(64)(i => math.sin(i + 1))
    val scored = sources.Tables.embeddings(spark, sf0001)
      .withColumn("w", lit(weights))
      .withColumn("score", expr("graft_cosine(embedding, w)"))
      .select($"vec_id", $"score")
    val rows = scored.limit(100).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-12))
  }
}
