package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Write-path coverage (S1) with the at-scale layout: date-partitioned
  * parquet and partition pruning on read — the retention/replay storage
  * layout for event logs at 100 TB (only the matching date directories
  * are scanned).
  */
class SinksSpec extends AnyFunSuite with SparkSpec {

  test("date-partitioned append + partition-pruned scan (S1/S8)") {
    val out = Files.createTempDirectory("graft-sink").toString
    val e = Tables.events(spark, sf0001)
      .withColumn("event_date", date_trunc("day", col("ts")).cast("date"))
    e.write.mode("overwrite").partitionBy("event_date").parquet(out)

    val back = spark.read.parquet(out)
    assert(back.count() === e.count())

    val oneDay = back.filter(col("event_date") === lit("2024-01-05").cast("date"))
    val expected = e.filter(col("event_date") === lit("2024-01-05").cast("date")).count()
    assert(oneDay.count() === expected && expected > 0)
    // pruning: the partition filter must reach PartitionFilters, not a
    // row-level Filter over all files
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), plan.take(2000))
  }

  test("sharded corpus export: lang partitions, per-file record cap, lossless") {
    val out = Files.createTempDirectory("graft-shard").toString
    val d = Tables.documents(spark, sf0001).coalesce(1)
    graft.sources.Serde.writeShardedParquet(d, out, "lang", 20)
    val back = spark.read.parquet(out)
    // lossless round-trip, hive layout per language
    assert(back.count() === d.count())
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langDirs.nonEmpty, s"no lang= dirs under $out")
    // the record cap holds for every emitted shard file
    langDirs.foreach { dir =>
      new java.io.File(s"$out/$dir").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          val n = spark.read.parquet(f.getAbsolutePath).count()
          assert(n <= 20, s"${f.getName} has $n rows > cap 20")
        }
    }
  }

  test("append mode accumulates immutably (append-only log, S1)") {
    val out = Files.createTempDirectory("graft-append").toString
    val e = Tables.events(spark, sf0001).limit(100)
    e.write.mode("append").parquet(out)
    e.write.mode("append").parquet(out)
    assert(spark.read.parquet(out).count() === 200)
  }

  test("glob path subscribes to current-and-matching topics (S3 subscribe-regex)") {
    val root = Files.createTempDirectory("graft-topics").toString
    val e = Tables.events(spark, sf0001)
    e.filter(col("event_type") === "click").write.parquet(s"$root/topic_clicks")
    e.filter(col("event_type") === "view").write.parquet(s"$root/topic_views")
    e.filter(col("event_type") === "error").write.parquet(s"$root/other_errors")
    val subscribed = spark.read.parquet(s"$root/topic_*")
    val expected = e.filter(col("event_type").isin("click", "view")).count()
    assert(subscribed.count() === expected)
    assert(subscribed.filter(col("event_type") === "error").count() === 0)
  }
}
