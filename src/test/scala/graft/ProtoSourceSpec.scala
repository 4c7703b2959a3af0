package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The graft-proto DataSource V2 connector: write/read round trip through
  * the varint-framed wire files, sidecar self-description, protobuf-rule
  * schema evolution on read, column pruning pushed through the byte
  * decoder, and commit hygiene (no temp shards survive).
  */
class ProtoSourceSpec extends AnyFunSuite with SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def sampleDf = {
    val session = spark
    import session.implicits._
    Seq(
      (1L, "alpha", 1.5, "en"),
      (2L, "beta", 0.0, "de"),
      (3L, "gamma", -2.25, "fr")
    ).toDF("id", "name", "score", "lang")
  }

  test("write → read round trip, schema from the sidecar") {
    val dir = tmpDir("gpb-rt")
    sampleDf.repartition(2).write.mode("append").format("graft-proto").save(dir)
    val back = spark.read.format("graft-proto").load(dir)
    assert(back.schema === sampleDf.schema)
    assert(back.collect().map(_.toString).sorted.toSeq ===
      sampleDf.collect().map(_.toString).sorted.toSeq)
    // commit hygiene: only part files + sidecar, no temp shards
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSeq
    assert(files.count(_.endsWith(".gpb")) == 2, files)
    assert(files.contains("_graft_proto_schema.json"))
    assert(!files.exists(_.startsWith(".tmp-")), files)
  }

  test("evolved reader: drop a middle field, add a new one — protobuf number rules") {
    val dir = tmpDir("gpb-evolve")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    // reader drops `name` (middle field) and adds `extra`
    val evolved = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType),
      StructField("extra", StringType)))
    val session = spark
    import session.implicits._
    val back = spark.read.format("graft-proto").schema(evolved).load(dir)
      .as[(Long, Double, Option[String])].collect().toSet
    assert(back === Set((1L, 1.5, None), (2L, 0.0, None), (3L, -2.25, None)))
  }

  test("illegal evolution (same name, new payload type) is rejected by the compat gate") {
    val dir = tmpDir("gpb-illegal")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    val bad = StructType(Seq(StructField("id", LongType),
      StructField("name", LongType))) // was string
    val err = intercept[Exception] {
      spark.read.format("graft-proto").schema(bad).load(dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("incompatible")), err.toString)
  }

  test("column pruning reaches the scan (and therefore the byte decoder)") {
    val dir = tmpDir("gpb-prune")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    val df = spark.read.format("graft-proto").load(dir).select("id", "lang")
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    // the Scan's description carries its (pruned) readSchema
    assert(scans.contains("readSchema=id,lang"), scans)
    assert(!scans.contains("readSchema=id,name"), scans)
  }

  test("micro-batch stream: new shards become new batches, exactly once") {
    val dir = tmpDir("gpb-stream")
    val ck = tmpDir("gpb-stream-ck")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    val q = spark.readStream.format("graft-proto").schema(sampleDf.schema).load(dir)
      .groupBy().count()
      .writeStream.outputMode("complete").format("memory").queryName("gpbstream")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("gpbstream").collect().head.getLong(0) === 3)
      // a second producer write appends NEW shards; already-consumed
      // shards must not replay
      sampleDf.withColumn("id", col("id") + 10).write.mode("append")
        .format("graft-proto").save(dir)
      q.processAllAvailable()
      assert(spark.table("gpbstream").collect().head.getLong(0) === 6)
    } finally q.stop()
  }

  test("filter pushdown: rows skipped at the scan, results exact, filters visible in the plan") {
    val dir = tmpDir("gpb-pushdown")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    val df = spark.read.format("graft-proto").load(dir)
      .filter(col("score") >= 0.0 && col("lang") =!= "de")
      .select("id", "name")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "alpha"))) // beta is 'de', gamma has score -2.25
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    // the accepted subset shows in the scan description...
    assert(scan.toString.contains("pushed=["), scan.toString)
    assert(scan.toString.contains("GreaterThanOrEqual(score,0.0)"), scan.toString)
    // ...and the scan itself emits only surviving rows (the skip is real,
    // not just re-filtered above): 1 of 3 records
    df.collect()
    assert(scan.metrics.get("numOutputRows").map(_.value).contains(1L), scan.metrics)
  }

  test("pushed-filter evaluator: three-valued semantics never skip a row SQL would keep") {
    import org.apache.spark.sql.sources._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    def keep(fs: Filter*)(values: Any*): Boolean =
      graft.sources.ProtoFilterEval.compile(fs.toArray, schema)(values.toSeq)
    assert(!keep(GreaterThan("id", 5L))(3L, "x"))
    assert(keep(GreaterThan("id", 5L))(7L, "x"))
    // null comparisons are UNKNOWN -> kept (the residual filter drops them
    // with exact SQL semantics; the scan must not guess)
    assert(keep(GreaterThan("id", 5L))(null, "x"))
    assert(!keep(IsNotNull("id"))(null, "x")) // definite: null fails IsNotNull
    assert(keep(IsNull("id"))(null, "x"))
    // type mismatch (evolved reader, defensive): unknown -> kept
    assert(keep(EqualTo("id", "oops"))(3L, "x"))
    // three-valued AND/OR/NOT
    assert(!keep(And(EqualTo("name", "x"), GreaterThan("id", 5L)))(3L, "x"))
    assert(keep(Or(EqualTo("name", "x"), GreaterThan("id", 5L)))(3L, "x"))
    assert(keep(Or(GreaterThan("id", 0L), EqualTo("name", "y")))(null, "x")) // unknown OR false -> kept
    assert(!keep(Not(EqualTo("name", "x")))(3L, "x"))
    assert(keep(In("id", Array(1L, 3L)))(3L, "x"))
    assert(!keep(In("id", Array(1L, 2L)))(3L, "x"))
    assert(keep(In("id", Array(1L, null)))(3L, "x")) // null element: not definitively false
    assert(keep(StringStartsWith("name", "al"))(1L, "alpha"))
    assert(!keep(StringStartsWith("name", "be"))(1L, "alpha"))
    // float semantics must match Spark's filter, not java's total order:
    // -0.0 == 0.0 (a compare-based skip would silently lose the row, and
    // the residual filter can never resurrect it); NaN comparisons are
    // punted to the residual (unknown -> kept)
    val dschema = StructType(Seq(StructField("score", DoubleType)))
    def keepD(fs: Filter*)(values: Any*): Boolean =
      graft.sources.ProtoFilterEval.compile(fs.toArray, dschema)(values.toSeq)
    assert(keepD(EqualTo("score", 0.0))(-0.0))
    assert(keepD(GreaterThanOrEqual("score", 0.0))(-0.0))
    assert(!keepD(LessThan("score", 0.0))(-0.0))
    assert(keepD(EqualTo("score", Double.NaN))(Double.NaN)) // unknown, kept
    assert(keepD(GreaterThan("score", 1.0))(Double.NaN))    // unknown, kept
  }

  test("overwrite truncates: old shards and contract retired, new schema wins") {
    val dir = tmpDir("gpb-ovr")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    val session = spark
    import session.implicits._
    val replacement = Seq((100L, "only")).toDF("id", "tag")
    replacement.write.mode("overwrite").format("graft-proto").save(dir)
    val back = spark.read.format("graft-proto").load(dir)
    assert(back.schema.fieldNames.toSeq === Seq("id", "tag"))
    assert(back.as[(Long, String)].collect().toSeq === Seq((100L, "only")))
    // no stale shard from the first write survives the truncating commit
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".gpb")).toSeq
    assert(files.size === replacement.rdd.getNumPartitions, files)
  }

  test("append under an evolved/reordered schema is refused (positional contract)") {
    val dir = tmpDir("gpb-appendguard")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    // same column set, different order → different positional field numbers;
    // silently accepting it would mis-decode the first write's shards
    val reordered = sampleDf.select("name", "id", "score", "lang")
    val err = intercept[Exception] {
      reordered.write.mode("append").format("graft-proto").save(dir)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("does not match the directory contract")),
      err.toString)
    // the refused write leaves the directory exactly as it was
    assert(spark.read.format("graft-proto").load(dir).count() === 3)
    // identical-contract append still works
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    assert(spark.read.format("graft-proto").load(dir).count() === 6)
  }

  test("shard names carry a per-write token — cross-application appends cannot collide") {
    val dir = tmpDir("gpb-token")
    sampleDf.repartition(1).write.mode("append").format("graft-proto").save(dir)
    sampleDf.repartition(1).write.mode("append").format("graft-proto").save(dir)
    val names = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".gpb")).toSeq.sorted
    val pat = "part-\\d{5}-\\d+-([0-9a-f]{8})\\.gpb".r
    val tokens = names.map { n =>
      val m = pat.findFirstMatchIn(n)
      assert(m.isDefined, s"shard name $n lacks the job token")
      m.get.group(1)
    }
    // two writes → two distinct tokens, so identical (partitionId, taskId)
    // pairs from a fresh SparkContext can never overwrite earlier shards
    assert(tokens.distinct.size === 2, names)
    assert(spark.read.format("graft-proto").load(dir).count() === 6)
  }

  test("truncated shard fails loudly, not with silent row loss") {
    val dir = tmpDir("gpb-trunc")
    sampleDf.write.mode("append").format("graft-proto").save(dir)
    val shard = Files.list(Paths.get(dir)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".gpb")).get
    val bytes = Files.readAllBytes(shard)
    Files.write(shard, java.util.Arrays.copyOf(bytes, bytes.length - 1))
    val err = intercept[Exception] {
      spark.read.format("graft-proto").load(dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(m =>
      m.contains("truncated") || m.contains("EOF")), err.toString)
  }
}
