package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    // warm generic infra (executor threads, parquet reader, codegen cache
    // for trivial plans) so the first timed query isn't charged JVM setup
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // best-of-2 per query: the first pass pays plan compile/codegen/JIT,
    // the second measures steady state; reporting the min damps host
    // noise without hiding real regressions. Any failed pass puts the
    // query in the errors list (stderr carries the exception).
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        // cache-cold per pass: the min isolates JIT/compile warmup but
        // must still pay each query's full dataflow (incl. any subtree a
        // query persists internally)
        graft.functions.ScopedCache.clear()
        val t0 = System.nanoTime()
        try {
          // noop sink, not count(): count() would let Catalyst prune the
          // per-row projections and sorts — the work being measured
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      if (times.size < 2) errors += name
      name -> (if (times.nonEmpty) times.min else -1.0)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    println(line)
    // also persist the line to a file: the driver captures only a stdout
    // tail, and round 1 showed the leading total can get truncated there
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    spark.stop()
  }
}
