package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Quiesce the session between timed passes: blocking unpersist of every
    * scoped cache, a full cache-manager clear (anything persisted outside
    * ScopedCache), and a GC settle. Round 3 showed what happens otherwise:
    * q84 persists a subtree, `unpersist(blocking = false)` leaves its
    * blocks draining, and the next two queries in name-sorted order
    * (q90/q91 — trivial scans) measured 13×/6× slow. Timings must charge
    * each query its own work and nothing else.
    */
  private def settle(spark: SparkSession): Unit = {
    graft.functions.ScopedCache.clear(blocking = true)
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(150)
  }

  // Locale.ROOT: the f-interpolator uses the default locale, which would
  // emit comma decimals (invalid JSON) on e.g. de_DE JVMs
  private def fmt(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-bench")
    // warm generic infra (executor threads, parquet reader, codegen cache
    // for trivial plans) so the first timed query isn't charged JVM setup
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // median-of-3 per query: pass 1 pays plan compile/codegen/JIT, passes
    // 2-3 measure steady state; the median damps one-off host noise
    // without letting warmup leak into the headline number. Per-pass
    // times are emitted so drift vs JIT is distinguishable downstream.
    // Any failed pass puts the query in the errors list (stderr carries
    // the exception).
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val perPass = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    // optional args = query-name prefixes for targeted A/B probes
    // (`runMain graft.Bench q77 q78`); no args = the full judged set
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      args.isEmpty || args.exists(name.startsWith)
    }
    val results = selected.map { case (name, fn) =>
      val times = (1 to 3).flatMap { _ =>
        // cache-cold per pass: each pass pays the query's full dataflow
        // (incl. any subtree the query persists internally), and nothing
        // left over from the previous query or pass
        settle(spark)
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
      if (times.size < 3) errors += name
      perPass(name) = times
      // with 2 surviving passes sorted(size/2) would pick the LARGER one
      // (usually the JIT-laden first pass) — report the min instead
      val median =
        if (times.isEmpty) -1.0
        else if (times.size == 2) times.min
        else times.sorted.apply(times.size / 2)
      name -> median
    }.toMap
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val passes = perPass.map { case (k, ts) =>
      s"\"" + k + "\":" + ts.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"passes":$passes,"errors":$errs,"sf":"$sfDir"}"""
    // full detail (per-query medians + per-pass arrays) goes to a file;
    // the driver captures only a ~2000-char stdout TAIL, and rounds 1-5
    // all show parsed:null in BENCH_r*.json because this full line is
    // ~8 KB — its head (the total) never survived the tail window
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $out failed: ${e.getMessage}") }
    // stdout gets a COMPACT line sized to fit the tail window whole:
    // query keys shortened to their qNN id (the full names are the id
    // plus a suffix; bench_out.json carries them), 2-decimal seconds,
    // passes omitted. At 180+ queries even the short form outgrew the
    // driver's ~2000-char capture (BENCH_r11 parsed:null), so the map
    // now carries only the SLOWEST 80 queries — the ones a level read
    // actually looks at — plus a remainder rollup ("rest_n" queries
    // summing "rest_sec" seconds); bench_out.json keeps the full map.
    // Printed last so nothing of ours pushes it out.
    def fmt2(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val ok = results.toSeq.filter(_._2 >= 0)
    val slowest = ok.sortBy(-_._2).take(80)
    val rest = ok.sortBy(-_._2).drop(80)
    val shortQs = slowest.sortBy(_._1).map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + fmt2(v)
    }.mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$shortQs,"rest_n":${rest.size},"rest_sec":${fmt2(rest.map(_._2).sum)},"errors":$errs,"sf":"$sfDir"}"""
    // stop() first: its stderr chatter must not land after the JSON line
    // in a merged capture. The finally guarantees the line is emitted (and
    // last) even if stop() throws; build.sbt's StdoutOutput + showSuccess
    // settings keep sbt from prefixing it or appending a trailer.
    try spark.stop()
    finally {
      println(compact)
      System.out.flush()
    }
  }
}
