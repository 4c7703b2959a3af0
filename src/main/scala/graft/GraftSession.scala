package graft

import org.apache.spark.sql.SparkSession

/** Single session factory so Bench / Verify / tests share one config
  * posture (SURVEY.md §7.3-5): UTC session timezone (oracle parity),
  * AQE on (runtime re-plan = the elastic-scaling answer, SURVEY.md §4),
  * shuffle partitions sized to the local core count rather than the
  * 200 default (local[N] = N executor threads in one JVM).
  *
  * At cluster scale the same code runs unchanged: only master /
  * shuffle-partition sizing are env-driven here.
  */
object GraftSession {

  /** Core count: SPARK_GRAFT_CPUS env if the driver set it (positive
    * integers only), else all. */
  def cpus: Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(s => scala.util.Try(s.toInt).toOption)
      .filter(_ > 0)
      .getOrElse(Runtime.getRuntime.availableProcessors())

  def builder(appName: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
    // master precedence: spark-submit's (spark.master system property),
    // then an explicit SPARK_MASTER env, then local[cores]
    if (!sys.props.contains("spark.master"))
      b.master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
    b.config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bounded driver bookkeeping: a 500+-action bench/verify session
      // otherwise accumulates thousands of retained SQL executions /
      // jobs / stages / tasks in the AppStatus stores (the UI is off,
      // but its listeners are not) — measured r12: the same query reads
      // 2.3 s standalone and 15.8 s as query ~150 of a 182-query sweep,
      // with the gap tracking old-gen growth, not ambient load
      .config("spark.sql.ui.retainedExecutions", "8")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects by default; read as long nanos, converted back to
      // TimestampType in Tables.events (truncation to micros matches what
      // DuckDB does when it reads the same file).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // fixture timestamps are NAIVE parquet micros (isAdjustedToUTC=
      // false); with NTZ inference on, Spark 4 would surface them as
      // TIMESTAMP_NTZ — a type unix_micros/window() reject and the serde
      // schemas don't model. Read them as TimestampType instead: with the
      // UTC session timezone above, the stored values are the same
      // instants DuckDB sees, so oracle parity is unchanged.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
