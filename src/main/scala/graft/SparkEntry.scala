package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-family modules (SURVEY.md §2 inventory);
  * each carries its DuckDB oracle SQL when SQL-expressible.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    Relational,
    Analytics,
    EventLog,
    TextOps,
    Dedup,
    SpanDedup,
    Similarity,
    Multimodal,
    Curation,
    Profiling,
  )

  private lazy val all: Seq[GraftQuery] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Each run
    * self-heals function registration so queries also work on sessions
    * not built via GraftSession. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { q =>
      q.name -> { (spark: SparkSession, dir: String) =>
        graft.functions.GraftFunctions.ensureRegistered(spark)
        q.run(spark, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
