package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: a Spark implementation over an sf fixture dir, plus
  * (when SQL-expressible) the equivalent ANSI SQL the driver runs in
  * DuckDB over the same parquet tables for the hash compare. Queries
  * without an oracle get the weaker rows-only check (driver contract,
  * SparkEntry.scala).
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait QueryModule {
  def queries: Seq[GraftQuery]
}
