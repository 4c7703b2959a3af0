package graft

import org.apache.spark.sql.SparkSession

/** Shared session for suites (one JVM-wide session via getOrCreate). */
trait SparkSpec {
  lazy val spark: SparkSession = GraftSession.get("graft-test")
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
