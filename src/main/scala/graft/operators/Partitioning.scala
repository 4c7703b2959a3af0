package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning & skew utilities (SURVEY.md §2.3 K2-K4 + §2.12 scale
  * posture): explicit keyed repartitioning (the hash(key)→partition
  * contract, kafka/README.md:22), custom routing expressions (the custom
  * `Partitioner` analog, kafka/README.md:24), and key salting — the
  * classic answer to hot keys that AQE's skew-join handling doesn't cover
  * (e.g. skewed aggregation keys at 100 TB).
  */
object Partitioning {

  /** Hash-partition by key: same key → same partition, the per-key
    * ordering precondition (kafka/README.md:374-376). */
  def byKey(df: DataFrame, numPartitions: Int, key: Column): DataFrame =
    df.repartition(numPartitions, key)

  /** Custom routing expression (custom-Partitioner analog): any
    * deterministic expression over the row decides placement. */
  def byExpression(df: DataFrame, numPartitions: Int, route: Column): DataFrame =
    df.repartition(numPartitions, route)

  /** Round-robin rebalance (keyless, kafka/README.md:21). */
  def rebalance(df: DataFrame, numPartitions: Int): DataFrame =
    df.repartition(numPartitions)

  /** Two-phase salted sum for skewed grouping keys: phase 1 aggregates on
    * (key, salt) — spreading a hot key over `saltBuckets` reducers — and
    * phase 2 combines the partials per key. Result is identical to a
    * direct groupBy(key).sum because sum is associative/commutative; only
    * the shuffle layout changes.
    *
    * The salt must be DETERMINISTIC under task retry (a recomputed
    * partition must re-derive the same salts or partials could
    * double-count), which rules out monotonically_increasing_id/rand.
    * Default: hash of (spark_partition_id, hashable columns) — partition
    * ids are stable under recomputation, and including them spreads even
    * byte-identical duplicate rows that sit in different partitions (the
    * heartbeat-skew shape). Map-typed columns are excluded (hash()
    * rejects MapType). */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                saltBuckets: Int = 16): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => containsMap(f.dataType))
      case a: ArrayType => containsMap(a.elementType)
      case _ => false
    }
    val hashable = df.schema.fields
      .filterNot(f => containsMap(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    val salted = df.withColumn("__salt",
      pmod(hash(spark_partition_id() +: hashable: _*), lit(saltBuckets)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("total"))
  }
}
