package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Serialization / schema surface (SURVEY.md §2.1 S7/S10): explicit
  * declared schemas (the Schema-Registry model, kafka/README.md:294-296 —
  * no inference on production paths), JSON payload encode/decode with a
  * declared StructType, CSV/JSON connector round-trips, and a
  * schema-compatibility gate applied before a source is consumed
  * (kafka/README.md:389-399).
  */
object Serde {

  /** Declared schema of the `events` topic/table (FIXTURES.md). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Declared schema of the JSON `props` payload. */
  val propsSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** Schema-compatibility gate: a reader declares the schema it consumes;
    * the source must carry every declared field with the declared type
    * (extra producer-side fields are allowed — consumer-side forward
    * compatibility, kafka/README.md:296). Throws on incompatibility. */
  def requireCompatible(df: DataFrame, declared: StructType): DataFrame = {
    val byName = df.schema.map(f => f.name -> f.dataType).toMap
    val missing = declared.filterNot(f => byName.get(f.name).contains(f.dataType))
    require(missing.isEmpty,
      s"source schema incompatible; missing/mistyped: ${missing.map(_.name).mkString(", ")}")
    df.select(declared.map(f => col(f.name)): _*)
  }

  /** Deserialize the JSON payload with the declared schema (schema-on-read
    * with an explicit contract — never schema inference). */
  def decodeProps(events: DataFrame): DataFrame =
    events.withColumn("props_struct", from_json(col("props"), propsSchema))

  /** Serialize selected columns back to a JSON value column (the producer
    * serializer analog, kafka/README.md:74-76). */
  def encodeAsJson(df: DataFrame, cols: Seq[String]): DataFrame =
    df.withColumn("json_value", to_json(struct(cols.map(col): _*)))

  /** CSV connector round-trip (Kafka-Connect-style source/sink, S7). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON-lines connector round-trip (S7). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Sharded dataset export — the final step of a training-data pipeline:
    * hive-partition the corpus by a routing column (e.g. lang or split)
    * and cap records per output file so downstream loaders stream
    * fixed-size shards instead of one multi-GB file per partition.
    * `maxRecordsPerFile` does the capping inside each write task — no
    * extra shuffle beyond the optional `repartition` the caller controls;
    * at 100 TB the cap is what keeps any single shard re-readable and
    * retryable. */
  def writeShardedParquet(df: DataFrame, path: String, partitionCol: String,
                          maxRecordsPerFile: Int): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCol)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .parquet(path)
}
