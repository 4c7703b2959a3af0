package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DoubleType, FloatType, IntegerType, LongType, MapType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StatsAggregator
import graft.operators.Partitioning
import graft.sources.{Serde, Tables}

/** Serde/schema-gate (S10), connector round-trips (S7), custom typed
  * aggregate (A2), and partitioning/salting semantics (K2-K4).
  */
class SerdePartitioningSpec extends AnyFunSuite with SparkSpec {

  test("schema gate accepts compatible sources and rejects drift (S10)") {
    val e = Tables.events(spark, sf0001)
    assert(Serde.requireCompatible(e, Serde.eventSchema).columns.length === 6)
    // extra producer-side column is forward-compatible
    val extra = e.withColumn("new_field", lit(1))
    assert(Serde.requireCompatible(extra, Serde.eventSchema).columns.length === 6)
    // missing column is rejected
    val broken = e.drop("value")
    val err = intercept[IllegalArgumentException] {
      Serde.requireCompatible(broken, Serde.eventSchema)
    }
    assert(err.getMessage.contains("value"))
    // mistyped column is rejected
    val mistyped = e.withColumn("value", col("value").cast("string"))
    intercept[IllegalArgumentException] {
      Serde.requireCompatible(mistyped, Serde.eventSchema)
    }
  }

  test("JSON payload decodes with the declared schema and re-encodes (S10)") {
    val session = spark
    import session.implicits._
    val e = Tables.events(spark, sf0001)
    val decoded = Serde.decodeProps(e)
    val ks = decoded.select($"props_struct.k").na.drop().as[Int].collect()
    assert(ks.nonEmpty && ks.forall(_ >= 0))
    val encoded = Serde.encodeAsJson(e.limit(1), Seq("event_id", "event_type"))
    val js = encoded.select($"json_value").as[String].head()
    assert(js.startsWith("{") && js.contains("\"event_type\""))
  }

  test("CSV and JSON connectors round-trip with declared schemas (S7)") {
    val e = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value")
    val schema = e.schema
    val csvDir = Files.createTempDirectory("graft-csv").toString
    val jsonDir = Files.createTempDirectory("graft-json").toString
    Serde.writeCsv(e, csvDir)
    Serde.writeJson(e, jsonDir)
    val fromCsv = Serde.readCsv(spark, csvDir, schema)
    val fromJson = Serde.readJson(spark, jsonDir, schema)
    assert(fromCsv.exceptAll(e).count() === 0 && e.exceptAll(fromCsv).count() === 0)
    assert(fromJson.exceptAll(e).count() === 0 && e.exceptAll(fromJson).count() === 0)
  }

  test("Avro serde round-trips rows with a declared schema (S10)") {
    val e = Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value")
    val writerJson = sources.AvroSerde.avroSchema(e.schema).toString
    val bytes = sources.AvroSerde.encode(e)
    assert(bytes.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq
      === Seq(("value", "binary")))
    val back = sources.AvroSerde.decode(bytes, writerJson, e.schema)
    assert(back.exceptAll(e).count() === 0 && e.exceptAll(back).count() === 0)
  }

  test("Avro schema evolution: added nullable field defaults, dropped field skipped (S10)") {
    val e = Tables.events(spark, sf0001).select("event_id", "event_type", "value")
    val writerJson = sources.AvroSerde.avroSchema(e.schema).toString
    val bytes = sources.AvroSerde.encode(e)
    // backward: reader adds a nullable field → Avro default null fills it
    val widened = e.schema.add(StructField("score", DoubleType, nullable = true))
    val withNew = sources.AvroSerde.decode(bytes, writerJson, widened)
    assert(withNew.count() === e.count())
    assert(withNew.filter(col("score").isNotNull).count() === 0)
    // forward: reader drops a writer field → resolution skips those bytes
    val narrowed = StructType(e.schema.filter(_.name != "event_type"))
    val dropped = sources.AvroSerde.decode(bytes, writerJson, narrowed)
    assert(dropped.columns.toSeq === Seq("event_id", "value"))
    assert(dropped.exceptAll(e.select("event_id", "value")).count() === 0)
  }

  test("Avro compatibility gate rejects an unreadable reader schema (S10)") {
    val e = Tables.events(spark, sf0001).select("event_id", "event_type")
    val writerJson = sources.AvroSerde.avroSchema(e.schema).toString
    val bytes = sources.AvroSerde.encode(e)
    // a new REQUIRED field (non-nullable, no default) is not backward
    // compatible — the gate must throw before any record is decoded
    val breaking = e.schema.add(StructField("required_new", LongType, nullable = false))
    val err = intercept[IllegalArgumentException] {
      sources.AvroSerde.decode(bytes, writerJson, breaking)
    }
    assert(err.getMessage.contains("incompatible"))
    // type change (long → string) is likewise rejected
    val mistyped = StructType(e.schema.map(f =>
      if (f.name == "event_id") f.copy(dataType = StringType) else f))
    intercept[IllegalArgumentException] {
      sources.AvroSerde.decode(bytes, writerJson, mistyped)
    }
  }

  test("Proto serde golden bytes match the public wire-format spec (S10)") {
    val session = spark
    import session.implicits._
    // protobuf.dev's canonical examples: field 1 = varint 150 encodes as
    // 08 96 01; field 2 = string "testing" as 12 07 74 65 73 74 69 6e 67
    val one = Seq((150L, "testing")).toDF("a", "b")
    val bytes = sources.ProtoSerde.encode(one).collect().head.getAs[Array[Byte]](0)
    val expect = Array(0x08, 0x96, 0x01, 0x12, 0x07) ++ "testing".getBytes("UTF-8").map(_.toInt)
    assert(bytes.map(_ & 0xff).toSeq === expect.map(_ & 0xff).toSeq)
  }

  test("Proto serde round-trips all supported types incl. negatives and nulls (S10)") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("b", BooleanType), StructField("d", DoubleType),
      StructField("f", FloatType), StructField("s", StringType),
      StructField("raw", BinaryType)))
    val rows = Seq(
      Row(-42L, -7, true, -1.5, 2.5f, "héllo", Array[Byte](0, 1, 127)),
      Row(0L, 0, false, 0.0, 0.0f, "", Array.empty[Byte]),
      Row(null, null, null, null, null, null, null),
      Row(Long.MaxValue, Int.MinValue, true, Double.MinPositiveValue, Float.NaN, "x", null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val writer = sources.ProtoSerde.protoSchema(schema)
    val back = sources.ProtoSerde.decode(sources.ProtoSerde.encode(df), writer, schema)
    assert(back.exceptAll(df).count() === 0 && df.exceptAll(back).count() === 0)
  }

  test("Proto serde on the events table matches Avro's round-trip contract (S10)") {
    // the FULL event record, timestamp included (epoch-micros varint)
    val e = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val writer = sources.ProtoSerde.protoSchema(e.schema)
    val bytes = sources.ProtoSerde.encode(e)
    assert(bytes.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq
      === Seq(("value", "binary")))
    val back = sources.ProtoSerde.decode(bytes, writer, e.schema)
    assert(back.exceptAll(e).count() === 0 && e.exceptAll(back).count() === 0)
  }

  test("Proto evolution resolves by field NUMBER: middle drop + add default (S10)") {
    val e = Tables.events(spark, sf0001)
      .select("event_id", "event_type", "value")
    val writer = sources.ProtoSerde.protoSchema(e.schema)
    val bytes = sources.ProtoSerde.encode(e)
    // forward: reader drops the MIDDLE field — surviving fields must keep
    // their writer numbers (positional renumbering would misread `value`'s
    // fixed64 bytes as field 2)
    val narrowed = StructType(e.schema.filter(_.name != "event_type"))
    val dropped = sources.ProtoSerde.decode(bytes, writer, narrowed)
    assert(dropped.columns.toSeq === Seq("event_id", "value"))
    assert(dropped.exceptAll(e.select("event_id", "value")).count() === 0)
    // backward: reader adds a nullable field → absent on wire → null
    val widened = e.schema.add(StructField("score", DoubleType, nullable = true))
    val withNew = sources.ProtoSerde.decode(bytes, writer, widened)
    assert(withNew.count() === e.count())
    assert(withNew.filter(col("score").isNotNull).count() === 0)
  }

  test("Proto embedded-message golden bytes match the spec's Test3 example (S10)") {
    // protobuf.dev Test3: field 3 = embedded message whose field 1 = 150
    // encodes as 1a 03 08 96 01 (fields 1/2 absent)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", StructType(Seq(StructField("inner", LongType))))))
    val rows = Seq(Row(null, null, Row(150L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val bytes = sources.ProtoSerde.encode(df).collect().head.getAs[Array[Byte]](0)
    assert(bytes.map(_ & 0xff).toSeq === Seq(0x1a, 0x03, 0x08, 0x96, 0x01))
  }

  test("Proto decoder accepts the spec's PACKED repeated example (S10)") {
    // protobuf.dev Test4: repeated int32 d = 4 with [3, 270, 86942] packs
    // as 22 06 03 8e 02 9e a7 05 — written by stock proto3 writers; this
    // codec writes unpacked but must read both
    val session = spark
    import session.implicits._
    val wire = Array(0x22, 0x06, 0x03, 0x8e, 0x02, 0x9e, 0xa7, 0x05).map(_.toByte)
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType),
      StructField("d", ArrayType(IntegerType, containsNull = false))))
    val writer = sources.ProtoSerde.protoSchema(schema)
    val bytesDf = Seq(wire).toDF("value")
    val back = sources.ProtoSerde.decode(bytesDf, writer, schema).collect().head
    assert(back.getSeq[Int](3) === Seq(3, 270, 86942))
    assert(back.isNullAt(0) && back.isNullAt(1) && back.isNullAt(2))
  }

  test("Proto nested + repeated round-trip, absent repeated decodes empty (S10)") {
    val inner = StructType(Seq(
      StructField("k", StringType), StructField("n", LongType)))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType, containsNull = false)),
      StructField("meta", inner),
      StructField("pts", ArrayType(inner, containsNull = false))))
    val rows = Seq(
      Row(1L, Seq("x", "y"), Row("k1", 7L), Seq(Row("a", 1L), Row("b", null))),
      Row(2L, Seq.empty[String], null, Seq.empty[Row]),
      Row(3L, null, Row(null, null), null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val writer = sources.ProtoSerde.protoSchema(schema)
    val back = sources.ProtoSerde.decode(sources.ProtoSerde.encode(df), writer, schema)
      .collect().sortBy(_.getLong(0))
    assert(back(0).getSeq[String](1) === Seq("x", "y"))
    assert(back(0).getStruct(2) === Row("k1", 7L))
    assert(back(0).getSeq[Row](3) === Seq(Row("a", 1L), Row("b", null)))
    // proto3 has no presence for repeated: both empty-written and
    // null-written arrays come back EMPTY; absent scalars stay null
    assert(back(1).getSeq[String](1) === Seq.empty && back(1).getSeq[Row](3) === Seq.empty)
    assert(back(1).isNullAt(2))
    assert(back(2).getSeq[String](1) === Seq.empty)
    assert(back(2).getStruct(2) === Row(null, null))
  }

  test("Proto nested evolution: inner field drop resolves by number (S10)") {
    val inner = StructType(Seq(
      StructField("k", StringType), StructField("drop_me", LongType),
      StructField("n", LongType)))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("meta", inner)))
    val rows = Seq(Row(1L, Row("k1", 99L, 7L)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val writer = sources.ProtoSerde.protoSchema(schema)
    // the reader drops the MIDDLE inner field: survivor `n` must keep
    // inner number 3, not renumber to 2 (= drop_me's varint bytes)
    val readerInner = StructType(Seq(
      StructField("k", StringType), StructField("n", LongType)))
    val reader = StructType(Seq(
      StructField("id", LongType), StructField("meta", readerInner)))
    val back = sources.ProtoSerde.decode(sources.ProtoSerde.encode(df), writer, reader)
      .collect().head
    assert(back.getStruct(1) === Row("k1", 7L))
    // and a nested TYPE change is rejected by the recursive gate
    val badInner = StructType(Seq(
      StructField("k", LongType), StructField("n", LongType)))
    val bad = StructType(Seq(
      StructField("id", LongType), StructField("meta", badInner)))
    val err = intercept[IllegalArgumentException] {
      sources.ProtoSerde.decode(sources.ProtoSerde.encode(df), writer, bad)
    }
    assert(err.getMessage.contains("meta.k"))
  }

  test("Proto scalar<->repeated evolution and null repeated elements (S10)") {
    val session = spark
    import session.implicits._
    // scalar-written data read as repeated -> singleton list; repeated-
    // written read as scalar -> last one wins (protobuf's actual rules)
    val scalarDf = Seq(Tuple1(5L)).toDF("v")
    val wScalar = sources.ProtoSerde.protoSchema(scalarDf.schema)
    val asRepeated = StructType(Seq(
      StructField("v", ArrayType(LongType, containsNull = false))))
    val up = sources.ProtoSerde.decode(
      sources.ProtoSerde.encode(scalarDf), wScalar, asRepeated).collect().head
    assert(up.getSeq[Long](0) === Seq(5L))
    val repDf = Seq(Tuple1(Seq(1L, 2L, 3L))).toDF("v")
    val wRep = sources.ProtoSerde.protoSchema(repDf.schema)
    val down = sources.ProtoSerde.decode(
      sources.ProtoSerde.encode(repDf), wRep,
      StructType(Seq(StructField("v", LongType)))).collect().head
    assert(down.getLong(0) === 3L)
    // a null element inside a repeated field fails loudly at encode
    val withNull = Seq(Tuple1(Seq[java.lang.Long](1L, null))).toDF("v")
    val err = intercept[org.apache.spark.SparkException] {
      sources.ProtoSerde.encode(withNull).collect()
    }
    assert(err.getMessage.contains("repeated") ||
      Option(err.getCause).exists(_.getMessage.contains("repeated")))
  }

  test("Proto map fields use the spec's repeated-entry encoding (S10)") {
    val session = spark
    import session.implicits._
    // map<string,int64> {"a": 1} at field 1: entry message = key (0a 01
    // 61) + value (10 01), tagged length-delimited -> 0a 05 0a 01 61 10 01
    val one = Seq(Tuple1(Map("a" -> 1L))).toDF("m")
    val bytes = sources.ProtoSerde.encode(one).collect().head.getAs[Array[Byte]](0)
    assert(bytes.map(_ & 0xff).toSeq === Seq(0x0a, 0x05, 0x0a, 0x01, 0x61, 0x10, 0x01))
    // round-trip incl. struct values, empty and null maps, null values
    val inner = StructType(Seq(StructField("n", LongType)))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("attrs", MapType(StringType, StringType)),
      StructField("objs", MapType(StringType, inner))))
    val rows = Seq(
      Row(1L, Map("k1" -> "v1", "k2" -> null), Map("o" -> Row(7L))),
      Row(2L, Map.empty[String, String], null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val writer = sources.ProtoSerde.protoSchema(schema)
    val back = sources.ProtoSerde.decode(sources.ProtoSerde.encode(df), writer, schema)
      .collect().sortBy(_.getLong(0))
    assert(back(0).getMap[String, String](1) === Map("k1" -> "v1", "k2" -> null))
    assert(back(0).getMap[String, Row](2) === Map("o" -> Row(7L)))
    // no presence for maps either: empty- and null-written both come back empty
    assert(back(1).getMap[String, String](1).isEmpty && back(1).getMap[String, Row](2).isEmpty)
    // duplicate keys on the wire (legal from stock writers): last wins
    val dup = (bytes ++ Array(0x0a, 0x05, 0x0a, 0x01, 0x61, 0x10, 0x09).map(_.toByte))
    val dupBack = sources.ProtoSerde.decode(
      Seq(dup).toDF("value"), sources.ProtoSerde.protoSchema(one.schema), one.schema)
      .collect().head
    assert(dupBack.getMap[String, Long](0) === Map("a" -> 9L))
  }

  test("Proto stock-writer edge cases: default map key, message merge, packed-to-scalar (S10)") {
    val session = spark
    import session.implicits._
    // 1. a stock proto3 writer omits a DEFAULT map key from the entry:
    //    entry bytes carry only the value (10 05) — the key must decode
    //    as "" (its default), never as a null map key
    val mapSchema = StructType(Seq(StructField("m", MapType(StringType, LongType))))
    val keylessEntry = Array(0x0a, 0x02, 0x10, 0x05).map(_.toByte)
    val m = sources.ProtoSerde.decode(Seq(keylessEntry).toDF("value"),
      sources.ProtoSerde.protoSchema(mapSchema), mapSchema).collect().head
    assert(m.getMap[String, Long](0) === Map("" -> 5L))
    // 2. concatenated encodings of a message MERGE field-by-field (the
    //    spec's concatenation rule), not last-occurrence-wins wholesale:
    //    two occurrences of struct field 1, first sets k="a" (0a 03 0a 01
    //    61), second sets n=7 (0a 02 10 07)
    val inner = StructType(Seq(StructField("k", StringType), StructField("n", LongType)))
    val structSchema = StructType(Seq(StructField("meta", inner)))
    val twoOccurrences = Array(
      0x0a, 0x03, 0x0a, 0x01, 0x61,  // meta { k: "a" }
      0x0a, 0x02, 0x10, 0x07         // meta { n: 7 }
    ).map(_.toByte)
    val merged = sources.ProtoSerde.decode(Seq(twoOccurrences).toDF("value"),
      sources.ProtoSerde.protoSchema(structSchema), structSchema).collect().head
    assert(merged.getStruct(0) === Row("a", 7L))
    // 3. a PACKED repeated blob read under a scalar-evolved reader takes
    //    the last element (protobuf's last-one-wins), not null
    val packed = Array(0x0a, 0x03, 0x03, 0x8e, 0x02).map(_.toByte) // [3, 270]
    val repWriter = sources.ProtoSerde.protoSchema(StructType(Seq(
      StructField("v", ArrayType(LongType, containsNull = false)))))
    val scalarReader = StructType(Seq(StructField("v", LongType)))
    val last = sources.ProtoSerde.decode(Seq(packed).toDF("value"),
      repWriter, scalarReader).collect().head
    assert(last.getLong(0) === 270L)
  }

  test("Proto compatibility gate rejects a type change on a shared field (S10)") {
    val e = Tables.events(spark, sf0001).select("event_id", "event_type")
    val writer = sources.ProtoSerde.protoSchema(e.schema)
    val bytes = sources.ProtoSerde.encode(e)
    val mistyped = StructType(e.schema.map(f =>
      if (f.name == "event_id") f.copy(dataType = StringType) else f))
    val err = intercept[IllegalArgumentException] {
      sources.ProtoSerde.decode(bytes, writer, mistyped)
    }
    assert(err.getMessage.contains("incompatible"))
  }

  test("Proto oneof: last member on the wire wins and clears its peers (S10)") {
    val session = spark
    import session.implicits._
    // oneof {a: string = 1, b: int64 = 2}; wire bytes place BOTH members
    // in one record — the spec's parse rule keeps only the LAST one
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", LongType)))
    val writer = sources.ProtoSerde.protoSchema(schema)
    val aBytes = Array[Byte](0x0A, 3, 'o', 'l', 'd')          // a = "old"
    val bBytes = Array[Byte](0x10, 0x96.toByte, 0x01)         // b = 150
    val aThenB = sources.ProtoSerde.decode(Seq(aBytes ++ bBytes).toDF("value"),
      writer, schema, oneofs = Seq(Seq("a", "b"))).collect().head
    assert(aThenB.isNullAt(0) && aThenB.getLong(1) === 150L)
    val bThenA = sources.ProtoSerde.decode(Seq(bBytes ++ aBytes).toDF("value"),
      writer, schema, oneofs = Seq(Seq("a", "b"))).collect().head
    assert(bThenA.getString(0) === "old" && bThenA.isNullAt(1))
    // the serializer side makes the two-members-set state unrepresentable
    val both = Seq(("x", 1L)).toDF("a", "b")
    val err = intercept[Exception] {
      sources.ProtoSerde.encode(both, oneofs = Seq(Seq("a", "b"))).collect()
    }
    // Option-wrapped: a cause-less exception must fail the assertion,
    // not NPE it
    assert(Option(err.getMessage).exists(_.contains("oneof violation"))
      || Option(err.getCause).flatMap(c => Option(c.getMessage))
           .exists(_.contains("oneof violation")))
  }

  test("Proto3 implicit presence: zero-valued singular fields leave the wire (S10)") {
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("d", DoubleType)))
    val writer = sources.ProtoSerde.protoSchema(schema)
    def df(rows: Row*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
    def firstBytes(frame: org.apache.spark.sql.DataFrame) =
      frame.collect().head.getAs[Array[Byte]](0)
    // golden: the all-defaults record is ZERO bytes, like a stock proto3
    // writer without `optional`
    val allZero = Row(0L, "", false, 0.0)
    assert(firstBytes(sources.ProtoSerde.encode(df(allZero),
      implicitPresence = true)).isEmpty)
    // ... while the explicit-presence contract (the default) writes the
    // zero varint: golden 08 00
    assert(firstBytes(sources.ProtoSerde.encode(df(Row(0L, null, null, null))))
      .map(_ & 0xff).toSeq === Seq(0x08, 0x00))
    // non-default values are byte-identical in both modes (spec example)
    val set = Row(150L, "testing", null, null)
    assert(firstBytes(sources.ProtoSerde.encode(df(set), implicitPresence = true)).toSeq
      === firstBytes(sources.ProtoSerde.encode(df(set))).toSeq)
    // decode of the EMPTY record materializes zeros under implicit
    // presence — and nulls under the explicit contract
    val session = spark
    import session.implicits._
    val empty = Seq(Array.empty[Byte]).toDF("value")
    val zeros = sources.ProtoSerde.decode(empty, writer, schema,
      implicitPresence = true).collect().head
    assert(zeros === Row(0L, "", false, 0.0))
    val nulls = sources.ProtoSerde.decode(empty, writer, schema).collect().head
    assert((0 until 4).forall(nulls.isNullAt))
    // full round trip: zeros -> empty wire -> zeros
    val back = sources.ProtoSerde.decode(
      sources.ProtoSerde.encode(df(allZero), implicitPresence = true),
      writer, schema, implicitPresence = true).collect().head
    assert(back === allZero)
    // the documented proto3 wire fact: -0.0 compares == 0, is omitted by
    // stock writers, and reads back as +0.0
    val negZero = sources.ProtoSerde.decode(
      sources.ProtoSerde.encode(df(Row(null, null, null, -0.0)),
        implicitPresence = true),
      writer, schema, implicitPresence = true).collect().head
    assert(java.lang.Double.doubleToLongBits(negZero.getDouble(3)) === 0L)
  }

  test("Proto3 implicit presence: messages and oneof members keep explicit presence (S10)") {
    val session = spark
    import session.implicits._
    // nested message, all-default fields: PRESENT writes tag + length 0
    // (messages have explicit presence even in proto3) and decodes to an
    // all-zeros row; ABSENT stays null
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("m", StructType(Seq(
        StructField("x", LongType), StructField("s", StringType))))))
    val writer = sources.ProtoSerde.protoSchema(nested)
    val present = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(0L, Row(0L, ""))), 1), nested)
    val pBytes = sources.ProtoSerde.encode(present, implicitPresence = true)
      .collect().head.getAs[Array[Byte]](0)
    assert(pBytes.map(_ & 0xff).toSeq === Seq(0x12, 0x00)) // field 2, len 0
    val pBack = sources.ProtoSerde.decode(
      Seq(pBytes).toDF("value"), writer, nested, implicitPresence = true)
      .collect().head
    assert(pBack === Row(0L, Row(0L, "")))
    val aBack = sources.ProtoSerde.decode(
      Seq(Array.empty[Byte]).toDF("value"), writer, nested,
      implicitPresence = true).collect().head
    assert(aBack.getLong(0) === 0L && aBack.isNullAt(1))
    // a oneof member set to its zero value still reaches the wire under
    // implicit presence (golden 08 00) — omitting it would erase WHICH
    // member was chosen — and its unset peer stays null, never zero
    val oneofSchema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val ow = sources.ProtoSerde.protoSchema(oneofSchema)
    val chosen = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(0L, null)), 1), oneofSchema)
    val oBytes = sources.ProtoSerde.encode(chosen, oneofs = Seq(Seq("a", "b")),
      implicitPresence = true).collect().head.getAs[Array[Byte]](0)
    assert(oBytes.map(_ & 0xff).toSeq === Seq(0x08, 0x00))
    val oBack = sources.ProtoSerde.decode(Seq(oBytes).toDF("value"), ow,
      oneofSchema, oneofs = Seq(Seq("a", "b")), implicitPresence = true)
      .collect().head
    assert(oBack.getLong(0) === 0L && oBack.isNullAt(1))
  }

  test("Proto oneof member arriving PACKED still clears peers; empty blob clears nothing (S10)") {
    val session = spark
    import session.implicits._
    // writer declared b REPEATED (packs numerics); reader evolved b to a
    // scalar oneof member — the packed payload's last value must win AND
    // clear sibling a, exactly like the unpacked path
    val repWriter = sources.ProtoSerde.protoSchema(StructType(Seq(
      StructField("a", StringType),
      StructField("b", ArrayType(LongType, containsNull = false)))))
    val reader = StructType(Seq(
      StructField("a", StringType), StructField("b", LongType)))
    val aBytes = Array[Byte](0x0A, 3, 'o', 'l', 'd')               // a = "old"
    val packed = Array[Byte](0x12, 3, 0x96.toByte, 0x01, 0x01)     // b = [150, 1] packed
    val got = sources.ProtoSerde.decode(Seq(aBytes ++ packed).toDF("value"),
      repWriter, reader, oneofs = Seq(Seq("a", "b"))).collect().head
    assert(got.isNullAt(0) && got.getLong(1) === 1L)
    // an EMPTY packed blob sets nothing, so it must not clear a either
    val empty = Array[Byte](0x12, 0)
    val kept = sources.ProtoSerde.decode(Seq(aBytes ++ empty).toDF("value"),
      repWriter, reader, oneofs = Seq(Seq("a", "b"))).collect().head
    assert(kept.getString(0) === "old" && kept.isNullAt(1))
  }

  test("Proto unknown-field retention: an old reader transforms and re-encodes without destroying new fields (S10)") {
    val full = StructType(Seq(
      StructField("id", LongType), StructField("typ", StringType),
      StructField("value", DoubleType)))
    val rows = Seq(Row(1L, "testing", 1.5), Row(2L, null, 2.5))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), full)
    val writer = sources.ProtoSerde.protoSchema(full)
    val bytes = sources.ProtoSerde.encode(df)
    // the OLD reader does not model `typ` (field 2): retained verbatim
    val reader = StructType(full.filter(_.name != "typ"))
    val ret = sources.ProtoSerde.decodeRetaining(bytes, writer, reader)
    assert(ret.columns.toSeq === Seq("id", "value", sources.ProtoSerde.UnknownCol))
    val byId = ret.collect().map(r => r.getLong(0) -> r).toMap
    // golden: the retained bytes ARE field 2's wire encoding (tag 0x12,
    // len 7, "testing" — protobuf.dev's canonical string example)
    val expect = Array[Byte](0x12, 0x07) ++ "testing".getBytes("UTF-8")
    assert(byId(1L).getAs[Array[Byte]](2).toSeq === expect.toSeq)
    // a record with nothing unknown carries null, not empty bytes
    assert(byId(2L).isNullAt(2))
    // transform under the old reader, then re-encode retaining
    val transformed = ret.withColumn("value", col("value") * 2)
    val contract = sources.ProtoSerde.readerContract(writer, reader)
    val re = sources.ProtoSerde.encodeRetaining(transformed, contract)
    // a FULL-schema decode of the old reader's output recovers `typ`
    val back = sources.ProtoSerde.decode(re, writer, full).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(back(1L).getString(1) === "testing" && back(1L).getDouble(2) === 3.0)
    assert(back(2L).isNullAt(1) && back(2L).getDouble(2) === 5.0)
  }

  test("ArtifactStore: builds once, reuses on match, rebuilds when the source changes") {
    val src = Files.createTempDirectory("graft-artifact-src").toFile
    val data = new java.io.File(src, "part-0.parquet")
    java.nio.file.Files.write(data.toPath, Array[Byte](1, 2, 3))
    var builds = 0
    def build(base: String): Unit = {
      builds += 1
      val t = new java.io.File(s"$base/t"); t.mkdirs()
      java.nio.file.Files.write(new java.io.File(t, "_SUCCESS").toPath, Array.empty[Byte])
    }
    val base = sources.ArtifactStore.ensure("testpfx", src.getAbsolutePath, Seq("t"))(build)
    assert(builds === 1)
    // same source state -> reuse, same path
    assert(sources.ArtifactStore.ensure("testpfx", src.getAbsolutePath, Seq("t"))(build) === base)
    assert(builds === 1)
    // regenerated fixture (same path, new content/mtime) -> rebuild
    java.nio.file.Files.write(data.toPath, Array[Byte](9, 9, 9, 9))
    data.setLastModified(data.lastModified() + 5000)
    sources.ArtifactStore.ensure("testpfx", src.getAbsolutePath, Seq("t"))(build)
    assert(builds === 2)
    // distinct dirs that sanitize identically get distinct artifact keys
    val other = Files.createTempDirectory("graft-artifact-src").toFile
    assert(sources.ArtifactStore.path("testpfx", src.getAbsolutePath)
      !== sources.ArtifactStore.path("testpfx", other.getAbsolutePath.replace('-', '_')))
  }

  test("ArtifactStore staging publish: a failed or in-flight build never touches the live artifact") {
    val src = Files.createTempDirectory("graft-artifact-src2").toFile
    java.nio.file.Files.write(new java.io.File(src, "d.parquet").toPath, Array[Byte](1))
    val live = sources.ArtifactStore.path("testpfx2", src.getAbsolutePath)
    def okBuild(marker: Byte)(base: String): Unit = {
      val t = new java.io.File(s"$base/t"); t.mkdirs()
      java.nio.file.Files.write(new java.io.File(t, "_SUCCESS").toPath, Array.empty[Byte])
      java.nio.file.Files.write(new java.io.File(t, "payload").toPath, Array[Byte](marker))
    }
    sources.ArtifactStore.rebuild("testpfx2", src.getAbsolutePath, Seq("t"))(okBuild(1))
    def payload() = java.nio.file.Files
      .readAllBytes(new java.io.File(s"$live/t/payload").toPath).head
    assert(payload() === 1.toByte)
    // a crashing rebuild: the build writes into its PRIVATE staging dir
    // and dies — the live artifact must be byte-for-byte untouched and
    // still valid, and no half-written generation may replace it
    intercept[RuntimeException] {
      sources.ArtifactStore.rebuild("testpfx2", src.getAbsolutePath, Seq("t")) { base =>
        okBuild(9)(base) // a COMPLETE-looking write, then the crash
        assert(!new java.io.File(s"$base/t").getAbsolutePath.startsWith(live),
          "build must run in a staging dir, not the live path")
        // mid-build, a concurrent reader of the live path sees the OLD
        // complete generation, not a mix
        assert(payload() === 1.toByte)
        throw new RuntimeException("builder died")
      }
    }
    assert(payload() === 1.toByte)
    assert(sources.ArtifactStore.ensure("testpfx2", src.getAbsolutePath, Seq("t"))(
      okBuild(5)) === live)
    assert(payload() === 1.toByte) // ensure() admitted the surviving generation
    // successful rebuild swaps generations atomically and leaves no
    // staging/retired leftovers behind
    sources.ArtifactStore.rebuild("testpfx2", src.getAbsolutePath, Seq("t"))(okBuild(2))
    assert(payload() === 2.toByte)
    val leftovers = Option(new java.io.File(live).getParentFile.listFiles()).toSeq.flatten
      .map(_.getName).filter(n => n.contains(".tmp.") || n.contains(".old."))
      .filter(_.startsWith(new java.io.File(live).getName))
    assert(leftovers.isEmpty, s"leftover dirs: $leftovers")
    // a crashed builder's staging dir (dead pid) is swept by the next
    // build; a LIVE process's staging dir is left alone
    val deadStaging = new java.io.File(s"$live.tmp.999999999.deadbeef")
    new java.io.File(deadStaging, "t").mkdirs()
    val liveStaging = new java.io.File(
      s"$live.tmp.${ProcessHandle.current().pid()}.cafe0001")
    new java.io.File(liveStaging, "t").mkdirs()
    sources.ArtifactStore.rebuild("testpfx2", src.getAbsolutePath, Seq("t"))(okBuild(3))
    assert(!deadStaging.exists(), "dead builder's staging not swept")
    assert(liveStaging.exists(), "live builder's staging must not be swept")
    assert(payload() === 3.toByte)
    def rmAll(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(rmAll); f.delete(); ()
    }
    rmAll(liveStaging)
  }

  test("ArtifactStore two-process race: concurrent rebuild storms never mix generations") {
    val src = Files.createTempDirectory("graft-artifact-race-src").toFile
    java.nio.file.Files.write(new java.io.File(src, "d.parquet").toPath, Array[Byte](7))
    val live = sources.ArtifactStore.path("racepfx", src.getAbsolutePath)
    // second JVM: ArtifactStore + the helper depend only on scala-library,
    // so the compiled classes dir + the scala jar are a sufficient classpath
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val scalaLib = classOf[scala.Option[_]]
      .getProtectionDomain.getCodeSource.getLocation.getPath
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val iters = 30
    val proc = new ProcessBuilder(javaBin, "-cp", s"$classesDir:$scalaLib",
        "graft.tools.ArtifactRaceHelper", src.getAbsolutePath, iters.toString)
      .redirectErrorStream(true).start()
    // race the same storm from THIS process
    val me = ProcessHandle.current().pid()
    (1 to iters).foreach(i =>
      graft.tools.ArtifactRaceHelper.buildOnce(src.getAbsolutePath, s"$me-$i"))
    val helperOut = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "helper JVM did not finish")
    assert(proc.exitValue() === 0, s"helper JVM failed:\n$helperOut")
    // whichever publish won: the live artifact is complete, valid, and
    // carries ONE generation's marker in BOTH tables — interleaved
    // direct-to-live writes would mix markers across tables
    assert(sources.ArtifactStore.ensure("racepfx", src.getAbsolutePath,
      Seq("t1", "t2"))(_ => fail("valid artifact should be admitted")) === live)
    def marker(t: String) = new String(java.nio.file.Files
      .readAllBytes(new java.io.File(s"$live/$t/payload").toPath), "UTF-8")
    assert(marker("t1") === marker("t2"),
      s"mixed generations: t1=${marker("t1")} t2=${marker("t2")}")
    // no staging/retired leftovers survive the storm (both pids are
    // done; a fresh build sweeps anything transient)
    graft.tools.ArtifactRaceHelper.buildOnce(src.getAbsolutePath, "final")
    val leftovers = Option(new java.io.File(live).getParentFile.listFiles()).toSeq.flatten
      .map(_.getName)
      .filter(n => n.startsWith(new java.io.File(live).getName + ".tmp.") ||
                   n.startsWith(new java.io.File(live).getName + ".old."))
    assert(leftovers.isEmpty, s"leftover dirs: $leftovers")
  }

  test("typed StatsAggregator matches built-in avg/variance/min/max (A2)") {
    val session = spark
    import session.implicits._
    val values = Tables.orders(spark, sf0001)
      .select($"o_totalprice").as[Double]
    val got = values.select(StatsAggregator.toColumn).head()
    val exp = Tables.orders(spark, sf0001)
      .agg(count(lit(1)), avg($"o_totalprice"), var_samp($"o_totalprice"),
           min($"o_totalprice"), max($"o_totalprice"))
      .head()
    assert(got.n === exp.getLong(0))
    assert(math.abs(got.mean - exp.getDouble(1)) < 1e-6)
    assert(math.abs(got.variance.get - exp.getDouble(2)) / exp.getDouble(2) < 1e-9)
    assert(got.min === exp.getDouble(3))
    assert(got.max === exp.getDouble(4))
    // single-row group: sample variance is undefined → None (VAR_SAMP NULL)
    val one = values.limit(1).select(StatsAggregator.toColumn).head()
    assert(one.n === 1L && one.variance.isEmpty)
  }

  test("keyed repartition co-locates keys; same key never splits (K2)") {
    val session = spark
    import session.implicits._
    val e = Tables.events(spark, sf0001)
    val parts = Partitioning.byKey(e, 8, col("user_id"))
      .withColumn("pid", spark_partition_id())
      .select($"user_id", $"pid").distinct()
      .groupBy($"user_id").agg(countDistinct($"pid").as("n_parts"))
    assert(parts.filter($"n_parts" > 1).count() === 0)
    assert(Partitioning.byKey(e, 8, col("user_id")).rdd.getNumPartitions === 8)
    assert(Partitioning.rebalance(e, 5).rdd.getNumPartitions === 5)
  }

  test("custom routing expression places rows by the expression (K4)") {
    val session = spark
    import session.implicits._
    val e = Tables.events(spark, sf0001)
    val routed = Partitioning.byExpression(e, 4, pmod(col("event_id"), lit(4)))
      .withColumn("pid", spark_partition_id())
    // same routing value ⇒ same partition
    val split = routed.groupBy(pmod(col("event_id"), lit(4)))
      .agg(countDistinct($"pid").as("n")).filter($"n" > 1)
    assert(split.count() === 0)
  }

  test("salted aggregation equals direct aggregation (skew path)") {
    val session = spark
    import session.implicits._
    val e = Tables.events(spark, sf0001)
    val direct = e.groupBy($"event_type").agg(sum($"value").as("total"))
      .as[(String, Double)].collect().toMap
    val salted = Partitioning.saltedSum(e, $"event_type", $"value")
      .as[(String, Double)].collect().toMap
    assert(direct.keySet === salted.keySet)
    direct.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) / math.abs(v) < 1e-9, k)
    }
  }
}
