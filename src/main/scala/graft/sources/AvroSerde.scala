package graft.sources

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{JsonProperties, Schema, SchemaCompatibility}
import org.apache.avro.SchemaCompatibility.SchemaCompatibilityType
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Avro record serde with a Schema-Registry-style compatibility gate
  * (SURVEY.md §2.1 S10) — the reference names Avro as the structured
  * payload format and pairs it with registry compatibility checking
  * (kafka/README.md:391, :394-399).
  *
  * Built directly on the core Avro library (the only Avro jar shipped with
  * this Spark build): rows encode through `GenericDatumWriter` and decode
  * through `GenericDatumReader` with WRITER + READER schema resolution, so
  * Avro's native evolution rules apply — a reader may add nullable
  * defaulted fields (backward) or drop writer fields (forward), and the
  * gate is Avro's own `SchemaCompatibility` check, evaluated BEFORE any
  * byte is consumed.
  *
  * Scale shape: serde is per-row work inside `mapPartitions` with
  * per-partition writer/encoder reuse (no per-row allocation of codec
  * state, no driver involvement) — embarrassingly parallel, no shuffle.
  */
object AvroSerde {

  private def avroType(dt: DataType): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro serde type: $other")
  }

  /** Declared Spark schema → Avro record schema. Nullable fields become
    * `union(null, T)` with default null, which is what makes adding a
    * field a backward-compatible evolution under Avro's rules. */
  def avroSchema(st: StructType, name: String = "GraftRecord"): Schema = {
    val fields = st.fields.map { f =>
      if (f.nullable) {
        val union = Schema.createUnion(
          List(Schema.create(Schema.Type.NULL), avroType(f.dataType)).asJava)
        new Schema.Field(f.name, union, null, JsonProperties.NULL_VALUE)
      } else new Schema.Field(f.name, avroType(f.dataType), null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  /** The registry compatibility gate: can data written with `writer` be
    * read by a consumer declaring `reader`? Throws with the named
    * incompatibilities if not (checked before any record is decoded). */
  def requireCompatible(writer: Schema, reader: Schema): Unit = {
    val res = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer)
    require(res.getType == SchemaCompatibilityType.COMPATIBLE,
      s"avro schemas incompatible: ${res.getResult.getIncompatibilities.asScala
        .map(i => s"${i.getType} at ${i.getLocation}").mkString("; ")}")
  }

  /** Serialize every row of `df` to Avro binary (one `binary` column named
    * `value` — the producer serializer analog). */
  def encode(df: DataFrame): DataFrame = {
    val st = df.schema
    val schemaJson = avroSchema(st).toString
    val n = st.fields.length
    df.mapPartitions { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val out = new ByteArrayOutputStream()
      var encoder: BinaryEncoder = null
      it.map { row =>
        out.reset()
        encoder = EncoderFactory.get().binaryEncoder(out, encoder)
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < n) {
          rec.put(i, row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case v => v
          })
          i += 1
        }
        writer.write(rec, encoder)
        encoder.flush()
        out.toByteArray
      }
    }(Encoders.BINARY).toDF("value")
  }

  /** Deserialize a `value: binary` column written with `writerSchemaJson`
    * into rows of the declared `reader` Spark schema, applying Avro schema
    * resolution (dropped fields skipped, added nullable fields defaulted).
    * The compatibility gate runs first. */
  def decode(bytes: DataFrame, writerSchemaJson: String, reader: StructType): DataFrame = {
    val readerJson = avroSchema(reader).toString
    requireCompatible(
      new Schema.Parser().parse(writerSchemaJson),
      new Schema.Parser().parse(readerJson))
    val names = reader.fieldNames
    bytes.select("value").mapPartitions { it =>
      val writerS = new Schema.Parser().parse(writerSchemaJson)
      val readerS = new Schema.Parser().parse(readerJson)
      val datumReader = new GenericDatumReader[GenericRecord](writerS, readerS)
      var decoder: BinaryDecoder = null
      it.map { row =>
        decoder = DecoderFactory.get().binaryDecoder(row.getAs[Array[Byte]](0), decoder)
        val rec = datumReader.read(null, decoder)
        Row.fromSeq(names.toSeq.map { name =>
          rec.get(name) match {
            case u: org.apache.avro.util.Utf8 => u.toString
            case bb: java.nio.ByteBuffer =>
              val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
            case v => v
          }
        })
      }
    }(Encoders.row(reader))
  }
}
