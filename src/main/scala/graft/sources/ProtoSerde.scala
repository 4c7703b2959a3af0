package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Protobuf record serde implemented directly on the PUBLIC wire format
  * (SURVEY.md §2.1 S10; protobuf.dev/programming-guides/encoding) — the
  * reference names Protobuf alongside Avro as a registry-governed payload
  * format (kafka/README.md:391). No `spark-protobuf` or protobuf-java jar
  * ships in this build, and none is needed: the wire format is four
  * primitives — varint, fixed64, fixed32, and length-delimited — under a
  * `(field_number << 3) | wire_type` tag, all implemented here in ~100
  * lines of allocation-conscious Scala.
  *
  * Schema model: field numbers are assigned by struct position (1-based),
  * the same implicit numbering a `.proto` writer would freeze. Evolution
  * follows protobuf's own rules, which the codec realizes mechanically:
  * a decoder SKIPS unknown field numbers (forward compatibility — old
  * reader, new writer) and DEFAULTS fields absent on the wire to null
  * (backward compatibility — new reader, old writer). The registry-style
  * gate [[ProtoSerde.requireCompatible]] enforces the one rule evolution
  * cannot survive: a field number reused with a different type.
  *
  * Presence semantics: non-null values are always written, including
  * zero (explicit presence, as proto3 `optional` / proto2 fields);
  * nulls are omitted and decode back as null — so Spark's three-valued
  * column semantics round-trip exactly.
  *
  * Scale shape: serde is per-row work inside `mapPartitions` with a
  * per-partition reusable buffer (no per-row codec state) —
  * embarrassingly parallel, no shuffle, same as [[AvroSerde]].
  */
object ProtoSerde {

  /** One field of the frozen wire contract. */
  final case class ProtoField(number: Int, name: String, dataType: DataType) {
    val wireType: Int = dataType match {
      case LongType | IntegerType | BooleanType => 0 // varint
      case DoubleType                           => 1 // fixed64
      case FloatType                            => 5 // fixed32
      case StringType | BinaryType              => 2 // length-delimited
      case other =>
        throw new IllegalArgumentException(s"unsupported proto serde type: $other")
    }
  }

  /** Declared Spark schema → wire contract (field numbers by position,
    * 1-based — the numbering a generated `.proto` would pin). */
  def protoSchema(st: StructType): Seq[ProtoField] =
    st.fields.zipWithIndex.map { case (f, i) => ProtoField(i + 1, f.name, f.dataType) }.toSeq

  /** The registry compatibility gate: shared field numbers must keep their
    * type — protobuf's one unbreakable evolution rule (added and removed
    * numbers are always compatible; the codec handles both). */
  def requireCompatible(writer: Seq[ProtoField], reader: Seq[ProtoField]): Unit = {
    val w = writer.map(f => f.number -> f).toMap
    val clashes = reader.flatMap { r =>
      w.get(r.number).filter(_.dataType != r.dataType)
        .map(wf => s"field ${r.number}: writer ${wf.dataType.simpleString} vs " +
          s"reader ${r.dataType.simpleString}")
    }
    require(clashes.isEmpty, s"proto schemas incompatible: ${clashes.mkString("; ")}")
  }

  // ---- wire primitives (public encoding spec) ---------------------------

  /** Growable little write buffer, reused across a partition's rows. */
  private final class WireBuf(var a: Array[Byte] = new Array[Byte](256)) {
    var n = 0
    def reset(): Unit = n = 0
    private def ensure(extra: Int): Unit =
      if (n + extra > a.length) {
        val b = new Array[Byte](math.max(a.length * 2, n + extra)); System.arraycopy(a, 0, b, 0, n); a = b
      }
    def varint(v0: Long): Unit = { // unsigned LEB128; negatives take 10 bytes
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0) { a(n) = ((v & 0x7f) | 0x80).toByte; n += 1; v >>>= 7 }
      a(n) = v.toByte; n += 1
    }
    def fixed64(bits: Long): Unit = {
      ensure(8); var i = 0
      while (i < 8) { a(n) = ((bits >>> (8 * i)) & 0xff).toByte; n += 1; i += 1 }
    }
    def fixed32(bits: Int): Unit = {
      ensure(4); var i = 0
      while (i < 4) { a(n) = ((bits >>> (8 * i)) & 0xff).toByte; n += 1; i += 1 }
    }
    def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, a, n, b.length); n += b.length }
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  private def writeField(buf: WireBuf, f: ProtoField, v: Any): Unit = {
    buf.varint((f.number.toLong << 3) | f.wireType)
    f.dataType match {
      case LongType    => buf.varint(v.asInstanceOf[Long])
      case IntegerType => buf.varint(v.asInstanceOf[Int].toLong)
      case BooleanType => buf.varint(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case DoubleType  => buf.fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case FloatType   => buf.fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case StringType =>
        val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        buf.varint(b.length.toLong); buf.bytes(b)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        buf.varint(b.length.toLong); buf.bytes(b)
      case other => throw new IllegalArgumentException(s"unsupported: $other")
    }
  }

  private final class WireReader(a: Array[Byte]) {
    var p = 0
    def hasNext: Boolean = p < a.length
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        val b = a(p); p += 1
        v |= (b & 0x7fL) << shift; shift += 7
        (b & 0x80) != 0
      }) ()
      v
    }
    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (a(p).toLong & 0xff) << (8 * i); p += 1; i += 1 }
      v
    }
    def fixed32(): Int = {
      var v = 0; var i = 0
      while (i < 4) { v |= (a(p) & 0xff) << (8 * i); p += 1; i += 1 }
      v
    }
    def lengthDelimited(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(a, p, p + len); p += len; out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => p += 8
      case 5 => p += 4
      case 2 =>
        // two statements, deliberately: `p += varint().toInt` reads the OLD
        // p before varint() advances it, silently dropping the length
        // byte's own advance from the sum
        val len = varint().toInt
        p += len
      case other => // groups (3/4) are pre-proto3 legacy; a payload using
        // them is not from this codec family — fail loudly, don't misparse
        throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  // ---- DataFrame surface (AvroSerde's shape) ----------------------------

  /** Serialize every row of `df` to protobuf binary (one `binary` column
    * named `value` — the producer serializer analog). */
  def encode(df: DataFrame): DataFrame = {
    val fields = protoSchema(df.schema)
    val n = fields.length
    df.mapPartitions { it =>
      val buf = new WireBuf()
      it.map { row =>
        buf.reset()
        var i = 0
        while (i < n) {
          if (!row.isNullAt(i)) writeField(buf, fields(i), row.get(i))
          i += 1
        }
        buf.result()
      }
    }(Encoders.BINARY).toDF("value")
  }

  /** Reader wire contract derived from the writer's: protobuf resolves by
    * FIELD NUMBER (not name, as Avro does), so an evolved reader keeps the
    * writer's number for every field name it shares and assigns fresh
    * numbers to genuinely new fields — exactly how a `.proto` file
    * evolves. Deriving instead of renumbering positionally is what makes
    * dropping a MIDDLE field a compatible evolution. */
  def readerContract(writer: Seq[ProtoField], reader: StructType): Seq[ProtoField] = {
    val byName = writer.map(f => f.name -> f.number).toMap
    var next = (writer.map(_.number) :+ 0).max
    reader.fields.toSeq.map { f =>
      val num = byName.getOrElse(f.name, { next += 1; next })
      ProtoField(num, f.name, f.dataType)
    }
  }

  /** Deserialize a `value: binary` column written under `writer` into rows
    * of the declared `reader` Spark schema: unknown field numbers are
    * skipped (forward compat), absent fields decode as null (backward
    * compat). The compatibility gate runs first. */
  def decode(bytes: DataFrame, writer: Seq[ProtoField], reader: StructType): DataFrame = {
    val readerFields = readerContract(writer, reader)
    requireCompatible(writer, readerFields)
    val byNumber = readerFields.map(f => f.number -> f).toMap
    val slot = readerFields.map(_.number).zipWithIndex.toMap
    val nOut = readerFields.length
    bytes.select("value").mapPartitions { it =>
      it.map { row =>
        val r = new WireReader(row.getAs[Array[Byte]](0))
        val out = new Array[Any](nOut)
        while (r.hasNext) {
          val tag = r.varint()
          val number = (tag >>> 3).toInt
          val wt = (tag & 7).toInt
          byNumber.get(number) match {
            case Some(f) if f.wireType == wt =>
              out(slot(number)) = f.dataType match {
                case LongType    => r.varint()
                case IntegerType => r.varint().toInt
                case BooleanType => r.varint() != 0L
                case DoubleType  => java.lang.Double.longBitsToDouble(r.fixed64())
                case FloatType   => java.lang.Float.intBitsToFloat(r.fixed32())
                case StringType  => new String(r.lengthDelimited(),
                  java.nio.charset.StandardCharsets.UTF_8)
                case BinaryType  => r.lengthDelimited()
                case other => throw new IllegalArgumentException(s"unsupported: $other")
              }
            case _ => r.skip(wt) // unknown number, or number whose declared
            // type changed wire class — the gate rejects true conflicts up
            // front, so this skip only ever drops unknown fields
          }
        }
        Row.fromSeq(out.toSeq)
      }
    }(Encoders.row(reader))
  }
}
