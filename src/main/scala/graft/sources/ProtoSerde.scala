package graft.sources

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Protobuf record serde implemented directly on the PUBLIC wire format
  * (SURVEY.md §2.1 S10; protobuf.dev/programming-guides/encoding) — the
  * reference names Protobuf alongside Avro as a registry-governed payload
  * format (kafka/README.md:391). No `spark-protobuf` or protobuf-java jar
  * ships in this build, and none is needed: the wire format is four
  * primitives — varint, fixed64, fixed32, and length-delimited — under a
  * `(field_number << 3) | wire_type` tag, implemented here in
  * allocation-conscious Scala. Embedded messages (Spark `StructType`) and
  * repeated fields (`ArrayType`) ride the same four primitives: a message
  * is length-delimited bytes, a repeated field is one tagged occurrence
  * per element on write, with the decoder ALSO accepting proto3's packed
  * encoding for numeric repeats (one length-delimited blob) — so payloads
  * from stock protobuf writers parse correctly. A map field (`MapType`)
  * is protobuf's own map encoding verbatim — `repeated message
  * { key = 1; value = 2; }` — with last-entry-wins on duplicate keys.
  *
  * Schema model: field numbers are assigned by struct position (1-based),
  * independently at every nesting level — the numbering a generated
  * `.proto` would freeze. Evolution follows protobuf's own rules, which
  * the codec realizes mechanically: decoders SKIP unknown field numbers
  * (forward compatibility), DEFAULT absent scalar/struct fields to null
  * and absent repeated fields to empty (proto3 has no presence for
  * repeated), and apply LAST-ONE-WINS when a non-repeated field appears
  * twice — which also makes scalar↔repeated a compatible evolution in
  * both directions, as in stock protobuf. The registry-style gate
  * [[ProtoSerde.requireCompatible]] enforces the one rule evolution
  * cannot survive: a field number reused with a different payload type
  * (recursively, for embedded messages).
  *
  * Presence semantics: non-null values are always written, including
  * zero (explicit presence, as proto3 `optional` / proto2 fields);
  * nulls are omitted and decode back as null. A null ELEMENT inside a
  * repeated field is rejected loudly — the wire format has no way to
  * express it, and dropping it silently would corrupt positional data.
  *
  * Scale shape: serde is per-row work inside `mapPartitions` with a
  * per-partition reusable buffer for the top-level record (embedded
  * messages pay one small sub-buffer per occurrence) — embarrassingly
  * parallel, no shuffle, same as [[AvroSerde]].
  */
object ProtoSerde {

  /** One field of the frozen wire contract. `childrenOverride` carries a
    * derived nested contract (see [[readerContract]]); absent, nested
    * numbering is positional like every other level. */
  final case class ProtoField(
      number: Int, name: String, dataType: DataType,
      childrenOverride: Option[Seq[ProtoField]] = None) {

    /** The type of ONE wire occurrence (a repeated field's element). A
      * map field IS `repeated message { key = 1; value = 2; }` on the
      * wire — protobuf's own map encoding, verbatim from the spec — so
      * its payload is that synthetic entry message. */
    val payloadType: DataType = dataType match {
      case ArrayType(et, _) => et
      case MapType(kt, vt, _) => StructType(Seq(
        StructField("key", kt), StructField("value", vt)))
      case dt => dt
    }

    val repeated: Boolean =
      dataType.isInstanceOf[ArrayType] || dataType.isInstanceOf[MapType]

    val isMap: Boolean = dataType.isInstanceOf[MapType]

    val wireType: Int = payloadType match {
      case LongType | IntegerType | BooleanType => 0 // varint
      // epoch micros / days as varint — the pragmatic int64 mapping
      // (protobuf's well-known Timestamp message costs a nested record
      // per value for no fidelity gain at micros precision)
      case TimestampType | DateType             => 0
      case DoubleType                           => 1 // fixed64
      case FloatType                            => 5 // fixed32
      case StringType | BinaryType              => 2 // length-delimited
      case _: StructType                        => 2 // embedded message
      case other =>
        throw new IllegalArgumentException(s"unsupported proto serde type: $other")
    }

    // lazy val, not def: writeOne/readScalar touch this per embedded-
    // struct OCCURRENCE — a def would rebuild the nested contract per row
    lazy val children: Seq[ProtoField] = childrenOverride.getOrElse(payloadType match {
      case st: StructType => protoSchema(st)
      case _ => Nil
    })
  }

  /** Declared Spark schema → wire contract (field numbers by position,
    * 1-based, independently per nesting level). */
  def protoSchema(st: StructType): Seq[ProtoField] =
    st.fields.zipWithIndex.map { case (f, i) => ProtoField(i + 1, f.name, f.dataType) }.toSeq

  /** The registry compatibility gate: shared field numbers must keep their
    * payload type, recursively through embedded messages — protobuf's one
    * unbreakable evolution rule. Added and removed numbers are always
    * compatible (the codec handles both), and so is scalar↔repeated on
    * the same payload (accumulate vs last-one-wins). */
  def requireCompatible(writer: Seq[ProtoField], reader: Seq[ProtoField]): Unit = {
    val clashes = compatClashes(writer, reader, "")
    require(clashes.isEmpty, s"proto schemas incompatible: ${clashes.mkString("; ")}")
  }

  private def compatClashes(
      writer: Seq[ProtoField], reader: Seq[ProtoField], path: String): Seq[String] = {
    val w = writer.map(f => f.number -> f).toMap
    reader.flatMap { r =>
      w.get(r.number).toSeq.flatMap { wf =>
        (wf.payloadType, r.payloadType) match {
          case (_: StructType, _: StructType) =>
            compatClashes(wf.children, r.children, s"$path${r.name}.")
          case (a, b) if a == b => Nil
          case (a, b) => Seq(s"field $path${r.name} (#${r.number}): writer " +
            s"${a.simpleString} vs reader ${b.simpleString}")
        }
      }
    }
  }

  /** Reader wire contract derived from the writer's: protobuf resolves by
    * FIELD NUMBER (not name, as Avro does), so an evolved reader keeps the
    * writer's number for every field name it shares — recursively through
    * embedded messages — and assigns fresh numbers to genuinely new
    * fields, exactly how a `.proto` file evolves. Deriving instead of
    * renumbering positionally is what makes dropping a MIDDLE field a
    * compatible evolution. */
  def readerContract(writer: Seq[ProtoField], reader: StructType): Seq[ProtoField] = {
    val byName = writer.map(f => f.name -> f).toMap
    var next = (writer.map(_.number) :+ 0).max
    reader.fields.toSeq.map { f =>
      byName.get(f.name) match {
        case Some(wf) =>
          // payload derivation shared with ProtoField so the two cannot
          // drift (the synthetic map-entry shape lives in ONE place)
          val elemType = ProtoField(wf.number, f.name, f.dataType).payloadType
          val kids = (wf.payloadType, elemType) match {
            case (_: StructType, rs: StructType) => Some(readerContract(wf.children, rs))
            case _ => None
          }
          ProtoField(wf.number, f.name, f.dataType, kids)
        case None =>
          next += 1
          ProtoField(next, f.name, f.dataType)
      }
    }
  }

  // ---- wire primitives (public encoding spec) ---------------------------

  /** Growable little write buffer; the top-level one is reused across a
    * partition's rows. */
  private final class WireBuf(var a: Array[Byte] = new Array[Byte](256)) {
    var n = 0
    def reset(): Unit = n = 0
    private def ensure(extra: Int): Unit =
      if (n + extra > a.length) {
        val b = new Array[Byte](math.max(a.length * 2, n + extra))
        System.arraycopy(a, 0, b, 0, n); a = b
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
    def bytes(b: Array[Byte], len: Int): Unit = {
      ensure(len); System.arraycopy(b, 0, a, n, len); n += len
    }
    def bytesRange(b: Array[Byte], from: Int, until: Int): Unit = {
      val len = until - from
      ensure(len); System.arraycopy(b, from, a, n, len); n += len
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  /** proto3 IMPLICIT presence (a field declared without `optional`):
    * true iff a stock proto3 writer would OMIT this singular scalar
    * value. Numeric comparison for floats deliberately — stock
    * implementations test `value != 0`, so -0.0 is omitted (and lost to
    * +0.0 on read), a documented proto3 wire fact the golden tests pin.
    * Messages keep explicit presence even in proto3; repeats are
    * per-element and never reach here. */
  private def isImplicitDefault(f: ProtoField, v: Any): Boolean =
    f.payloadType match {
      case LongType    => v.asInstanceOf[Long] == 0L
      case IntegerType => v.asInstanceOf[Int] == 0
      case BooleanType => !v.asInstanceOf[Boolean]
      case DoubleType  => v.asInstanceOf[Double] == 0.0
      case FloatType   => v.asInstanceOf[Float] == 0.0f
      case StringType  => v.asInstanceOf[String].isEmpty
      case BinaryType  => v.asInstanceOf[Array[Byte]].isEmpty
      case TimestampType => org.apache.spark.sql.catalyst.util.DateTimeUtils
        .instantToMicros(v.asInstanceOf[java.sql.Timestamp].toInstant) == 0L
      case DateType    => v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay == 0L
      case _ => false
    }

  /** The value an implicit-presence reader materializes for an absent
    * singular scalar. */
  private def implicitDefault(dt: DataType): Any = dt match {
    case StringType  => ""
    case LongType    => 0L
    case IntegerType => 0
    case BooleanType => false
    case DoubleType  => 0.0
    case FloatType   => 0.0f
    case BinaryType  => Array.empty[Byte]
    case TimestampType => java.sql.Timestamp.from(java.time.Instant.EPOCH)
    case DateType    => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(0))
    case other => throw new IllegalArgumentException(
      s"no implicit default for ${other.simpleString}")
  }

  /** `omitDefaults` = proto3 implicit presence: zero-valued singular
    * scalars leave the wire (recursively — stock writers apply this at
    * every nesting level). `explicitSlot` exempts oneof members: a set
    * oneof member has EXPLICIT presence in proto3 and is written even
    * when zero-valued, else the choice itself would vanish. */
  private def writeRow(buf: WireBuf, fields: Seq[ProtoField], row: Row,
      omitDefaults: Boolean = false, explicitSlot: Array[Boolean] = null): Unit = {
    var i = 0
    while (i < fields.length) {
      if (!row.isNullAt(i)) {
        val f = fields(i); val v = row.get(i)
        val skip = omitDefaults && !f.repeated &&
          (explicitSlot == null || !explicitSlot(i)) && isImplicitDefault(f, v)
        if (!skip) writeField(buf, f, v, omitDefaults)
      }
      i += 1
    }
  }

  private def writeField(buf: WireBuf, f: ProtoField, v: Any,
      omitDefaults: Boolean = false): Unit =
    if (f.isMap) {
      val it = v.asInstanceOf[scala.collection.Map[Any, Any]].iterator
      while (it.hasNext) {
        val (k, value) = it.next()
        require(k != null, s"null key in map field ${f.name}")
        writeOne(buf, f, Row(k, value), omitDefaults) // one entry message per pair
      }
    } else if (f.repeated) {
      val it = v.asInstanceOf[scala.collection.Seq[Any]].iterator
      while (it.hasNext) {
        val e = it.next()
        require(e != null, s"null element in repeated field ${f.name}: the wire" +
          " format cannot express it and silent drops corrupt positional data")
        writeOne(buf, f, e, omitDefaults)
      }
    } else writeOne(buf, f, v, omitDefaults)

  private def writeOne(buf: WireBuf, f: ProtoField, v: Any,
      omitDefaults: Boolean = false): Unit = {
    buf.varint((f.number.toLong << 3) | f.wireType)
    f.payloadType match {
      case LongType    => buf.varint(v.asInstanceOf[Long])
      case IntegerType => buf.varint(v.asInstanceOf[Int].toLong)
      case BooleanType => buf.varint(if (v.asInstanceOf[Boolean]) 1L else 0L)
      case TimestampType => buf.varint(
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .instantToMicros(v.asInstanceOf[java.sql.Timestamp].toInstant))
      case DateType => buf.varint(
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay)
      case DoubleType  => buf.fixed64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case FloatType   => buf.fixed32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case StringType =>
        val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
        buf.varint(b.length.toLong); buf.bytes(b, b.length)
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        buf.varint(b.length.toLong); buf.bytes(b, b.length)
      case _: StructType =>
        val sub = new WireBuf(new Array[Byte](64))
        // a PRESENT all-defaults message still writes tag + length 0:
        // message presence is explicit even under proto3
        writeRow(sub, f.children, v.asInstanceOf[Row], omitDefaults)
        buf.varint(sub.n.toLong); buf.bytes(sub.a, sub.n)
      case other => throw new IllegalArgumentException(s"unsupported: $other")
    }
  }

  private final class WireReader(a: Array[Byte]) {
    var p = 0
    def hasNext: Boolean = p < a.length
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        // bounds + width checks make corrupt payloads FAIL, not misparse:
        // an unbounded shift wraps mod 64 (Long <<) and yields a silently
        // wrong value after 10 continuation bytes — match stock protobuf's
        // "malformed varint" error instead
        if (p >= a.length) throw new IllegalArgumentException(
          "truncated varint: payload ends mid-value")
        if (shift >= 64) throw new IllegalArgumentException(
          "malformed varint: more than 10 bytes")
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
    /** Decoded length, validated: a corrupt varint truncating to a
      * negative Int would move `p` BACKWARDS (an executor-task infinite
      * loop in decodeRecord), and an over-long one would read past the
      * buffer — both must throw instead. The raw varint is checked BEFORE
      * the Int narrowing (2^32+5 must not misparse as 5) and the bounds
      * sum is computed in Long (p + len near Int.MaxValue must not wrap
      * negative and slip past the guard). */
    private def checkedLen(): Int = {
      val raw = varint()
      if (raw < 0L || raw > Int.MaxValue) throw new IllegalArgumentException(
        s"corrupt length-delimited field: len=$raw at offset $p of ${a.length}")
      val len = raw.toInt
      if (p.toLong + len > a.length) throw new IllegalArgumentException(
        s"corrupt length-delimited field: len=$len at offset $p of ${a.length}")
      len
    }
    def lengthDelimited(): Array[Byte] = {
      val len = checkedLen()
      val out = java.util.Arrays.copyOfRange(a, p, p + len); p += len; out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => p += 8
      case 5 => p += 4
      case 2 =>
        // two statements, deliberately: `p += checkedLen()` would read the
        // OLD p in the validation before the varint advances it
        val len = checkedLen()
        p += len
      case other => // groups (3/4) are pre-proto3 legacy; a payload using
        // them is not from this codec family — fail loudly, don't misparse
        throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def readScalar(r: WireReader, f: ProtoField): Any = f.payloadType match {
    case LongType    => r.varint()
    case IntegerType => r.varint().toInt
    case BooleanType => r.varint() != 0L
    case TimestampType => java.sql.Timestamp.from(
      org.apache.spark.sql.catalyst.util.DateTimeUtils.microsToInstant(r.varint()))
    case DateType => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(r.varint()))
    case DoubleType  => java.lang.Double.longBitsToDouble(r.fixed64())
    case FloatType   => java.lang.Float.intBitsToFloat(r.fixed32())
    case StringType  => new String(r.lengthDelimited(),
      java.nio.charset.StandardCharsets.UTF_8)
    case BinaryType  => r.lengthDelimited()
    case other => // embedded messages never reach here: decodeRecord's
      // main loop decodes them with its pre-built child codec, and the
      // wire grammar forbids packing them
      throw new IllegalArgumentException(s"unsupported payload: $other")
  }

  /** Per-contract decode plan, built ONCE (per decode() call / nested
    * level) so the row loop does zero lookup-structure allocation — the
    * hot-path discipline the class doc promises. `lookup(number)` yields
    * (field, slot) or null. `oneofPeers(slot)` = the other member slots
    * of the slot's oneof group (setting one member clears the rest). */
  private final case class RecordCodec(fields: IndexedSeq[ProtoField],
      oneofPeers: Map[Int, Array[Int]] = Map.empty) {
    val lookup: Map[Int, (ProtoField, Int)] =
      fields.zipWithIndex.map { case (f, i) => f.number -> (f, i) }.toMap
    val childCodecs: IndexedSeq[RecordCodec] = fields.map { f =>
      if (f.payloadType.isInstanceOf[StructType]) RecordCodec(f.children) else null
    }
  }
  private object RecordCodec {
    def apply(fields: Seq[ProtoField]): RecordCodec =
      new RecordCodec(fields.toIndexedSeq)
  }

  /** oneof groups (by field NAME) → per-slot peer arrays. Members must be
    * non-repeated: proto forbids repeated fields inside a oneof. */
  private def oneofPeerMap(
      fields: Seq[ProtoField], oneofs: Seq[Seq[String]]): Map[Int, Array[Int]] = {
    val slotByName = fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap
    oneofs.flatMap { group =>
      val slots = group.map(n => slotByName.getOrElse(n,
        throw new IllegalArgumentException(s"oneof member $n not in schema")))
      slots.foreach { s =>
        require(!fields(s).repeated,
          s"oneof member ${fields(s).name} cannot be repeated (proto forbids it)")
      }
      slots.map(s => s -> slots.filter(_ != s).toArray)
    }.toMap
  }

  /** proto3 default for an absent value inside an entry/message where
    * presence is implicit (map KEYS: stock writers omit default keys, and
    * a null map key is unrepresentable downstream). */
  private def protoDefault(dt: DataType): Any = dt match {
    case StringType  => ""
    case LongType    => 0L
    case IntegerType => 0
    case BooleanType => false
    case other => throw new IllegalArgumentException(
      s"type ${other.simpleString} cannot key a proto map")
  }

  /** Protobuf's message-merge rule: concatenated encodings of a message
    * merge field-by-field — scalars last-wins, repeats concatenate,
    * embedded messages merge recursively. Applied when a non-repeated
    * struct field occurs more than once in one record. */
  private def mergeRows(fields: Seq[ProtoField], prev: Row, next: Row): Row =
    Row.fromSeq(fields.zipWithIndex.map { case (f, i) =>
      (prev.get(i), next.get(i)) match {
        case (p, null) => p
        case (null, n) => n
        case (p: Row, n: Row) if f.payloadType.isInstanceOf[StructType] &&
          !f.repeated => mergeRows(f.children, p, n)
        case (p: scala.collection.Seq[_], n: scala.collection.Seq[_])
          if f.repeated && !f.isMap => p ++ n
        case (p: scala.collection.Map[_, _], n: scala.collection.Map[_, _]) =>
          p ++ n
        case (_, n) => n // scalars: last one wins
      }
    }.toIndexedSeq)

  /** oneof: setting one member CLEARS the others — last occurrence
    * across the whole group wins, the spec's oneof parse rule. Shared by
    * the normal wire-type path and the packed scalar-evolved path. */
  private def clearOneofPeers(codec: RecordCodec, slot: Int,
      out: Array[Any]): Unit =
    codec.oneofPeers.get(slot) match {
      case Some(peers) =>
        var k = 0
        while (k < peers.length) { out(peers(k)) = null; k += 1 }
      case None =>
    }

  /** One record's fields from `bytes` under `codec`: unknown numbers
    * skipped, absent scalars null, absent repeats empty, last-one-wins
    * for duplicate scalar occurrences, field-wise MERGE for duplicate
    * embedded-message occurrences (the spec's concatenation rule), packed
    * numeric repeats accepted alongside the unpacked form this codec
    * writes — under a repeated OR a scalar-evolved reader field. */
  private def decodeRecord(bytes: Array[Byte], codec: RecordCodec,
      unknown: WireBuf = null): Array[Any] = {
    val fields = codec.fields
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      if (fields(i).repeated) out(i) = new ArrayBuffer[Any]
      i += 1
    }
    val r = new WireReader(bytes)
    while (r.hasNext) {
      val tagStart = r.p
      val tag = r.varint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      codec.lookup.get(number) match {
        case Some((f, slot)) if f.wireType == wt =>
          val v = f.payloadType match {
            case _: StructType =>
              Row.fromSeq(decodeRecord(r.lengthDelimited(),
                codec.childCodecs(slot)).toIndexedSeq)
            case _ => readScalar(r, f)
          }
          if (f.repeated) out(slot).asInstanceOf[ArrayBuffer[Any]] += v
          else {
            out(slot) = (out(slot), v) match {
              case (prev: Row, next: Row)
                if f.payloadType.isInstanceOf[StructType] =>
                mergeRows(f.children, prev, next)
              case _ => v
            }
            clearOneofPeers(codec, slot, out)
          }
        case Some((f, slot)) if wt == 2 && f.wireType != 2 =>
          // proto3 writers PACK numeric repeats: one length-delimited blob
          // of back-to-back payloads. Accepted under a repeated reader
          // field (accumulate) AND a scalar-evolved one (last value wins,
          // completing scalar<->repeated in both directions)
          val packed = new WireReader(r.lengthDelimited())
          if (f.repeated) {
            val buf = out(slot).asInstanceOf[ArrayBuffer[Any]]
            while (packed.hasNext) buf += readScalar(packed, f)
          } else {
            // a oneof member arriving packed must still clear its peers,
            // or a sibling set earlier survives and encode() rejects the
            // row as a oneof violation (empty blob sets nothing → no clear)
            val hadPayload = packed.hasNext
            while (packed.hasNext) out(slot) = readScalar(packed, f)
            if (hadPayload) clearOneofPeers(codec, slot, out)
          }
        case _ => // unknown number (or a true type conflict, which the
          // gate rejected before any byte was read): skip — and when a
          // retention sink is attached, copy tag + payload verbatim so a
          // re-encode can round-trip fields this reader doesn't model
          r.skip(wt)
          if (unknown != null)
            unknown.bytesRange(bytes, tagStart, r.p)
      }
    }
    i = 0
    while (i < fields.length) {
      if (fields(i).isMap) {
        // duplicate keys: last entry wins; an ABSENT key in an entry is a
        // default-valued key a stock writer omitted (implicit presence
        // inside map entries) — materialize the default, never a null key
        val keyType = fields(i).payloadType.asInstanceOf[StructType].fields(0).dataType
        out(i) = out(i).asInstanceOf[ArrayBuffer[Any]]
          .map { case e: Row =>
            (if (e.isNullAt(0)) protoDefault(keyType) else e.get(0)) -> e.get(1)
          }.toMap
      } else if (fields(i).repeated)
        out(i) = out(i).asInstanceOf[ArrayBuffer[Any]].toSeq
      i += 1
    }
    out
  }

  /** proto3 implicit-presence materialization, applied AFTER decoding
    * (deliberately not during: the message-merge rule needs null to mean
    * "unset in this occurrence", or a later occurrence's unset fields
    * would stomp earlier set ones with zeros). Absent singular scalars
    * become their zero value at every nesting level — embedded messages,
    * repeated elements, scalar map values. Absent MESSAGES stay null
    * (explicit presence even in proto3), and unset oneof members stay
    * null — zero-filling a cleared member would erase which member of
    * the group was set. */
  private def fillDefaults(codec: RecordCodec, out: Array[Any]): Array[Any] = {
    val fields = codec.fields
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      f.payloadType match {
        case _: StructType if f.isMap =>
          val valueField = f.children(1)
          val entryCodec = codec.childCodecs(i)
          out(i) = out(i).asInstanceOf[scala.collection.Map[Any, Any]].map {
            case (k, null) if !valueField.payloadType.isInstanceOf[StructType] =>
              k -> implicitDefault(valueField.payloadType)
            case (k, v: Row) if valueField.payloadType.isInstanceOf[StructType] =>
              k -> fillRow(entryCodec.childCodecs(1), v)
            case kv => kv
          }
        case _: StructType if f.repeated =>
          out(i) = out(i).asInstanceOf[scala.collection.Seq[Any]]
            .map(e => fillRow(codec.childCodecs(i), e.asInstanceOf[Row]))
        case _: StructType =>
          if (out(i) != null)
            out(i) = fillRow(codec.childCodecs(i), out(i).asInstanceOf[Row])
        case _ =>
          if (!f.repeated && out(i) == null && !codec.oneofPeers.contains(i))
            out(i) = implicitDefault(f.payloadType)
      }
      i += 1
    }
    out
  }

  private def fillRow(codec: RecordCodec, row: Row): Row =
    Row.fromSeq(fillDefaults(codec, row.toSeq.toArray).toIndexedSeq)

  // ---- DataFrame surface (AvroSerde's shape) ----------------------------

  /** Serialize every row of `df` to protobuf binary (one `binary` column
    * named `value` — the producer serializer analog). `oneofs` declares
    * groups of field names with oneof semantics: a row with MORE than one
    * member set is rejected loudly (generated proto classes make that
    * state unrepresentable; a serializer that silently picked one would
    * hide data loss).
    *
    * `implicitPresence = true` selects proto3 IMPLICIT presence (fields
    * declared without `optional`): zero-valued singular scalars are
    * OMITTED from the wire like stock proto3 writers omit them, at every
    * nesting level; pair with the matching [[decode]] flag, which
    * materializes the zeros back. Message fields and oneof members keep
    * explicit presence, exactly as the spec does. The default (false) is
    * the codec's long-standing explicit-presence contract: non-null
    * values are always written, zeros included, null ⇄ absent. */
  def encode(df: DataFrame, oneofs: Seq[Seq[String]] = Nil,
      implicitPresence: Boolean = false): DataFrame = {
    val fields = protoSchema(df.schema)
    val groups = oneofs.map(_.map(n => df.schema.fieldIndex(n)).toArray)
    val explicitSlot =
      if (!implicitPresence || oneofs.isEmpty) null
      else {
        val a = new Array[Boolean](df.schema.length)
        groups.foreach(_.foreach(a(_) = true)); a
      }
    df.mapPartitions { it =>
      val buf = new WireBuf()
      it.map { row =>
        groups.foreach { g =>
          val set = g.count(i => !row.isNullAt(i))
          require(set <= 1, s"oneof violation: $set members of group " +
            s"${g.map(fields(_).name).mkString("{", ",", "}")} are set")
        }
        buf.reset()
        writeRow(buf, fields, row, implicitPresence, explicitSlot)
        buf.result()
      }
    }(Encoders.BINARY).toDF("value")
  }

  /** Deserialize a `value: binary` column written under `writer` into rows
    * of the declared `reader` Spark schema: unknown field numbers are
    * skipped (forward compat), absent fields decode as null / empty
    * (backward compat). The compatibility gate runs first. `oneofs`
    * groups (by reader field name) apply the spec's oneof parse rule:
    * the LAST group member on the wire wins and clears the others.
    * `implicitPresence` mirrors [[encode]]'s flag: absent singular
    * scalars materialize their proto3 zero value (at every nesting
    * level) instead of null; absent messages stay null and unset oneof
    * members stay null, as the spec's presence rules say. */
  def decode(bytes: DataFrame, writer: Seq[ProtoField], reader: StructType,
      oneofs: Seq[Seq[String]] = Nil,
      implicitPresence: Boolean = false): DataFrame = {
    val readerFields = readerContract(writer, reader)
    requireCompatible(writer, readerFields)
    // one codec tree per decode call: the row loop allocates no lookup
    // structures (RecordCodec pre-resolves number -> (field, slot, child))
    val codec = RecordCodec(readerFields.toIndexedSeq,
      oneofPeerMap(readerFields, oneofs))
    bytes.select("value").mapPartitions { it =>
      it.map { row =>
        val out = decodeRecord(row.getAs[Array[Byte]](0), codec)
        Row.fromSeq(
          (if (implicitPresence) fillDefaults(codec, out) else out).toIndexedSeq)
      }
    }(Encoders.row(reader))
  }

  // ---- unknown-field retention (registry forward-compat round trip) -----

  /** Column that carries a record's unretained-by-schema wire bytes. */
  val UnknownCol = "_unknown_proto"

  /** [[decode]], but fields this reader does NOT model are retained as
    * raw wire bytes (tag + payload, concatenated in wire order) in a
    * trailing [[UnknownCol]] binary column instead of being dropped —
    * the registry model's forward-compat story: an old reader can
    * transform records written by a newer schema and [[encodeRetaining]]
    * them WITHOUT destroying the newer fields. Retention scope is the
    * top-level record: a nested unknown inside a KNOWN embedded message
    * is still dropped on re-encode (retaining it would need recursive
    * schema augmentation), while an unknown embedded message rides the
    * unknown bytes whole. Null when the record had no unknown fields. */
  def decodeRetaining(bytes: DataFrame, writer: Seq[ProtoField],
      reader: StructType): DataFrame = {
    val readerFields = readerContract(writer, reader)
    requireCompatible(writer, readerFields)
    val codec = RecordCodec(readerFields)
    val outSchema = StructType(
      reader.fields :+ StructField(UnknownCol, BinaryType, nullable = true))
    bytes.select("value").mapPartitions { it =>
      val sink = new WireBuf(new Array[Byte](64))
      it.map { row =>
        sink.reset()
        val known = decodeRecord(row.getAs[Array[Byte]](0), codec, sink)
        Row.fromSeq(known.toIndexedSeq :+
          (if (sink.n == 0) null else sink.result()))
      }
    }(Encoders.row(outSchema))
  }

  /** Re-encode rows produced by [[decodeRetaining]] under the SAME
    * derived contract (pass `readerContract(writer, reader)` — positional
    * renumbering would corrupt the round trip), appending each record's
    * retained unknown bytes verbatim after the known fields. Stock
    * protobuf also re-emits unknown fields after known ones; field order
    * is irrelevant on the wire, so a subsequent decode under the FULL
    * writer schema recovers every field. */
  def encodeRetaining(df: DataFrame, contract: Seq[ProtoField]): DataFrame = {
    val ui = df.schema.fieldIndex(UnknownCol)
    require(ui == df.schema.length - 1, s"$UnknownCol must be the last column")
    require(contract.length == ui,
      s"contract has ${contract.length} fields but frame has $ui known columns")
    df.mapPartitions { it =>
      val buf = new WireBuf()
      it.map { row =>
        buf.reset()
        writeRow(buf, contract, row) // ignores the trailing unknown column
        if (!row.isNullAt(ui)) {
          val u = row.getAs[Array[Byte]](ui)
          buf.bytes(u, u.length)
        }
        buf.result()
      }
    }(Encoders.BINARY).toDF("value")
  }

  /** Per-row decoder for connector use ([[GraftProtoDataSource]]): the
    * same compat gate + codec tree as [[decode]], minus the DataFrame
    * plumbing — the file reader calls it once per framed record. The
    * codec tree is immutable and shareable; each call returns a fresh
    * value array. */
  def rowDecoder(writer: Seq[ProtoField], reader: StructType): Array[Byte] => Seq[Any] = {
    val readerFields = readerContract(writer, reader)
    requireCompatible(writer, readerFields)
    val codec = RecordCodec(readerFields.toIndexedSeq)
    bytes => decodeRecord(bytes, codec).toIndexedSeq
  }

  /** Per-row encoder for connector use: one [[WireBuf]] per returned
    * closure (NOT shareable across threads — one per DataWriter). */
  def rowEncoder(schema: StructType): Row => Array[Byte] = {
    val fields = protoSchema(schema)
    val buf = new WireBuf()
    row => { buf.reset(); writeRow(buf, fields, row); buf.result() }
  }
}
