package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Row

/** DataSource V2 connector over graft's native protobuf wire format
  * (SURVEY.md §2.1 S7/S10 — the connector rung of the extension ladder,
  * alongside the function/strategy/optimizer-rule rungs):
  *
  * {{{
  *   df.write.format("graft-proto").save(dir)      // varint-framed .gpb shards
  *   spark.read.format("graft-proto").load(dir)    // self-describing read
  *   spark.read.format("graft-proto").schema(s)…   // evolved-reader read
  * }}}
  *
  * On-disk layout: one `part-*.gpb` file per write task — each record a
  * varint length prefix + one [[ProtoSerde]] message — plus a
  * `_graft_proto_schema.json` sidecar carrying the writer's Spark schema
  * (the wire contract is positional from it, like a frozen `.proto`).
  * Readers without an explicit schema read the sidecar; readers WITH one
  * go through [[ProtoSerde.readerContract]], so schema evolution (add /
  * drop / reorder fields) follows protobuf's field-number rules and the
  * registry compat gate rejects the one illegal evolution (number reused
  * at a different payload type).
  *
  * Scale posture: one InputPartition per shard file (embarrassingly
  * parallel, no coordination); COLUMN PRUNING IS PUSHED THROUGH THE
  * DECODER — `SupportsPushDownRequiredColumns` hands the pruned schema to
  * the reader contract, so unwanted field numbers are byte-SKIPPED by the
  * wire reader, never materialized (the proto analog of parquet column
  * pruning; PlanSpec asserts the scan's readSchema). Writes are
  * task-isolated temp files renamed on driver commit — failed tasks leave
  * nothing visible, replayed tasks overwrite nothing.
  *
  * Local-filesystem paths (java.nio) — the fixture/bench environment; a
  * production build would swap the four file ops for the Hadoop
  * FileSystem API without touching the format logic.
  */
class GraftProtoDataSource extends TableProvider with DataSourceRegister {
  import GraftProtoDataSource._

  override def shortName(): String = "graft-proto"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    readSidecar(pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftProtoTable(schema, properties.get("path"))
}

object GraftProtoDataSource {
  val SchemaFile = "_graft_proto_schema.json"

  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-proto: a path is required")
    p
  }

  def readSidecar(dir: String): StructType = {
    val f = Paths.get(dir, SchemaFile)
    require(Files.exists(f), s"graft-proto: no $SchemaFile under $dir " +
      "(write with format(\"graft-proto\") first, or pass .schema(...))")
    DataType.fromJson(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      .asInstanceOf[StructType]
  }

  def dataFiles(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Nil
    Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".gpb"))
      .map(_.toString).toSeq.sorted
  }

  // varint framing (same unsigned LEB128 as the wire format's tags)
  def writeFrame(out: java.io.OutputStream, bytes: Array[Byte]): Unit = {
    var v = bytes.length.toLong
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
    out.write(bytes)
  }

  /** Reads one frame; null at clean EOF; throws on a truncated record. */
  def readFrame(in: java.io.InputStream): Array[Byte] = {
    var shift = 0; var len = 0L
    var b = in.read()
    if (b < 0) return null
    while (true) {
      len |= (b.toLong & 0x7f) << shift
      if ((b & 0x80) == 0) {
        require(len >= 0 && len <= Int.MaxValue, s"graft-proto: bad frame length $len")
        val a = new Array[Byte](len.toInt)
        var off = 0
        while (off < a.length) {
          val n = in.read(a, off, a.length - off)
          if (n < 0) throw new EOFException(
            s"graft-proto: truncated record ($off of ${a.length} bytes)")
          off += n
        }
        return a
      }
      shift += 7
      require(shift < 35, "graft-proto: runaway frame-length varint")
      b = in.read()
      if (b < 0) throw new EOFException("graft-proto: truncated frame length")
    }
    null // unreachable
  }
}

class GraftProtoTable(writerSchema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-proto $path"
  override def schema(): StructType = writerSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // the sidecar (when present) is the WRITER contract; the table schema
    // is what the user asked to read (possibly evolved)
    val sidecar = Paths.get(path, GraftProtoDataSource.SchemaFile)
    val writer =
      if (Files.exists(sidecar)) GraftProtoDataSource.readSidecar(path) else writerSchema
    new GraftProtoScanBuilder(writer, writerSchema, path)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftProtoWriteBuilder(info.schema(), path)
}

class GraftProtoScanBuilder(writer: StructType, reader: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = reader
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty

  // the pruned schema flows into readerContract, so pruned-away field
  // numbers are skipped at the BYTE level by the wire reader
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accepts the evaluable subset (comparisons / null tests / In /
    * string predicates / and-or-not over top-level primitive columns)
    * for evaluation during the wire walk, and returns EVERY filter as
    * residual: Spark re-checks above the scan, so the pushdown is purely
    * a row-skip optimization and can never bend results — the same
    * conservative contract as parquet's row-group filters. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(ProtoFilterEval.supports(_, reader))
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed

  override def build(): Scan = new GraftProtoScan(writer, required, path, pushed)
}

class GraftProtoScan(writer: StructType, reader: StructType, path: String,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = reader
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-proto $path readSchema=${reader.fieldNames.mkString(",")} " +
      s"pushed=[${filters.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] =
    GraftProtoDataSource.dataFiles(path).map(GraftProtoFilePartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    GraftProtoReaderFactory(writer, reader, filters)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftProtoMicroBatchStream(writer, reader, path, filters)
}

/** Streaming offset = the SET of shard files already consumed — the same
  * shape Spark's own FileStreamSource checkpoints. Shards are immutable
  * once committed (temp-rename publish), so a (start, end] batch is the
  * deterministic file-set difference and replay from checkpoint re-plans
  * exactly the same records: the Kafka consumer-offset analog (S2/S5),
  * with the shard set as the partition-offset vector. A production
  * compaction of the file list into counted runs is an encoding detail —
  * the contract is the set. */
case class GraftProtoStreamOffset(files: Set[String]) extends Offset {
  override def json: String =
    files.toSeq.sorted.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

class GraftProtoMicroBatchStream(writer: StructType, reader: StructType, path: String,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends MicroBatchStream {

  override def initialOffset(): Offset = GraftProtoStreamOffset(Set.empty)

  override def latestOffset(): Offset =
    GraftProtoStreamOffset(GraftProtoDataSource.dataFiles(path).toSet)

  override def deserializeOffset(json: String): Offset = {
    // the inverse of GraftProtoStreamOffset.json (flat string array)
    val inner = json.trim.stripPrefix("[").stripSuffix("]")
    if (inner.isEmpty) GraftProtoStreamOffset(Set.empty)
    else GraftProtoStreamOffset(
      inner.split("\",\\s*\"").map(_.stripPrefix("\"").stripSuffix("\"")
        .replace("\\\"", "\"").replace("\\\\", "\\")).toSet)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftProtoStreamOffset].files
    val e = end.asInstanceOf[GraftProtoStreamOffset].files
    (e -- s).toSeq.sorted.map(GraftProtoFilePartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftProtoReaderFactory(writer, reader, filters)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint log
  override def stop(): Unit = ()
}

case class GraftProtoFilePartition(file: String) extends InputPartition

case class GraftProtoReaderFactory(writer: StructType, reader: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GraftProtoFilePartition].file
    new PartitionReader[InternalRow] {
      private val in = new BufferedInputStream(new FileInputStream(file), 1 << 16)
      private val decode =
        ProtoSerde.rowDecoder(ProtoSerde.protoSchema(writer), reader)
      private val toCatalyst =
        CatalystTypeConverters.createToCatalystConverter(reader)
      // compiled once per partition; evaluated on the decoded Scala values
      // BEFORE Catalyst conversion, so a skipped record never materializes
      // a row object (wire decode is still paid — byte-level predicate
      // skipping would need per-field evaluation mid-walk, which the
      // residual-filter contract makes a pure optimization to add later)
      private val keep = ProtoFilterEval.compile(filters, reader)
      private var current: InternalRow = _

      override def next(): Boolean = {
        var frame = GraftProtoDataSource.readFrame(in)
        while (frame != null) {
          val values = decode(frame)
          if (keep(values)) {
            current = toCatalyst(Row.fromSeq(values)).asInstanceOf[InternalRow]
            return true
          }
          frame = GraftProtoDataSource.readFrame(in)
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}

/** Three-valued evaluator for pushed source filters over one decoded
  * record. Skip rule: a record is dropped iff some pushed filter
  * evaluates to definite FALSE — unknown (null comparison, unsupported
  * shape, type mismatch) keeps the record, and Spark's residual filter
  * (every pushed filter is also residual) applies exact SQL semantics
  * above the scan. So the evaluator can only ever skip records the query
  * would drop anyway — pushdown is row-skip work saving, never a
  * correctness surface. */
private[graft] object ProtoFilterEval {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._

  private val comparable: Set[DataType] =
    Set(IntegerType, LongType, FloatType, DoubleType, StringType, BooleanType)

  /** Evaluable: all referenced columns are top-level fields of a
    * comparable primitive type present in the read schema. */
  def supports(f: Filter, schema: StructType): Boolean =
    f.references.nonEmpty && f.references.forall { name =>
      schema.fields.exists(fd => fd.name == name && comparable(fd.dataType))
    }

  private def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
    case (null, _) | (_, null) => None
    case (a: Int, b: Int) => Some(java.lang.Integer.compare(a, b))
    case (a: Long, b: Long) => Some(java.lang.Long.compare(a, b))
    // floats: java's compare orders -0.0 < 0.0 and totalizes NaN, but
    // Spark's filter comparisons treat -0.0 == 0.0 and have their own NaN
    // rules — a divergence here would definitively-false-skip a row the
    // residual filter can never resurrect. Normalize zeros; punt NaN to
    // the residual (unknown).
    case (a: Float, b: Float) =>
      if (a.isNaN || b.isNaN) None
      else Some(java.lang.Float.compare(a + 0.0f, b + 0.0f))
    case (a: Double, b: Double) =>
      if (a.isNaN || b.isNaN) None
      else Some(java.lang.Double.compare(a + 0.0d, b + 0.0d))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
    case _ => None // type mismatch: unknown, never skip on it
  }

  private def str(x: Any): Option[String] =
    x match { case s: String => Some(s); case _ => None }

  /** Compiles one filter to a closed evaluator over the decoded value
    * sequence. Column names resolve to positions ONCE here — the per-row
    * path does array reads only, no name lookups or Option boxing (this
    * runs per record on the scan's decode path). None = unknown. */
  private def compileOne(f: Filter, idx: Map[String, Int]): Seq[Any] => Option[Boolean] = {
    // a column missing from the read schema (defensive; residuals keep
    // referenced columns in it) reads as null → unknown → never skipped
    def at(name: String): Seq[Any] => Any = idx.get(name) match {
      case Some(i) => vs => vs(i)
      case None => _ => null
    }
    f match {
      case EqualTo(a, v) => val g = at(a); vs => cmp(g(vs), v).map(_ == 0)
      case EqualNullSafe(a, v) => val g = at(a); vs => {
        val x = g(vs)
        if (x == null || v == null) Some(x == null && v == null)
        else cmp(x, v).map(_ == 0)
      }
      case GreaterThan(a, v) => val g = at(a); vs => cmp(g(vs), v).map(_ > 0)
      case GreaterThanOrEqual(a, v) => val g = at(a); vs => cmp(g(vs), v).map(_ >= 0)
      case LessThan(a, v) => val g = at(a); vs => cmp(g(vs), v).map(_ < 0)
      case LessThanOrEqual(a, v) => val g = at(a); vs => cmp(g(vs), v).map(_ <= 0)
      case In(a, vs0) => val g = at(a); val vals = vs0.toSeq; vs => {
        val x = g(vs)
        if (x == null) None
        else {
          val results = vals.map(v => cmp(x, v))
          if (results.exists(_.contains(0))) Some(true)
          else if (results.forall(_.isDefined)) Some(false)
          else None // a null/mismatched list element: not definitively false
        }
      }
      case IsNull(a) => val g = at(a); vs => Some(g(vs) == null)
      case IsNotNull(a) => val g = at(a); vs => Some(g(vs) != null)
      case StringStartsWith(a, v) => val g = at(a); vs => str(g(vs)).map(_.startsWith(v))
      case StringEndsWith(a, v) => val g = at(a); vs => str(g(vs)).map(_.endsWith(v))
      case StringContains(a, v) => val g = at(a); vs => str(g(vs)).map(_.contains(v))
      case And(l, r) =>
        val cl = compileOne(l, idx); val cr = compileOne(r, idx)
        vs => (cl(vs), cr(vs)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, r) =>
        val cl = compileOne(l, idx); val cr = compileOne(r, idx)
        vs => (cl(vs), cr(vs)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(c) => val cc = compileOne(c, idx); vs => cc(vs).map(!_)
      case _ => _ => None
    }
  }

  /** Record predicate over the decoded value sequence (read-schema
    * order): false iff some filter is definitively false. */
  def compile(filters: Array[Filter], schema: StructType): Seq[Any] => Boolean = {
    if (filters.isEmpty) return _ => true
    val idx = schema.fieldNames.zipWithIndex.toMap
    val compiled = filters.map(compileOne(_, idx))
    values => !compiled.exists(p => p(values).contains(false))
  }
}

class GraftProtoWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    // refuse an incompatible append BEFORE the write job runs — the
    // commit-time check (the authoritative gate against races) would only
    // fire after every task has already written its temp shard
    if (!truncateFirst) GraftProtoBatchWrite.requireAppendCompatible(schema, path)
    new Write {
      override def toBatch: BatchWrite = new GraftProtoBatchWrite(schema, path, truncateFirst)
    }
  }
}

case class GraftProtoCommit(tmpFile: String, finalName: String) extends WriterCommitMessage

object GraftProtoBatchWrite {
  /** Append gate: wire field numbers are POSITIONAL per writer schema, so
    * an append under a reordered/evolved schema would re-number the
    * contract and silently mis-decode every previously written shard.
    * Refuse anything but the identical contract (name+type, in order). */
  def requireAppendCompatible(schema: StructType, path: String): Unit = {
    val sidecar = Paths.get(path, GraftProtoDataSource.SchemaFile)
    if (Files.exists(sidecar)) {
      val existing = GraftProtoDataSource.readSidecar(path)
      val same = existing.fields.map(f => (f.name, f.dataType))
        .sameElements(schema.fields.map(f => (f.name, f.dataType)))
      require(same,
        s"graft-proto: append schema ${schema.simpleString} does not match the " +
          s"directory contract ${existing.simpleString}; field numbers are " +
          "positional, so an evolved append would corrupt existing shards — " +
          "use mode(\"overwrite\") or a new directory")
    }
  }
}

class GraftProtoBatchWrite(schema: StructType, path: String, truncateFirst: Boolean)
    extends BatchWrite {
  // per-write token baked into final shard names: taskIds restart at 0 per
  // SparkContext, so names unique only per-application would collide when a
  // SECOND application appends to the same directory
  private val jobToken: String = UUID.randomUUID().toString.substring(0, 8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftProtoWriterFactory(schema, path, jobToken)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = Paths.get(path)
    Files.createDirectories(dir)
    val sidecar = dir.resolve(GraftProtoDataSource.SchemaFile)
    if (truncateFirst) {
      // overwrite: retire the CONTRACT first, then the shards — a reader
      // racing the truncation then fails loudly ("no sidecar") instead of
      // silently seeing an empty table or decoding new shards under the
      // old positional contract. The overwrite itself is not atomic for
      // concurrent readers (plain-filesystem limitation; a production
      // build would publish into a fresh versioned directory and flip a
      // pointer) — the publish-order guarantee below covers appends.
      Files.deleteIfExists(sidecar)
      GraftProtoDataSource.dataFiles(path).foreach(f => Files.deleteIfExists(Paths.get(f)))
    } else {
      GraftProtoBatchWrite.requireAppendCompatible(schema, path)
    }
    // publish: rename each task's temp shard, then the sidecar LAST — a
    // reader never sees a schema without its data files. No REPLACE: shard
    // names carry the job token, so a name collision is a real conflict and
    // must fail loudly rather than silently replace an earlier shard.
    messages.foreach { case GraftProtoCommit(tmp, finalName) =>
      Files.move(Paths.get(tmp), dir.resolve(finalName))
    }
    Files.write(sidecar, schema.json.getBytes(StandardCharsets.UTF_8))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftProtoCommit(tmp, _) => Files.deleteIfExists(Paths.get(tmp))
      case _ =>
    }
}

case class GraftProtoWriterFactory(schema: StructType, path: String, jobToken: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val tmp: Path = {
        Files.createDirectories(Paths.get(path))
        Paths.get(path, s".tmp-$partitionId-$taskId-${UUID.randomUUID()}")
      }
      private val out = new BufferedOutputStream(new FileOutputStream(tmp.toFile), 1 << 16)
      private val encode = ProtoSerde.rowEncoder(schema)
      private val toScala = CatalystTypeConverters.createToScalaConverter(schema)

      override def write(record: InternalRow): Unit =
        GraftProtoDataSource.writeFrame(out,
          encode(toScala(record).asInstanceOf[Row]))

      override def commit(): WriterCommitMessage = {
        out.close()
        GraftProtoCommit(tmp.toString, f"part-$partitionId%05d-$taskId-$jobToken.gpb")
      }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(tmp) }
      override def close(): Unit = ()
    }
}
