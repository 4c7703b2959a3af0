package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string, as a native codegen expression —
  * the compression-ratio quality signal (compressed/raw bytes) used by
  * published corpus-curation pipelines: highly repetitive or templated
  * text compresses far below ~0.4, natural prose sits near 0.5–0.8, and
  * near-random strings exceed 1 (DEFLATE's stored-block overhead). Spark
  * has no compression function, and a per-row UDF would drop the hot
  * cleaning path out of whole-stage codegen.
  *
  * Level 6 (zlib default), raw-deflate (nowrap — no zlib header, so tiny
  * inputs aren't dominated by framing). Deterministic for a given JVM's
  * zlib; engine-specific by nature, so q128 is a rows-only query with its
  * semantics pinned in ScalaTest rather than a DuckDB oracle (the same
  * class as the MinHash/SimHash signatures).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLenKernel.len(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateLenKernel$$.MODULE$$.len($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLenKernel {
  // Deflater is stateful native machinery; one per executor thread,
  // reset() between rows — no per-row allocation, no sharing across
  // threads (Deflater is not thread-safe)
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def len(s: UTF8String): Long = {
    val in = s.getBytes
    val d = deflater.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = sink.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
