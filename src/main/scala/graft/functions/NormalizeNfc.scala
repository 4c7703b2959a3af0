package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression (SURVEY.md
  * §7.2 custom-surface). Spark ships no Unicode-normalization function,
  * so a corpus-cleaning pipeline would otherwise reach for a Scala UDF —
  * boxed, opaque to codegen, and a per-row serialization tax in the hot
  * path of every document. This expression stays inside whole-stage
  * codegen (one static call per row) and short-circuits twice: full-ASCII
  * input (the bulk of real corpora) returns the input OBJECT with zero
  * allocation (ASCII is NFC by construction — `isFullAscii` reads the
  * existing bytes), and already-normalized non-ASCII pays one decode but
  * skips the compose-and-reencode.
  *
  * Canonical-composition semantics (NFC) match DuckDB's
  * `NFC_NORMALIZE(...)`, which the oracle uses — both delegate to the
  * Unicode canonical composition algorithm, so composed output is
  * codepoint-identical across engines.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NormalizeNfcKernel.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static module call (RandomProjectKernel's idiom): the kernel is
    // stateless, so nothing needs addReferenceObj capture
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeNfcKernel$$.MODULE$$.norm($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

/** NFC + LOCALE-INDEPENDENT simple-mapping lowercase in one pass.
  *
  * Spark's own `lower()` is a trap for oracle parity on exactly the
  * non-ASCII text the NFC pass exists for: its non-ASCII path calls
  * `String.toLowerCase()` with the JVM DEFAULT locale (so 'TITLE' lowers
  * to dotless-ı 'tıtle' on a Turkish-locale JVM) and applies Java's FULL
  * case mappings (İ → i + combining dot, 2 codepoints). DuckDB's `LOWER`
  * uses utf8proc's locale-independent SIMPLE 1:1 mapping. This expression
  * lowers per-codepoint via `Character.toLowerCase(int)` — the same
  * UnicodeData.txt simple mapping utf8proc uses — so results are
  * machine-independent and engine-consistent.
  */
case class NfcLowerSimple(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_nfc_lower"

  override def nullSafeEval(input: Any): Any =
    NormalizeNfcKernel.normLower(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeNfcKernel$$.MODULE$$.normLower($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcLowerSimple =
    copy(child = newChild)
}

object NormalizeNfcKernel {
  private val Nfc = java.text.Normalizer.Form.NFC

  /** Returns the input object unchanged when full-ASCII (zero-alloc: ASCII
    * is NFC by construction) or already NFC; otherwise decodes, composes,
    * and re-encodes. */
  def norm(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, Nfc)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, Nfc))
  }

  /** NFC then simple-mapping lowercase. Full-ASCII rides UTF8String's own
    * byte-wise ASCII lowering (locale-independent by construction). */
  def normLower(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s.toLowerCase
    val str0 = s.toString
    val str =
      if (java.text.Normalizer.isNormalized(str0, Nfc)) str0
      else java.text.Normalizer.normalize(str0, Nfc)
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
