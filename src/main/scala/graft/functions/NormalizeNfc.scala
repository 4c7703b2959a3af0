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
  * codegen (one static call per row) and short-circuits on the
  * already-normalized fast path, which for real corpora is the vast
  * majority of rows: `Normalizer.isNormalized` is a scan that allocates
  * nothing, while `normalize` would copy the string even when it is a
  * no-op.
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

object NormalizeNfcKernel {
  private val Nfc = java.text.Normalizer.Form.NFC

  /** Returns the input object unchanged when already NFC (zero-alloc fast
    * path); otherwise decodes, composes, and re-encodes. */
  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, Nfc)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, Nfc))
  }
}
