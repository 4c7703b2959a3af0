package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) — the boundary detector behind
  * storage-level dedup (LBFS/rsync lineage: Muthitacharoen et al., SOSP
  * 2001). A fixed-size chunker breaks on any insertion (every later
  * chunk shifts); a CONTENT-defined chunker cuts where a rolling hash of
  * the last [[CdcChunker.Window]] code points hits a divisor condition,
  * so chunk boundaries re-synchronize right after any edit and shared
  * runs between versions/documents land in identical chunks.
  *
  * The hash is the seedless windowed polynomial over code points
  *
  *   D_i = Σ_{j=1..w} c_{i−w+j} · M1^{w−j}  mod P
  *
  * (PolyHash's portable family: DuckDB replays it as a LIST_REDUCE over
  * the window — LIST_REDUCE's first-element seeding IS the seedless
  * fold), maintained in O(1) per position via the rolling identity
  * D_i = (D_{i−1} − c_{i−w}·M1^{w−1})·M1 + c_i mod P. A cut falls after
  * position i (1-based, code points — matching SUBSTR/LEN semantics on
  * the oracle side) when i ≥ w and D_i mod [[CdcChunker.Divisor]] = 0;
  * the final position is always a cut, so chunks tile the document.
  * Expected chunk length ≈ Divisor code points.
  */
object CdcChunker {
  /** Rolling window width in code points. */
  val Window = 16
  /** Cut when the window hash ≡ 0 mod this — the expected chunk size. */
  val Divisor = 64L
  /** M1^(Window-1) mod P — the outgoing character's weight. */
  val WindowPow: Long = {
    var p = 1L
    var k = 0
    while (k < Window - 1) { p = (p * PolyHash.M1) % PolyHash.P; k += 1 }
    p
  }

  /** Cut positions (1-based, code points, ascending; always ends with
    * the text's length; empty for the empty string). Called from both
    * the interpreted eval and the generated code. */
  def cuts(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val ring = new Array[Long](Window)   // last w code points, circular
    val out = new java.util.ArrayList[Integer](8)
    var h = 0L
    var pos = 0  // code-point position of the char just consumed
    var i = 0    // java char index
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      pos += 1
      if (pos > Window) {
        val old = ring(pos % Window)
        h = (((h - old * WindowPow) % PolyHash.P + PolyHash.P) * PolyHash.M1 + cp) % PolyHash.P
      } else {
        h = (h * PolyHash.M1 + cp) % PolyHash.P
      }
      ring(pos % Window) = cp.toLong
      if (pos >= Window && h % Divisor == 0L) out.add(pos)
    }
    if (pos > 0 && (out.isEmpty || out.get(out.size - 1) != pos)) out.add(pos)
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < out.size) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `graft_cdc_cuts(text)` → `array<int>` of chunk-end positions. */
case class CdcCuts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_cdc_cuts"

  override def nullSafeEval(input: Any): Any =
    CdcChunker.cuts(input.asInstanceOf[UTF8String])

  // stays inside whole-stage codegen as a single static call — no
  // InternalRow boxing, no fallback-to-interpreted marker on the plan
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunker.cuts($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}
