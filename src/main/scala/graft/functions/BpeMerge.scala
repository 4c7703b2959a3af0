package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One byte-pair-encoding merge applied to a token sequence — the inner
  * kernel of iterative BPE training (Sennrich et al., ACL 2016: learn the
  * most frequent adjacent pair, replace its occurrences with a single
  * symbol, repeat) lifted to graft's whitespace-token stream: the merged
  * symbol for (l, r) is the detokenized span `l ⧺ " " ⧺ r`, so a learned
  * symbol is always exactly the text it covers (joining any round's
  * tokens on single spaces reproduces the document — the SemanticsSpec
  * detokenization law) and can never collide with an unmerged token
  * (whitespace-split tokens contain no space).
  *
  * Matching is the standard greedy left-to-right non-overlapping scan:
  * positions are consumed in order, and a pair occurrence starting at a
  * position whose left token was just consumed by the previous merge does
  * NOT fire (the [a a a] ⊕ (a,a) → [«a a», a] case). The oracle replays
  * the same rule relationally: islands of consecutive matching positions
  * keep their even offsets (runs longer than one position require l = r,
  * where greedy scanning takes every other start).
  *
  * At 100 TB this is the whole point of the kernel: applying a merge is a
  * pure per-row map over the sequence column — no explode, no shuffle, no
  * window — so a serving-side tokenizer replaying R trained merges is one
  * codegen'd scan of the corpus.
  */
object BpeMerge {
  private val Space = UTF8String.fromString(" ")

  /** The merged symbol for a pair — the space-joined span. */
  def mergedSymbol(l: UTF8String, r: UTF8String): UTF8String =
    UTF8String.concat(l, Space, r)

  /** Greedy left-to-right application of one merge to a token sequence.
    * Called from both the interpreted eval and the generated code. */
  def applyMerge(tokens: ArrayData, l: UTF8String, r: UTF8String): GenericArrayData = {
    val n = tokens.numElements()
    val m = mergedSymbol(l, r)
    val out = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (i + 1 < n && t != null && t.equals(l) && {
        val u = tokens.getUTF8String(i + 1)
        u != null && u.equals(r)
      }) {
        out(k) = m
        i += 2
      } else {
        out(k) = t
        i += 1
      }
      k += 1
    }
    new GenericArrayData(
      if (k == n) out
      else java.util.Arrays.copyOfRange(out.asInstanceOf[Array[AnyRef]], 0, k)
        .asInstanceOf[Array[Any]])
  }
}

/** `graft_bpe_merge(tokens, l, r)` → `array<string>`: the sequence with
  * one (l, r) merge applied greedily left-to-right. Null-intolerant like
  * every graft expression: a NULL pair (the "no pair left to merge" row
  * from an empty argmax) nulls the result, and callers restore the
  * untouched sequence with `coalesce(graft_bpe_merge(t, l, r), t)`. */
case class BpeApplyMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "graft_bpe_merge"

  override def nullSafeEval(tokens: Any, l: Any, r: Any): Any =
    BpeMerge.applyMerge(tokens.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  // stays inside whole-stage codegen as a single static call — no
  // InternalRow boxing, no fallback-to-interpreted marker on the plan
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, l, r) =>
      s"graft.functions.BpeMerge.applyMerge($t, $l, $r)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeApplyMerge =
    copy(first = newFirst, second = newSecond, third = newThird)
}
