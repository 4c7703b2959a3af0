package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes of a text column in ONE compiled
  * pass per row (SURVEY.md §7.2(b)).
  *
  * The declarative formulation —
  * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(...))))`
  * — is semantically identical but higher-order functions evaluate
  * interpreted: dozens of boxed sub-expression evaluations per shingle.
  * This expression does the split + n-gram join + xxhash64 + dedup in a
  * tight Scala loop (CodegenFallback costs one virtual call per ROW, not
  * per shingle). Hash values are bit-identical to
  * `xxhash64(concat_ws(' ', w_i, w_i+1, w_i+2))`: the same XxHash64 over
  * the same UTF-8 bytes with Spark's default seed 42.
  */
case class ShingleHashes(child: Expression, n: Int = 3)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    // limit -1 keeps trailing empty tokens, matching Spark's split() and
    // DuckDB's STRING_SPLIT tokenization exactly
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) new GenericArrayData(Array.empty[Long])
    else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val h = XxHash64Function.hash(
          UTF8String.fromString(sb.toString), StringType, 42L)
        seen.add(h)
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
