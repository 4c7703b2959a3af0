package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** ENGINE-PORTABLE polynomial string hashes — the hash family that lets
  * the MinHash (q73) and SimHash (q74) near-dup queries answer to a
  * DuckDB oracle. xxhash64 is engine-specific; a polynomial fold over
  * Unicode code points is plain integer arithmetic any SQL engine can
  * replay (`LIST_REDUCE` over `UNICODE(SUBSTR(...))` on the oracle
  * side), the same portability trick q87/q114/q126 use for their
  * multiplicative sampling keys.
  *
  * Token hash: h = Seed; for each code point c: h = (h·m + c) mod P,
  * with P = 2³¹−1 (Mersenne). All intermediates fit a signed 64-bit
  * integer (h < 2³¹, m ≤ 137 ⇒ h·m + c < 2³⁹), so both engines compute
  * on BIGINT with no overflow and no wrapping semantics to match.
  * Collisions (P is only 2³¹) are MIRRORED by construction — both
  * engines hash identically — so oracle equality is unaffected; the
  * estimate quality loss vs a 64-bit hash is negligible at 64 MinHash
  * slots.
  */
object PolyHash {
  val P = 2147483647L // 2^31 - 1
  val M1 = 131L
  val M2 = 137L
  val Seed = 7L
  val Mask30: Long = (1L << 30) - 1
  // final affine mix: a short token's raw fold is numerically SMALL (a
  // 3-char fold stays under 2^24), which would zero the high bits of
  // every short token's hash — fatal for SimHash, whose per-bit counters
  // need full-width entropy. One multiply-add mod P spreads any fold
  // value across the field. (Intermediates: h < 2^31, MixA < 2^31 ⇒
  // product < 2^62, still safe in BIGINT on both engines.)
  val MixA = 1103515245L
  val MixB = 12345L

  /** Polynomial fold over the string's Unicode code points, plus the
    * final affine mix. Matches the oracle's per-CHARACTER fold: DuckDB's
    * LEN/SUBSTR are code-point based, as is this iteration (surrogate
    * pairs advance by 2 chars but contribute ONE code point). Empty
    * string → mix(Seed) (the oracle seeds its LIST_REDUCE with the same
    * sentinel, so empty tokens agree). */
  def foldToken(s: String, mult: Long): Long = {
    var h = Seed
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      h = (h * mult + cp) % P
      i += Character.charCount(cp)
    }
    (h * MixA + MixB) % P
  }

  /** 60-bit SimHash token hash: two independent folds (M1, M2), low 30
    * bits of each packed side by side. Bits 60-63 are always zero —
    * fed through the 64-bit [[SimHashAgg]] those counters stay negative
    * and the signature's top bits are zero in BOTH engines. */
  def simToken(s: String): Long = {
    val p1 = foldToken(s, M1)
    val p2 = foldToken(s, M2)
    ((p1 & Mask30) << 30) | (p2 & Mask30)
  }
}

/** Distinct word-n-gram shingle hashes under the PORTABLE family: token
  * hashes first (one fold per word), then the shingle base is an
  * arithmetic combine of the n token hashes — b = t₁; b = (b·M1 + tₖ)
  * mod P — so the oracle recomputes shingles from ITS token-hash list
  * without re-walking characters per shingle. Same one-compiled-pass,
  * first-seen-dedup shape as [[ShingleHashes]] (the xxhash64 twin used
  * where no oracle needs to replay the hash). */
case class ShinglePolyHashes(child: Expression, n: Int = 3)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingles_poly"

  override def nullSafeEval(input: Any): Any = {
    // limit -1 keeps trailing empty tokens, matching Spark's split() and
    // DuckDB's STRING_SPLIT tokenization exactly
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) new GenericArrayData(Array.empty[Long])
    else {
      val th = new Array[Long](words.length)
      var w = 0
      while (w < words.length) { th(w) = PolyHash.foldToken(words(w), PolyHash.M1); w += 1 }
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= words.length - n) {
        var b = th(i)
        var k = 1
        while (k < n) { b = (b * PolyHash.M1 + th(i + k)) % PolyHash.P; k += 1 }
        seen.add(b)
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglePolyHashes =
    copy(child = newChild)
}

/** POSITIONAL word-n-gram hashes under the portable family: element i
  * (0-based) is the hash of tokens i..i+n−1, NO dedup — length
  * max(L−n+1, 0). [[ShinglePolyHashes]] answers "which shingles does
  * this doc contain" (a set, for Jaccard/MinHash); this answers "what
  * span STARTS at each position" (a sequence), which is what
  * span-level dedup needs: a position is duplicated text iff some
  * corpus-frequent span covers it, so the start offsets must survive
  * hashing. Same token fold + arithmetic combine as the set form, so
  * the oracle replays it from its token-hash list with one
  * GENERATE_SERIES. */
case class SpanPolyHashes(child: Expression, n: Int = 5)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_spans_poly"

  override def nullSafeEval(input: Any): Any = {
    // limit -1 keeps trailing empty tokens, matching Spark's split() and
    // DuckDB's STRING_SPLIT tokenization exactly
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < n) new GenericArrayData(Array.empty[Long])
    else {
      val th = new Array[Long](words.length)
      var w = 0
      while (w < words.length) { th(w) = PolyHash.foldToken(words(w), PolyHash.M1); w += 1 }
      val out = new Array[Long](words.length - n + 1)
      var i = 0
      while (i <= words.length - n) {
        var b = th(i)
        var k = 1
        while (k < n) { b = (b * PolyHash.M1 + th(i + k)) % PolyHash.P; k += 1 }
        out(i) = b
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SpanPolyHashes =
    copy(child = newChild)
}

/** [[PolyHash.foldToken]] (M1 family) as a scalar expression — the plain
  * per-token portable hash in [0, P). q73 uses the same fold per word
  * inside its shingle combine; this exposes it standalone for operators
  * that sketch the TOKEN universe directly (q130's per-source KMV
  * vocabulary sketches). Oracle mirror: the shared `polyFoldSql`
  * fragment (Dedup.scala) replays it in DuckDB character by character. */
case class TokenPolyHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_tokhash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.foldToken(input.asInstanceOf[UTF8String].toString, PolyHash.M1)

  override protected def withNewChildInternal(newChild: Expression): TokenPolyHash =
    copy(child = newChild)
}

/** [[PolyHash.simToken]] as an expression — q74's per-token hash. */
case class SimTokenPolyHash(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simtoken"

  override def nullSafeEval(input: Any): Any =
    PolyHash.simToken(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): SimTokenPolyHash =
    copy(child = newChild)
}
