package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{lit, pmod}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch — the ENGINE-PORTABLE
  * cardinality estimator that lets q27 answer to a DuckDB oracle, the
  * same portability move that took MinHash/SimHash (q73/q74) from
  * rows-only to hash-green. `approx_count_distinct`'s HyperLogLog is
  * engine-private (its buckets can't be replayed in SQL); KMV's entire
  * state is "the k smallest distinct hash values", which any engine
  * reproduces with `ROW_NUMBER() OVER (ORDER BY hash) <= k`.
  *
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002): with h uniform on [0, P), the k-th smallest of
  * n distinct hashes sits near k·P/n, so n̂ = (k−1)·P / h₍ₖ₎. Fewer than
  * k distinct hashes → the sketch IS the distinct set, return its size
  * exactly. All arithmetic is integer (BIGINT-safe: (k−1)·P < 2⁴¹ and
  * both engines truncate positive division identically), so the oracle
  * matches bit-for-bit, not approximately.
  *
  * Relative error ~1/√k ≈ 3% at the default k=1024; the ScalaTest suite
  * bounds it against the exact count. Same 100 TB story as HLL: constant
  * memory per group (k longs), map-side combinable (merge = union+trim,
  * associative and commutative), shuffle carries one sketch per group.
  */
object Kmv {
  val K = 1024
  val P: Long = PolyHash.P // 2^31 - 1

  /** Portable integer hash into [0, P): an affine spread (the PolyHash
    * mix constants) followed by a modular square for non-linearity —
    * an affine-only map of a DENSE key domain (partkeys are 1..N) walks
    * an arithmetic progression mod P whose min-k is far from uniform,
    * which would bias the estimator; squaring breaks the progression.
    * Every intermediate fits a signed 64-bit integer ((x mod P) < 2³¹,
    * ·MixA < 2⁶¹; u² < 2⁶²; (u² mod P)·M1 < 2³⁸), so DuckDB replays it
    * with plain BIGINT `%` arithmetic — no overflow semantics to match.
    */
  def hashCol(x: Column): Column = {
    val u = (pmod(x.cast(LongType), lit(P)) * lit(PolyHash.MixA) + lit(PolyHash.MixB)) % lit(P)
    ((u * u) % lit(P) * lit(PolyHash.M1) + u) % lit(P)
  }

  /** The same hash as [[hashCol]] for a DuckDB oracle, as a SQL fragment
    * over `xExpr` (oracle side CASTs to BIGINT first — parquet may have
    * surfaced the key as INT32, whose product would overflow). */
  def hashSql(xExpr: String): String = {
    val u = s"(((CAST($xExpr AS BIGINT) % $P) * ${PolyHash.MixA} + ${PolyHash.MixB}) % $P)"
    s"(($u * $u) % $P * ${PolyHash.M1} + $u) % $P"
  }
}

/** Bounded primitive buffer for the k smallest DISTINCT hash values: a
  * plain long array kept SORTED ascending. The hot path after the
  * buffer saturates is one primitive comparison against the current
  * maximum (`a(n-1)`) — no boxing, no tree walk; an accepted value
  * (probability ~k/seen, vanishing over a scan) pays one binary search
  * + one System.arraycopy shift. Far fewer accepts than rejects is the
  * KMV regime this is shaped for.
  */
final class KmvBuffer(val k: Int) {
  val a = new Array[Long](k)
  var n = 0

  def maxKept: Long = a(n - 1)

  /** Insert h if it belongs among the k smallest distinct values. */
  def insert(h: Long): Unit = {
    if (n == k && h >= a(n - 1)) return // saturated reject: 1 comparison
    var idx = java.util.Arrays.binarySearch(a, 0, n, h)
    if (idx >= 0) return // already present: distinct set unchanged
    idx = -(idx + 1)
    val shift = math.min(n, k - 1) - idx // drop the max when full
    if (shift > 0) System.arraycopy(a, idx, a, idx + 1, shift)
    a(idx) = h
    if (n < k) n += 1
  }
}

/** The sketch as a single `TypedImperativeAggregate` (same shape as
  * [[MinHashAgg]]): buffer = the k smallest DISTINCT hash values;
  * update inserts-if-smaller; merge unions and trims back to k. Input:
  * the [[Kmv.hashCol]] hash (bigint in [0, P)). Output: the estimated
  * distinct count as a bigint.
  */
case class KmvAgg(
    child: Expression,
    k: Int = Kmv.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer]
    with UnaryLike[Expression] {

  def this(child: Expression) = this(child, Kmv.K, 0, 0)

  override def prettyName: String = "graft_kmv"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.a(i)); i += 1 }
    a
  }

  /** n < k: the sketch saw every distinct hash — exact. Otherwise
    * (k−1)·P / h₍ₖ₎ with positive integer division (bit-identical to the
    * oracle's `//`). h₍ₖ₎ > 0 always: the k kept values are distinct
    * non-negatives, so the LARGEST of them is ≥ k−1 ≥ 1. */
  override def eval(buf: KmvBuffer): Any =
    if (buf.n < k) buf.n.toLong
    else ((k - 1).toLong * Kmv.P) / buf.maxKept

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new KmvBuffer(k)
    // serialized ascending (the buffer IS sorted), so inserts hit the
    // fast append path
    var i = 0
    while (i < n) { out.insert(bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

/** [[KmvAgg]]'s SET form: same buffer, same update/merge, but eval
  * returns the sketch ITSELF (the k smallest distinct hashes, ascending)
  * instead of the cardinality estimate. This is what makes KMV an
  * ALGEBRA rather than just a counter (Beyer et al., SIGMOD 2007, "On
  * synopses for distinct value estimation under multiset operations"):
  * the k smallest values of A∪B are all present in sketch(A) ∪
  * sketch(B), so union/intersection/Jaccard estimates over ANY
  * combination of groups are computable from the per-group sketches
  * alone — no second corpus pass. q130 does exactly that for
  * cross-source vocabulary overlap; the oracle replays the sketch with
  * `ROW_NUMBER() OVER (ORDER BY hash) <= k` and the same integer
  * estimator arithmetic, so the rows are hash-exact. */
case class KmvSetAgg(
    child: Expression,
    k: Int = Kmv.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer]
    with UnaryLike[Expression] {

  def this(child: Expression) = this(child, Kmv.K, 0, 0)

  override def prettyName: String = "graft_kmv_set"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < b.n) { a.insert(b.a(i)); i += 1 }
    a
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOf(buf.a, buf.n))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 8)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new KmvBuffer(k)
    var i = 0
    while (i < n) { out.insert(bb.getLong()); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSetAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSetAgg =
    copy(child = newChild)
}
