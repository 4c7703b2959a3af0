package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared MinHash parameters: the universal hash family
  * h_i(x) = (a_i·x + b_i) mod p over a 2³¹−1 Mersenne prime, seeded
  * deterministically (no wall clock). Used by the aggregate below and by
  * the LSH banding in graft.operators.Dedup.
  */
object MinHash {
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands
  val P = 2147483647L // 2^31 - 1

  val (coeffA: Array[Long], coeffB: Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val a = Array.fill(NumHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(NumHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }
}

/** MinHash signature as a single custom `TypedImperativeAggregate`
  * (SURVEY.md §7.2(b)): buffer = 64 running minima; update applies the
  * whole hash family to one shingle hash in a primitive loop; merge is
  * elementwise min — associative and commutative, so Spark's
  * partial/final (map-side combine) aggregation applies unchanged. This
  * replaces 64 separate `min(pmod(...))` aggregate columns, whose
  * generated code dwarfed the actual work.
  *
  * Input: a shingle hash already reduced into [0, p) (e.g.
  * `pmod(xxhash64(shingle), p)`). Output: `array<long>` of 64 slots.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 0, 0)

  override def prettyName: String = "graft_minhash"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHash.NumHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      val a = MinHash.coeffA; val b = MinHash.coeffB
      var i = 0
      while (i < MinHash.NumHashes) {
        val h = (a(i) * base + b(i)) % MinHash.P
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < MinHash.NumHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(MinHash.NumHashes * 8)
    var i = 0
    while (i < MinHash.NumHashes) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(MinHash.NumHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
