package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter CANDIDATE sketch constants. */
object HeavyHitters {
  /** Counter capacity k. The mergeable-summaries guarantee: after any
    * sequence of updates and merges over n items, every item with true
    * frequency > n/(k+1) still holds a counter. 200 counters cover a 1%
    * threshold with a 2× margin. */
  val Capacity = 200
}

/** Misra-Gries frequent-items sketch as a [[TypedImperativeAggregate]]:
  * bounded state (≤ [[HeavyHitters.Capacity]] counters per partial
  * buffer, merged with the Agarwal et al. "mergeable summaries" rule), one
  * pass, any merge order. Emits the CANDIDATE token array — a guaranteed
  * superset of every item above the frequency floor; callers re-count the
  * candidates exactly (a second cheap pass filtered to ≤ k tokens) to get
  * deterministic exact output. That two-pass shape is what q118 pins: the
  * sketch bounds state at 100 TB where a full groupBy's vocabulary would
  * not fit a single "find the heavy tail" reporting query.
  */
case class HeavyHittersAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 0, 0)

  private val k = HeavyHitters.Capacity

  override def prettyName: String = "graft_heavy_hitters"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may view a reused buffer — materialize the key
      val t = v.asInstanceOf[UTF8String].toString
      buf.get(t) match {
        case Some(c) => buf(t) = c + 1
        case None if buf.size < k => buf(t) = 1L
        case None =>
          // classic MG step: a full table + unseen item decrements all
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop ≤ 0 —
      // the merge that keeps the n/(k+1) guarantee under any merge tree
      val m = a.values.toArray.sortInPlace()(Ordering.Long.reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - m)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sortInPlace()
        .map(t => UTF8String.fromString(t): AnyRef))

  // length-prefixed raw UTF-8, NOT writeUTF: writeUTF throws
  // UTFDataFormatException past 64 KB, and one space-free >64 KB run
  // (minified JSON, base64 spam) becoming a counter key would crash the
  // whole job at shuffle-serialize time
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}
