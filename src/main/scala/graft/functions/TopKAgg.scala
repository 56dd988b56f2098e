package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native SPACE-SAVING heavy-hitters aggregate (Metwally et al.'s stream
  * summary): per group, the top-k values by count from a bounded summary of
  * `capacity` counters — the constant-memory answer to "top event types /
  * domains / tokens per key" that an exact groupBy-within-groupBy needs
  * unbounded state for.
  *
  * Semantics: update keeps at most `capacity` (value → count, err)
  * counters; a new value arriving at a full summary replaces the current
  * minimum (deterministically the lexicographically-smallest among
  * minimums) and inherits its count as over-estimation error. Merge sums
  * counts/errors for shared values and trims back to capacity by
  * (count desc, value asc). Eval emits the top `k` as an ordered
  * ARRAY<STRUCT<value, cnt>> with the deterministic (count desc, value asc)
  * tie-break.
  *
  * EXACTNESS CONTRACT (what the DuckDB oracle certifies): while a group's
  * distinct-value count stays ≤ capacity, NO eviction ever happens, every
  * err is 0, counts are exact, and the result is merge-order-independent —
  * so a query sized `capacity ≥ |domain|` is hash-checkable against the
  * exact SQL top-k. Past capacity the summary degrades gracefully
  * (over-estimation ≤ n/capacity, the space-saving bound) but is no longer
  * deterministic across partitionings; capacity is the scale knob, exactly
  * like the HLL precision in `olap_approx_distinct`.
  *
  * Why TypedImperativeAggregate (same reasoning as [[SimhashAgg]]): the
  * summary is an imperative bounded map — inexpressible as built-in
  * aggregates without a per-group collect_list (unbounded memory, the
  * anti-pattern this sketch exists to avoid).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
    with UnaryLike[Expression] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some((c, e)) => buf(s) = (c + 1, e)
        case None if buf.size < capacity => buf(s) = (1L, 0L)
        case None =>
          // evict the deterministic minimum: smallest count, then smallest
          // value string — the replaced counter's count becomes the new
          // value's over-estimation error (classic space-saving)
          val (mv, (mc, _)) = buf.minBy { case (value, (c, _)) => (c, value) }
          buf.remove(mv)
          buf(s) = (mc + 1, mc)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, (Long, Long)],
      b2: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    b2.foreach { case (value, (c, e)) =>
      b1.get(value) match {
        case Some((c1, e1)) => b1(value) = (c1 + c, e1 + e)
        case None => b1(value) = (c, e)
      }
    }
    if (b1.size > capacity) {
      val keep = b1.toSeq
        .sortBy { case (value, (c, _)) => (-c, value) }
        .take(capacity)
      b1.clear()
      keep.foreach { case (value, ce) => b1(value) = ce }
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq
      .sortBy { case (value, (c, _)) => (-c, value) }
      .take(k)
      .map { case (value, (c, _)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(value), c)) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (value, (c, e)) =>
      out.writeUTF(value); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ => buf(in.readUTF()) = (in.readLong(), in.readLong()) }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  /** approx_top_k(v, k, capacity) — ordered ARRAY<STRUCT<value, cnt>> of the
    * group's top-k values; exact while distincts ≤ capacity. */
  def approx_top_k(v: Column, k: Int, capacity: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(v), k, capacity).toAggregateExpression())
}
