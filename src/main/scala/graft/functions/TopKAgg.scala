package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
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
  * summary, with the mergeable-summaries floor of Agarwal et al.): per
  * group, the top-k values by count from a bounded summary of `capacity`
  * counters — the constant-memory answer to "top event types / domains /
  * tokens per key" that an exact groupBy-within-groupBy needs unbounded
  * state for.
  *
  * Semantics: the buffer is ≤ `capacity` (value → count, err) counters
  * plus a FLOOR — an upper bound on the true count of any value NOT in the
  * summary. Update of an absent value inserts at floor+1 (err = floor);
  * at capacity the deterministic minimum (smallest count, then smallest
  * value) is evicted first and the floor rises to its count. Merge sums
  * counts for shared values, charges each one-sided value the other
  * summary's floor, adds the floors, and trims back to capacity raising
  * the floor to the largest trimmed count. This preserves the space-saving
  * invariant UNDER ANY MERGE TREE: every reported count ≥ the value's true
  * count, over-estimated by ≤ Σ floors ≤ n/capacity-style bounds — a
  * trimmed value's mass is never silently lost. Eval emits the top `k` as
  * an ordered ARRAY<STRUCT<value, cnt>> with the deterministic
  * (count desc, value asc) tie-break.
  *
  * EXACTNESS CONTRACT (what the DuckDB oracle certifies): while a group's
  * distinct-value count stays ≤ capacity, no eviction happens, every floor
  * stays 0, counts are exact, and the result is merge-order-independent —
  * so a query sized `capacity ≥ |domain|` is hash-checkable against the
  * exact SQL top-k. Past capacity the summary degrades gracefully to the
  * over-estimation bounds above; capacity is the scale knob, exactly like
  * the HLL precision in `olap_approx_distinct`.
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
    extends TypedImperativeAggregate[TopKAgg.Summary]
    with UnaryLike[Expression] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKAgg.Summary = new TopKAgg.Summary

  override def update(buf: TopKAgg.Summary, input: InternalRow): TopKAgg.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val m = buf.counters
      m.get(s) match {
        case Some((c, e)) => m(s) = (c + 1, e)
        case None if m.size < capacity => m(s) = (buf.floor + 1, buf.floor)
        case None =>
          // evict the deterministic minimum: smallest count, then smallest
          // value string; its count raises the floor (it IS the bound on
          // anything no longer tracked) and the newcomer inherits it
          val (mv, (mc, _)) = m.minBy { case (value, (c, _)) => (c, value) }
          m.remove(mv)
          buf.floor = math.max(buf.floor, mc)
          m(s) = (buf.floor + 1, buf.floor)
      }
    }
    buf
  }

  override def merge(b1: TopKAgg.Summary, b2: TopKAgg.Summary): TopKAgg.Summary = {
    val m1 = b1.counters
    // ONLY one-sided values are charged the absent side's floor (that side
    // may have seen up to floor occurrences it no longer remembers); a
    // value tracked on BOTH sides sums its tracked counts and must NOT be
    // floor-charged — that would over-estimate past the Σ-floors bound and
    // make merge order-sensitive
    if (b2.floor > 0) {
      m1.mapValuesInPlace { case (value, (c, e)) =>
        if (b2.counters.contains(value)) (c, e)
        else (c + b2.floor, e + b2.floor)
      }
    }
    b2.counters.foreach { case (value, (c, e)) =>
      m1.get(value) match {
        case Some((c1, e1)) => m1(value) = (c1 + c, e1 + e)
        case None => m1(value) = (c + b1.floor, e + b1.floor)
      }
    }
    b1.floor += b2.floor
    if (m1.size > capacity) {
      val ordered = m1.toSeq.sortBy { case (value, (c, _)) => (-c, value) }
      val (keep, drop) = ordered.splitAt(capacity)
      // the largest trimmed count bounds every value the summary forgets
      b1.floor = math.max(b1.floor, drop.head._2._1)
      m1.clear()
      keep.foreach { case (value, ce) => m1(value) = ce }
    }
    b1
  }

  override def eval(buf: TopKAgg.Summary): Any = {
    val top = buf.counters.toSeq
      .sortBy { case (value, (c, _)) => (-c, value) }
      .take(k)
      .map { case (value, (c, _)) =>
        new GenericInternalRow(Array[Any](UTF8String.fromString(value), c)) }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(buf: TopKAgg.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.floor)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (value, (c, e)) =>
      // length-prefixed raw UTF-8 (writeUTF caps values at 64 KiB — a long
      // token/URL value must round-trip, not kill the shuffle)
      val bytes = value.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): TopKAgg.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val buf = new TopKAgg.Summary
    buf.floor = in.readLong()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val bytes = new Array[Byte](in.readInt())
      in.readFully(bytes)
      buf.counters(new String(bytes, StandardCharsets.UTF_8)) =
        (in.readLong(), in.readLong())
    }
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
  /** Mutable space-saving summary: bounded counters + the floor (upper
    * bound on any untracked value's true count; 0 until the first
    * eviction/trim — i.e. always 0 in the exact regime). */
  final class Summary {
    val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
    var floor: Long = 0L
  }

  /** approx_top_k(v, k, capacity) — ordered ARRAY<STRUCT<value, cnt>> of the
    * group's top-k values; exact while distincts ≤ capacity. */
  def approx_top_k(v: Column, k: Int, capacity: Int): Column =
    GraftSqlBridge.column(
      TopKAgg(GraftSqlBridge.expression(v), k, capacity).toAggregateExpression())
}
