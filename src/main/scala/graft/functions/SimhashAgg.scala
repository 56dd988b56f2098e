package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Native SimHash aggregate: folds per-token 60-bit hash values into the
  * per-group SimHash signature — buffer = 60 signed bit-counters, update =
  * `counter(j) += ±1` per bit, merge = vector add, eval = sign fold into
  * one BIGINT.
  *
  * Why a custom TypedImperativeAggregate instead of 60 built-in
  * `sum(CASE ...)` columns: 60 separate aggregates generate a huge
  * whole-stage-codegen unit whose Janino compile costs seconds, and
  * Spark's 100-entry codegen cache evicts it between runs in any
  * multi-query session — the query pays full compile latency every time.
  * The imperative buffer is a tight primitive loop with near-zero codegen
  * surface, and the arithmetic is the IDENTICAL exact integer math, so the
  * DuckDB oracle (explicit 60-sum SQL) still matches bit-for-bit.
  */
case class SimhashAgg(
    child: Expression,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      var j = 0
      while (j < bits) {
        buffer(j) += (if (((l >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < bits) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (buffer(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * bits)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(storage)
    Array.fill(bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashAgg =
    copy(child = newChild)
}

object SimhashAgg {
  /** simhash_agg(v) — aggregate a column of ≤63-bit token-hash longs into
    * the group's SimHash signature. */
  def simhash_agg(v: Column, bits: Int = 60): Column =
    GraftSqlBridge.column(
      SimhashAgg(GraftSqlBridge.expression(v), bits).toAggregateExpression())
}
