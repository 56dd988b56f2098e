package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row MinHash signature: from a document's array of 16-byte
  * md5 shingle digests, the `numHashes` window minima — window `j` is the
  * 4-lowercase-hex slice of digest bytes (2j, 2j+1), and the signature
  * element is the lexicographic minimum of that slice over the array.
  *
  * This turns the dedup family's signature stage from
  * `explode(shingles) → groupBy(doc_id).agg(min(substring(hex(sh),…)))`
  * — a row explosion plus a hash aggregate plus an exchange — into a
  * NARROW MAP: one tight loop per document, zero shuffle. At 100 TB the
  * signature stage becomes embarrassingly parallel scan work, and the
  * only remaining shuffle in the LSH chain is the band-bucket join that
  * genuinely needs co-location.
  *
  * SEMANTICS CONTRACT (what keeps the DuckDB oracle and the groupBy twin
  * bit-identical): lowercase hex digits '0'–'9','a'–'f' are ascending in
  * ASCII, so the lexicographic min of the 4-hex window equals the numeric
  * min of the big-endian u16 built from the same two digest bytes — the
  * loop compares ints and formats the winner once at the end, producing
  * exactly `min(substring(lower(hex(digest)), 4j+1, 4))` over the same
  * digest set ([[graft.operators.TextOps]] `sigOver` is the reference
  * implementation; MinhashSigSpec proves the two frames bit-identical on
  * the real corpus). Empty input array → empty output array (the caller
  * filters, matching the groupBy twin where a shingle-less doc simply has
  * no rows); null input → null.
  */
case class MinhashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 8,
    "numHashes must be in [1,8] (md5 is 16 bytes = 8 2-byte windows)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<binary>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public: invoked from generated code via a bound reference — one
    * virtual call per row keeps the stage inside whole-stage codegen. */
  def compute(a: ArrayData): ArrayData = {
    val m = a.numElements()
    if (m == 0) return MinhashSigs.Empty
    val mins = new Array[Int](numHashes)
    java.util.Arrays.fill(mins, Int.MaxValue)
    var i = 0
    while (i < m) {
      val d = a.getBinary(i)
      var j = 0
      while (j < numHashes) {
        val v = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      val hx = new Array[Byte](4)
      var v = mins(j)
      var k = 3
      while (k >= 0) {
        val nib = v & 0xf
        hx(k) = (if (nib < 10) '0' + nib else 'a' + nib - 10).toByte
        v >>>= 4
        k -= 1
      }
      out(j) = UTF8String.fromBytes(hx)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigs", this, classOf[MinhashSigs].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

object MinhashSigs {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** minhash_sigs(digests, n) — the n 4-hex window minima of an md5
    * digest array, as array<string>; empty in → empty out. */
  def minhash_sigs(digests: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinhashSigs(GraftSqlBridge.expression(digests), numHashes))
}
