package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sliding-window shingle hasher: from a token array, the DISTINCT
  * 16-byte md5 digests of every `n`-token window joined with single
  * spaces — one tight JVM loop per row.
  *
  * This replaces the hottest shared stage of the dedup/decontam family,
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', ...)))`:
  * higher-order functions evaluate their lambda INTERPRETED per element
  * (millions of boxed closure calls per partition at corpus scale) and
  * materialize every window as an intermediate string before a separate
  * md5 pass. Here the digest is computed straight from the token bytes —
  * no window string is ever allocated — and dedup happens in one
  * content-hashed set.
  *
  * SEMANTICS CONTRACT (what keeps the DuckDB oracles valid): the digest
  * equals `md5(concat_ws(' ', window))` byte-for-byte — same UTF-8 bytes,
  * same single-space separator, same concat_ws null-skip — and the
  * digests are only ever EQUALITY KEYS (join/groupBy) or the source of
  * the hex the signature windows slice; no query outputs a raw shingle.
  * Equality classes of digests match equality classes of the oracle's
  * shingle strings, so pair/df/size results are unchanged (md5 collisions
  * are the same accepted risk as every other md5 key in this repo).
  * Windows: positions 0..len−n (len < n → empty array, the upstream
  * size-filter semantics); null input array → null.
  */
case class ShingleMd5s(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "window size must be >= 1")

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_md5s requires array<string>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public: invoked from generated code via a bound reference — the row
    * cost is one virtual call, keeping the stage inside whole-stage
    * codegen while the window loop runs as compiled bytecode. */
  def compute(a: ArrayData): ArrayData = {
    val m = a.numElements()
    if (m < n) return ShingleMd5s.Empty
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      toks(i) = if (a.isNullAt(i)) null else a.getUTF8String(i).getBytes
      i += 1
    }
    val md = ShingleMd5s.digester.get()
    // LinkedHashSet preserves first-occurrence order (matching
    // array_distinct); multiplicity mode (distinct = false, for counting
    // consumers like text_repetition) keeps every window in position order
    val seen = if (distinct) new java.util.LinkedHashSet[ByteBuffer] else null
    val all = if (distinct) null else new Array[Any](m - n + 1)
    i = 0
    while (i + n <= m) {
      md.reset()
      var first = true
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        if (t != null) { // concat_ws skips nulls without doubling the separator
          if (!first) md.update(' '.toByte)
          md.update(t)
          first = false
        }
        j += 1
      }
      val digest = md.digest()
      if (distinct) seen.add(ByteBuffer.wrap(digest)) else all(i) = digest
      i += 1
    }
    if (!distinct) return new GenericArrayData(all)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().array(); k += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleMd5s", this, classOf[ShingleMd5s].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5s =
    copy(child = newChild)
}

object ShingleMd5s {
  private val Empty = new GenericArrayData(Array.empty[Any])

  private val digester: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** shingle_md5s(tokens, n) — md5 digests of the n-token space-joined
    * windows; distinct (first-occurrence order) by default, every window
    * in position order with `distinct = false`. */
  def shingle_md5s(tokens: Column, n: Int, distinct: Boolean = true): Column =
    GraftSqlBridge.column(
      ShingleMd5s(GraftSqlBridge.expression(tokens), n, distinct))
}
