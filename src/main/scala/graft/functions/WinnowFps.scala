package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint selector (MOSS, Schleimer et al. 2003):
  * polynomial-hash every k-char gram, slide a window of w consecutive gram
  * hashes, keep each window's minimum — one tight JVM loop per row.
  *
  * Why native: the declarative form
  * (`transform(sequence(...), j -> array_min(slice(grams, j, w)))` over a
  * `transform`-built gram array) is evaluated INTERPRETED, and after
  * projection collapse every `slice(grams, …)` re-inlines the whole gram
  * computation — O(n²·k) boxed lambda calls per document. Here grams are
  * computed once into a primitive long array and the window scan is
  * O(n·w) compiled bytecode.
  *
  * SEMANTICS CONTRACT (what keeps the DuckDB oracle valid): gram hash is
  * the `text_rolling_hash` fold `h := (h·31 + codepoint) mod 1e9+7` over
  * the gram's characters; the window min is taken over
  * `hash · 2²⁰ + pos` (hash < 1e9+7, 0 ≤ pos < 2²⁰ ⇒ fields never
  * collide), so equal-hash ties break to the LEFTMOST gram; selected
  * values are deduplicated preserving first occurrence. Characters are
  * Unicode code points, matching DuckDB `string_split(text, '')` +
  * `ascii(c)` (the corpus is pure ASCII — TESTDATA discipline — where
  * byte, char and code point coincide). Docs shorter than k chars or
  * with fewer than w grams yield an empty array (→ zero rows after
  * explode, same as the oracle's CASE/empty-list branches).
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "gram size and window size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires string, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public: invoked from generated code via a bound reference — the row
    * cost is one virtual call, keeping the stage inside whole-stage
    * codegen while the gram + window loops run as compiled bytecode. */
  def compute(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return WinnowFps.Empty
    val nGrams = n - k + 1
    if (nGrams < w) return WinnowFps.Empty
    val grams = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + cps(i + j)) % 1000000007L; j += 1 }
      grams(i) = acc * 1048576L + i
      i += 1
    }
    // LinkedHashSet preserves first-occurrence order (matching
    // array_distinct / list_distinct consumers that only count and join)
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    var j = 0
    while (j + w <= nGrams) {
      var mn = grams(j)
      var t = 1
      while (t < w) { if (grams(j + t) < mn) mn = grams(j + t); t += 1 }
      seen.add(mn)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFps", this, classOf[WinnowFps].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $ref.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** winnow_fps(text, k, w) — selected winnowing fingerprints as
    * `hash · 2²⁰ + pos` longs, first-occurrence order. */
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFps(GraftSqlBridge.expression(text), k, w))
}
