package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing position selection for the substring-dedup scale
  * path (`DedupOps.dupSpansWinnowed`): per trailing window of `w` gram
  * start positions, select the position whose 8-codepoint gram PREFIX is
  * lexicographically smallest, ties to the RIGHTMOST position (the
  * standard winnowing tie-break; Schleimer/Wilkerson/Aiken, SIGMOD'03).
  * Output: the distinct selected 1-based positions.
  *
  * Replaces the interpreted higher-order-function pipeline (an 18-char
  * key string materialized per position, then `least()` over w shifted
  * `element_at`s — every element a per-row interpreter round trip) with
  * ONE monotonic-deque sliding-window argmin pass per document: O(n)
  * comparisons, no per-position allocation, whole-stage-codegen'd via
  * a single static call. Semantics are pinned EQUAL to the SQL rule by
  * WinnowSpec (including multibyte codepoints and tie runs), so the
  * DuckDB oracle replaying the SQL rule stays valid.
  *
  * Comparison note: the SQL rule compares `substring(text, p, 8)` keys
  * as UTF8 strings (binary collation). Byte order of valid UTF-8 equals
  * codepoint order, and positions count codepoints exactly like SQL
  * `substring` — so the codepoint-array compare here is exact, not
  * ASCII-only.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 8 && w >= 1, s"need k >= 8 (prefix width), w >= 1; got k=$k w=$w")

  // analysis-time rejection of a non-string child — without this, misuse
  // surfaces as a runtime ClassCastException inside eval/codegen
  override def inputTypes = Seq(StringType) // AbstractDataType is private[sql]; inference conforms

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    Winnow.select(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.select($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
  override def prettyName: String = "winnow_select"
}

object Winnow {
  /** Distinct winnow-selected 1-based gram start positions of `text`
    * for gram width `k`, window `w`. Selection runs are contiguous
    * (a deque element, once popped or evicted, never returns), so
    * consecutive-run dedup equals `array_distinct`. */
  def select(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    val nChars = s.length
    // codepoint array: positions must count codepoints, like SQL substring
    val cps = new Array[Int](s.codePointCount(0, nChars))
    var ci = 0; var cj = 0
    while (ci < nChars) {
      val cp = s.codePointAt(ci); cps(cj) = cp; cj += 1
      ci += Character.charCount(cp)
    }
    val n = cj
    val nPos = n - k + 1
    if (nPos <= 0) return new GenericArrayData(Array.empty[Int])
    // compare the 8-codepoint prefixes at 1-based positions a and b
    def cmp(a: Int, b: Int): Int = {
      var i = 0
      while (i < 8) {
        val d = Integer.compare(cps(a - 1 + i), cps(b - 1 + i))
        if (d != 0) return d
        i += 1
      }
      0
    }
    val deque = new Array[Int](nPos)
    var head = 0; var tail = 0
    val out = new Array[Int](nPos)
    var m = 0; var last = -1
    var p = 1
    while (p <= nPos) {
      // rightmost-tie: the newer position wins equals, so pop >= keys
      while (tail > head && cmp(deque(tail - 1), p) >= 0) tail -= 1
      deque(tail) = p; tail += 1
      while (deque(head) < p - w + 1) head += 1
      val sel = deque(head)
      if (sel != last) { out(m) = sel; m += 1; last = sel }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def column(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowSelect(GraftColumnBridge.expression(text), k, w))
}
