package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-gram windows of a token array in ONE codegen'd
  * pass — the sliding/strided window builder behind every shingling
  * operator (3-shingles, 5/7-gram decontamination, 8-token spans,
  * fixed-stride chunks).
  *
  * Replaces the `transform(sequence(1, size(l)-(n-1)), i ->
  * concat_ws(' ', element_at(l,i), …)) / array_join(slice(l,i,n), ' ')`
  * formulations: `ArrayTransform` is a CodegenFallback in Spark 4, so
  * every window of every document was built by an INTERPRETED lambda
  * (sequence materialization + per-window element_at/slice/concat
  * expression-tree walks) — the dominant per-row cost of the shingle /
  * contamng / contam7 / bm25-postings builds and the span/chunk
  * queries (the [[LexiconCounts]] / [[SketchHamming]] lesson applied
  * to window building). Here each window is one `UTF8String.concatWs`
  * over an index range, inside whole-stage codegen.
  *
  * Window semantics, pinned to the formulations it replaces:
  *  - windows start at token offsets 0, `stride`, 2·`stride`, …;
  *    `keepPartial = false` keeps only full n-token windows (the
  *    sliding stride-1 callers), `keepPartial = true` keeps the
  *    trailing shorter window too (the fixed-stride chunker:
  *    `slice((i-1)·K+1, K)` truncated at the array end).
  *  - window text = the window's NON-NULL tokens joined by a single
  *    space — exactly `concat_ws(' ', …)` / `array_join(…, ' ')`
  *    null-skipping (split() never produces null tokens; the pin is
  *    for semantic equality, not fixtures).
  *  - fewer than n tokens with `keepPartial = false` → EMPTY array
  *    (every caller guards `size >= n` anyway; the old `sequence(1,
  *    size-(n-1))` would DESCEND below size n and index out of range,
  *    which is why those guards exist — this expression keeps them
  *    meaningful but never needs them for safety).
  *  - null token array → null (standard unary null propagation).
  */
case class WordNgrams(child: Expression, n: Int, stride: Int = 1,
    keepPartial: Boolean = false)
    extends UnaryExpression {

  require(n > 0 && stride > 0, s"need n>0 and stride>0, got ($n, $stride)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    WordNgrams.compute(a.asInstanceOf[ArrayData], n, stride, keepPartial)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordNgrams.compute(" +
        s"$a, $n, $stride, $keepPartial);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {

  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and codegen (single static call → stays
    * inside whole-stage codegen). */
  def compute(a: ArrayData, n: Int, stride: Int,
      keepPartial: Boolean): ArrayData = {
    val len = a.numElements()
    val count =
      if (keepPartial) (len + stride - 1) / stride
      else if (len < n) 0
      else (len - n) / stride + 1
    val out = new Array[AnyRef](count)
    var w = 0
    var start = 0
    while (w < count) {
      val end = math.min(start + n, len)
      val parts = new Array[UTF8String](end - start)
      var i = start
      var j = 0
      while (i < end) {
        // concatWs itself skips null inputs — matching concat_ws /
        // array_join null semantics
        parts(j) = if (a.isNullAt(i)) null else a.getUTF8String(i)
        i += 1
        j += 1
      }
      out(w) = UTF8String.concatWs(Space, parts: _*)
      w += 1
      start += stride
    }
    new GenericArrayData(out)
  }

  /** Column-level sliding full-width n-grams backed by [[WordNgrams]]. */
  def wordNgrams(toks: Column, n: Int): Column =
    ColumnShim.column(WordNgrams(ColumnShim.expression(toks), n))

  /** Column-level strided windows (trailing partial window kept when
    * `keepPartial`) backed by [[WordNgrams]]. */
  def wordNgrams(toks: Column, n: Int, stride: Int,
      keepPartial: Boolean): Column =
    ColumnShim.column(
      WordNgrams(ColumnShim.expression(toks), n, stride, keepPartial))
}
