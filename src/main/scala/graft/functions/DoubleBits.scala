package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Total-order-preserving IEEE-754 bit image of a double as a signed
  * long: `a < b` in double TOTAL order (−∞ < … < −0.0 < 0.0 < … < +∞,
  * NaN above +∞ — `java.lang.Double.compare` order) iff
  * `ordered(a) < ordered(b)` as signed longs, and the map is INJECTIVE
  * on non-NaN bit patterns, so −0.0 and 0.0 stay distinct keys. All
  * NaN bit patterns (including sign-bit NaNs, which a naive bit
  * transform would send BELOW −∞) collapse to one key above +∞ —
  * exactly `java.lang.Double`'s semantics, where `equals` canonicalizes
  * every NaN to the same bits and `compare` sorts them all above +∞.
  *
  * This is the key that makes value-independent range narrowing
  * possible ([[graft.operators.BinnedPercentile]]): the top bits of the
  * image are a monotone bucketing of the double line needing no
  * min/max pre-pass, no data-dependent bin width, and no ±0/string
  * tiebreak hacks — one codegen'd bit twiddle inside whole-stage
  * codegen.
  */
case class DoubleOrderedBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_double_ordered_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    DoubleBits.ordered(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DoubleBits.ordered($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoubleBits {
  /** Positive doubles keep their bits (non-negative longs, ascending);
    * negatives map to `-1 - magnitudeBits` (negative longs, ascending
    * from −∞ to −0.0 → −1); every NaN maps to the canonical NaN bits
    * (0x7ff8000000000000 > the +∞ image). Public + JVM-static for
    * generated code. */
  def ordered(d: Double): Long = {
    if (d != d) return 0x7ff8000000000000L // any NaN → the canonical key
    val b = java.lang.Double.doubleToRawLongBits(d)
    if (b >= 0) b else ~(b & Long.MaxValue)
  }

  /** Column form of [[DoubleOrderedBits]]. */
  def orderedBits(c: Column): Column =
    ColumnShim.column(DoubleOrderedBits(ColumnShim.expression(c)))
}
