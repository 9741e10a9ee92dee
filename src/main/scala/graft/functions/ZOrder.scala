package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Bit-interleaved z-value (Morton code) of two integral columns — the
  * space-filling-curve key behind multi-dimensional data-skipping layout.
  *
  * A table sorted by one column skips row groups only for filters on that
  * column; sorting by `zorder(a, b)` keeps BOTH dimensions locally dense
  * per file, so min/max footer stats prune scans for filters on either
  * (see [[graft.operators.ZOrderLayout]] for the write-side use).
  *
  * Bit i of the left input lands at output bit 2i (low lane), of the
  * right at 2i+1. Inputs are masked to the low `bits` bits, so callers
  * normalize values into [0, 2^bits) first — at 100 TB that's one
  * width-preserving projection (e.g. `pmod(hash, 2^bits)` or a range
  * rescale), not a shuffle. Null inputs propagate to a null z-value.
  * Codegen is a call to the static [[ZOrder.interleave2]] kernel inside
  * whole-stage codegen (same pattern as [[HyperplaneBands]]).
  */
case class ZOrderLong(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits > 0 && bits <= 31,
    s"bits must be in [1, 31] so 2*bits fits a positive long, got $bits")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(c =>
        c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires int/bigint inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _           => v.asInstanceOf[Long]
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave2(asLong(left, a), asLong(right, b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave2($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Interleave the low `bits` bits of x (even lanes) and y (odd lanes).
    * Public + JVM-static so generated code can call it directly. */
  def interleave2(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    val xv = x & mask
    val yv = y & mask
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((xv >>> i) & 1L) << (2 * i)
      z |= ((yv >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Column-level z-value backed by [[ZOrderLong]]. */
  def zorder(bits: Int, a: Column, b: Column): Column =
    ColumnShim.column(
      ZOrderLong(ColumnShim.expression(a), ColumnShim.expression(b), bits))
}
