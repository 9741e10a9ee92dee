package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float/double array columns.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_), ...)`)
  * allocates an intermediate array per row and, when it appears inside a
  * join condition (BroadcastNestedLoopJoin), is evaluated through the
  * interpreted path per candidate pair — that made the all-pairs
  * `q_embed_neardup` scan ~50µs/pair. This expression compiles to a tight
  * primitive loop inside whole-stage codegen: no allocation, no boxing,
  * ~100ns/pair for 64 dims.
  *
  * Accumulation order is a strict left-to-right fold, identical to the
  * `aggregate` formulation, so swapping implementations is bit-stable.
  *
  * Null semantics: a null array yields null (standard binary-expression
  * null propagation); null *elements* contribute 0, matching how the
  * engine's vectors are produced (never null-elemented in practice).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!(x.isNullAt(i) || y.isNullAt(i))) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, not fixed identifiers: with non-nullable children the
      // generated block lands un-braced at method scope, and two dot
      // products in one stage would redeclare the same locals (Janino
      // error → silent fallback to interpreted evaluation)
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("i")
      val getA =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      val nullGuard =
        if (containsNull(left) || containsNull(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) continue;"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd Hamming distance between two `array<long>` bit sketches:
  * the sum of `bitCount(a_k ^ b_k)` over the packed keys.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b,
  * (x, y) => bit_count(x ^ y)), ...)`) is a CodegenFallback: inside a
  * join condition (the fused near-dup gate puts the sketch filter in
  * the band join) it evaluates interpreted per candidate pair with a
  * zipped intermediate array per row — measured ~53µs/pair, which made
  * the r14 fused gate 10x SLOWER than the two-join shape it replaced
  * (r14 local bench: q_embed_neardup_lsh 0.69s → 7.3s at sf0.1). The
  * same lesson as [[DotProduct]]: this compiles to a tight XOR+popcount
  * loop that stays inside the join's codegen.
  *
  * Null semantics: null array → null (standard binary null
  * propagation). Unlike [[DotProduct]] (which tolerates ragged inputs
  * because arbitrary user vectors flow through it), a sketch is a
  * FIXED-SHAPE engine artifact — 8 non-null packed keys — so a
  * length mismatch or a null slot is corrupt input, and silently
  * truncating to the shorter array (or reading getLong on a null
  * slot) would return a plausible-but-wrong distance that a filter
  * swallows without a trace. This expression throws instead (ADVICE
  * r14): equal lengths are REQUIRED and null elements are rejected,
  * in both the interpreted and generated paths.
  */
case class SketchHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sketch_hamming"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def containsNull(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: sketch lengths differ ($n vs ${y.numElements()})")
    var acc = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i))
        throw new IllegalArgumentException(
          s"$prettyName: null sketch element at slot $i")
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("hamN")
      val acc = ctx.freshName("hamAcc")
      val i = ctx.freshName("i")
      // the length check is unconditional (shape is the contract); the
      // per-slot null check compiles away when the schema already
      // promises containsNull=false — the engine-built sketches' case
      val nullGuard =
        if (containsNull(left) || containsNull(right))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i))
             |  throw new IllegalArgumentException(
             |    "graft_sketch_hamming: null sketch element at slot " + $i);
             |""".stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n)
         |  throw new IllegalArgumentException(
         |    "graft_sketch_hamming: sketch lengths differ (" + $n + " vs " +
         |    $b.numElements() + ")");
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level dot product backed by [[DotProduct]]. */
  def dotp(a: Column, b: Column): Column =
    ColumnShim.column(
      DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column-level sketch Hamming distance backed by [[SketchHamming]]. */
  def sketchHam(a: Column, b: Column): Column =
    ColumnShim.column(
      SketchHamming(ColumnShim.expression(a), ColumnShim.expression(b)))
}
