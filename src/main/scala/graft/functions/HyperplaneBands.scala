package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Banded random-hyperplane LSH signature of a float/double vector:
  * `numBands` keys, each packing `bitsPerBand` sign bits of deterministic
  * ±1 hyperplane projections (plane `j`, dim `i` sign = popcount parity of
  * splitmix64(j*64+i+1) — full-avalanche, so planes are uncorrelated; the
  * weaker xorshift generator used by the 16-plane ANN signature produced
  * duplicate planes past ~100 and was measured at 60% candidate rate
  * instead of the ~4% an independent family gives on the same fixture).
  *
  * Two vectors with angle θ agree on one plane w.p. 1-θ/π, hence share a
  * given band w.p. (1-θ/π)^bitsPerBand — banding amplifies the gap between
  * near-duplicates and background pairs. With the default (32 bands × 10
  * bits) the family recalls a cosine-0.85 pair w.p. ≈0.993 and ≈0.9995 at
  * 0.9, while unrelated pairs (cosine ≈ 0) collide w.p. ≈ 32·2⁻¹⁰ ≈ 3%.
  *
  * A custom expression rather than 320 column-level `when(dot > 0,...)`
  * terms: the literal-array formulation is a ~20k-node expression tree that
  * overflows Janino's 64KB method limit and falls back to interpreted
  * evaluation; this compiles to one static call, and the plane signs are
  * materialized once per JVM (executor), not per row.
  *
  * Null semantics: null vector → null signature (standard unary null
  * propagation); null *elements* contribute 0, matching [[DotProduct]].
  */
case class HyperplaneBands(child: Expression, numBands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  require(numBands > 0 && bitsPerBand > 0 && bitsPerBand <= 63,
    s"need numBands>0 and 0<bitsPerBand<=63, got ($numBands, $bitsPerBand)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_hyperplane_bands"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    HyperplaneBands.compute(a.asInstanceOf[ArrayData], isFloat, numBands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneBands.compute(" +
        s"$a, $isFloat, $numBands, $bitsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {

  /** splitmix64 — public-domain full-avalanche mixer (Steele et al.). */
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Sign of plane `j`, dim `i`: ±1 from the popcount parity of the mixed
    * cell index. Parity of a full-avalanche hash is an unbiased bit even
    * if any single output bit had slight structure. */
  private def planeSign(j: Int, i: Int): Double = {
    val h = splitmix64(j.toLong * 64L + i.toLong + 1L)
    if ((java.lang.Long.bitCount(h) & 1) == 0) 1.0 else -1.0
  }

  /** Per-JVM cache of the ±1 plane matrix, keyed by (planes, dim) — each
    * executor materializes a given family once (320×64 doubles = 160 KB),
    * then every row is a pure read. */
  private val signCache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def signs(planes: Int, dim: Int): Array[Double] =
    signCache.computeIfAbsent((planes, dim), { key =>
      val (p, d) = key
      val out = new Array[Double](p * d)
      var j = 0
      while (j < p) {
        var i = 0
        while (i < d) { out(j * d + i) = planeSign(j, i); i += 1 }
        j += 1
      }
      out
    })

  /** Shared by interpreted eval and codegen (single static call → stays
    * inside whole-stage codegen). */
  def compute(a: ArrayData, isFloat: Boolean, bands: Int, bits: Int): ArrayData = {
    val dim = a.numElements()
    val s = signs(bands * bits, dim)
    val keys = new Array[Long](bands)
    var band = 0
    var plane = 0
    while (band < bands) {
      var key = 0L
      var bit = 0
      while (bit < bits) {
        val base = plane * dim
        var acc = 0.0
        var i = 0
        while (i < dim) {
          if (!a.isNullAt(i)) {
            val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
            acc += v * s(base + i)
          }
          i += 1
        }
        key = (key << 1) | (if (acc > 0) 1L else 0L)
        plane += 1
        bit += 1
      }
      keys(band) = key
      band += 1
    }
    new GenericArrayData(keys)
  }

  /** Column-level banded LSH signature backed by [[HyperplaneBands]]. */
  def bandKeys(v: Column, numBands: Int, bitsPerBand: Int): Column =
    ColumnShim.column(HyperplaneBands(ColumnShim.expression(v), numBands, bitsPerBand))
}
