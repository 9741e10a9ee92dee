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
  * ±1 (Rademacher) hyperplane projections. Plane `j`, dim `i` sign is the
  * PARITY OF THE PORTABLE 60-BIT MD5 HASH of the string `"hp:j:i"` — the
  * same md5-hex-prefix family (`h60`) every DuckDB oracle in the codebase
  * mirrors, which is what makes the LSH queries FULLY oracle-matchable
  * (VERDICT r5 item 2): the oracle rebuilds the identical plane matrix in
  * SQL and reproduces band keys, candidates and re-rank bit-for-bit.
  * (Earlier rounds used splitmix64 parity — statistically equivalent, but
  * 64-bit wrapping arithmetic is not expressible in DuckDB SQL, which
  * kept these queries `no_oracle`. A still-earlier xorshift family
  * produced duplicate planes past ~100 and a 60% candidate rate.)
  *
  * Two vectors with angle θ agree on one plane w.p. 1-θ/π, hence share a
  * given band w.p. (1-θ/π)^bitsPerBand — banding amplifies the gap between
  * near-duplicates and background pairs. With the near-dup gate's family
  * (64 bands × 10 bits) a cosine-0.85 pair is recalled w.p. ≈0.99995 and
  * a 0.9 pair essentially always, while unrelated pairs (cosine ≈ 0)
  * collide w.p. ≈ 64·2⁻¹⁰ ≈ 6%.
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
case class HyperplaneBands(child: Expression, numBands: Int, bitsPerBand: Int,
    salt: String = "hp")
    extends UnaryExpression {

  require(numBands > 0 && bitsPerBand > 0 && bitsPerBand <= 63,
    s"need numBands>0 and 0<bitsPerBand<=63, got ($numBands, $bitsPerBand)")
  require(salt.matches("[A-Za-z0-9_-]+"),
    s"salt must be a simple identifier, got '$salt'")

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
    HyperplaneBands.compute(a.asInstanceOf[ArrayData], isFloat, numBands,
      bitsPerBand, salt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HyperplaneBands.compute(" +
        s"$a, $isFloat, $numBands, $bitsPerBand, \"$salt\");")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBands {

  /** Sign of plane `j`, dim `i` (0-based): ±1 from the parity of the
    * portable 60-bit md5 hash of `"hp:j:i"` — numerically equal to DuckDB's
    * `CAST(('0x'||substr(md5('hp:'||j||':'||i),1,15)) AS BIGINT) % 2`
    * (+1 when odd, −1 when even). md5 avalanches fully, so the low bit of
    * the 60-bit prefix is unbiased and planes are uncorrelated. */
  def planeSign(j: Int, i: Int): Double = planeSign(j, i, "hp")

  /** [[planeSign]] under an explicit salt — an INDEPENDENT md5-parity
    * family per salt (the near-dup gate's verify pre-filter uses a
    * second family, salt "nds", uncorrelated with the band planes). */
  def planeSign(j: Int, i: Int, salt: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s"$salt:$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = digest.map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    if (h % 2 == 1) 1.0 else -1.0
  }

  /** Per-JVM cache of the ±1 plane matrix, keyed by (planes, dim) — each
    * executor materializes a given family once (320×64 doubles = 160 KB),
    * then every row is a pure read. */
  private val signCache =
    new ConcurrentHashMap[(Int, Int, String), Array[Double]]()

  private def signs(planes: Int, dim: Int, salt: String): Array[Double] =
    signCache.computeIfAbsent((planes, dim, salt), { key =>
      val (p, d, slt) = key
      val out = new Array[Double](p * d)
      var j = 0
      while (j < p) {
        var i = 0
        while (i < d) { out(j * d + i) = planeSign(j, i, slt); i += 1 }
        j += 1
      }
      out
    })

  /** Shared by interpreted eval and codegen (single static call → stays
    * inside whole-stage codegen). */
  def compute(a: ArrayData, isFloat: Boolean, bands: Int,
      bits: Int): ArrayData = compute(a, isFloat, bands, bits, "hp")

  def compute(a: ArrayData, isFloat: Boolean, bands: Int, bits: Int,
      salt: String): ArrayData = {
    val dim = a.numElements()
    val s = signs(bands * bits, dim, salt)
    // Hoist the element reads out of the plane loop: the near-dup gate's
    // sf10 family is ndBands(21)·21 ≈ 8.7k planes, so the old
    // planes×dim inner loop paid an ArrayData virtual dispatch
    // (isNullAt + getFloat/getDouble on an Unsafe row slice) per FMA —
    // ~560k dispatches per vector where only `dim` (64) reads of the
    // input exist. One primitive copy per row turns the hot loop into
    // pure double[]×double[] arithmetic. Null elements contribute
    // exactly as before: the old code skipped them (acc unchanged); the
    // copy stores 0.0, and acc += 0.0·(±1) = ±0.0 leaves every partial
    // sum bit-identical except a ±0.0 sign that `acc > 0` cannot see —
    // the emitted keys are unchanged, so the DuckDB plane-family match
    // ([[planeSign]] parity) is untouched.
    val v = new Array[Double](dim)
    var e = 0
    while (e < dim) {
      v(e) =
        if (a.isNullAt(e)) 0.0
        else if (isFloat) a.getFloat(e).toDouble else a.getDouble(e)
      e += 1
    }
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
          acc += v(i) * s(base + i)
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

  /** [[bandKeys]] under an explicit salt (independent plane family). */
  def bandKeys(v: Column, numBands: Int, bitsPerBand: Int,
      salt: String): Column =
    ColumnShim.column(
      HyperplaneBands(ColumnShim.expression(v), numBands, bitsPerBand, salt))
}
