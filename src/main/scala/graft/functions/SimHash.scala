package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash of a token array in ONE pass — the map-only form of the
  * classic fingerprint: per token take the top 60 bits of md5, keep a ±1
  * balance per bit position, sign of each balance becomes the bit.
  *
  * Width is 60 (not 64) because the fingerprint must stay oracle-portable:
  * the shared per-token hash is the first 15 hex chars of md5 — the widest
  * prefix a signed 64-bit BIGINT can parse in both engines (16 chars can
  * overflow DuckDB's `CAST('0x…' AS BIGINT)`). 60 bits still carve into
  * 4 bands × 15 bits = 32,768 keys per band, so LSH bucket population
  * scales with corpus size instead of saturating at the 256 keys a 32-bit
  * / 8-bit-band layout allows — the difference between linear and ~n²/256
  * candidate growth at 100 TB.
  *
  * Bit-identical to the aggregate formulation the DuckDB oracle uses
  * (`CAST('0x'||substr(md5(tok),1,15) AS BIGINT)` per token, balance > 0 ⇔
  * 2*popcount_b > n_tokens), but with a fundamentally better plan: the
  * explode + groupBy formulation shuffles docs x tokens rows into a
  * 60-sum hash aggregate, while this expression is a narrow projection —
  * at corpus scale the difference between a token-count-sized exchange
  * and NO exchange before the banding join.
  *
  * Null semantics: null array → null; null elements are skipped (the
  * exploded twin never produces them from `split`).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimHash60.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash60.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {

  /** Fingerprint width in bits — bounded by the 15-hex-char (60-bit)
    * oracle-portable token hash. */
  val Bits = 60

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(token) — numerically equal to parsing the first
    * 15 hex chars of the digest (what both engines' SQL twin does). */
  private def h60(tok: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(tok)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Shared by interpreted eval and codegen (single static call → stays
    * inside whole-stage codegen). */
  def compute(a: ArrayData): Long = {
    val n = a.numElements()
    val ones = new Array[Int](Bits)
    var total = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = h60(a.getUTF8String(i).getBytes)
        total += 1
        var b = 0
        while (b < Bits) {
          ones(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    // bit b set ⇔ balance > 0 ⇔ 2*ones_b > total
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (2 * ones(b) > total) fp |= (1L << b)
      b += 1
    }
    fp
  }

  /** Column-level one-pass SimHash backed by [[SimHash60]]. */
  def simhash60(tokens: Column): Column =
    ColumnShim.column(SimHash60(ColumnShim.expression(tokens)))
}
