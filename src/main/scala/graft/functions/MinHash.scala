package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-element MinHash signature of a token array's word 3-shingles in ONE
  * pass — the map-only form of the shingle → hash → 16-permutation-min
  * pipeline. Mirrors the SQL formulation hash-for-hash (shingle =
  * `concat_ws(' ', t[i], t[i+1], t[i+2])`, h = md5-hex-prefix-60-bit % P,
  * perm j = (h*A(j)+B(j)) % P, min per perm), so the DuckDB oracle of
  * `q_minhash_dedup` is unchanged; duplicates of a shingle cannot change
  * a minimum, so skipping the SQL's `list_distinct` is value-neutral.
  *
  * Plan consequence: the explode + groupBy(16 mins) formulation shuffles
  * docs x shingles rows; this expression is a narrow projection — no
  * exchange before the LSH banding join.
  *
  * Null semantics: null array → null; fewer than 3 tokens → empty
  * signature array (caller filters, like the exploded twin's
  * `len >= 3` guard); null tokens are skipped as shingle anchors.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    MinHashSig.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashSig.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {

  /** The published permutation family of q_minhash_dedup — shared with
    * the SQL oracle (TextOps mirrors these into the DuckDB text). */
  val P: Long = 1000000007L
  val A: Array[Long] = Array(387420489L, 472882027L, 268435399L, 179424673L,
    198491317L, 295075147L, 373587883L, 413158511L, 533000389L, 613651349L,
    694847533L, 756065159L, 817504243L, 882377563L, 920419813L, 982451653L)
  val B: Array[Long] = Array(15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L, 160481183L, 179424673L,
    198491317L, 217645177L, 236887691L, 256203161L, 275604541L, 295075147L)
  val NumHashes: Int = 16
  val ShingleWidth: Int = 3

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(shingle) mod P — numerically equal to
    * `CAST('0x'||substr(md5(sh),1,15) AS BIGINT) % P` (TextOps.h60Sql). */
  private def h60(shingle: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(shingle)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) >> 4) & 0xfL)
    h % P
  }

  /** Shared by interpreted eval and codegen. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < ShingleWidth) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val space = ' '.toByte
    var i = 0
    while (i <= n - ShingleWidth) {
      var ok = true
      var len = ShingleWidth - 1 // separators
      var w = 0
      while (w < ShingleWidth) {
        if (a.isNullAt(i + w)) ok = false else len += a.getUTF8String(i + w).numBytes()
        w += 1
      }
      if (ok) {
        val buf = new Array[Byte](len)
        var pos = 0
        w = 0
        while (w < ShingleWidth) {
          if (w > 0) { buf(pos) = space; pos += 1 }
          val s = a.getUTF8String(i + w)
          s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += s.numBytes()
          w += 1
        }
        val h = h60(buf)
        var j = 0
        while (j < NumHashes) {
          val v = (h * A(j) + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column-level one-pass MinHash signature backed by [[MinHashSig]]. */
  def minhashSig(tokens: Column): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(tokens)))
}
