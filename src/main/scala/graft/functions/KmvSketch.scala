package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002 /
  * Beyer et al. SIGMOD'07 — public literature), as a typed, MERGEABLE
  * Spark `Aggregator`: partials combine associatively on the map side, so
  * a 100 TB distinct-count is one narrow shuffle of ≤k doubles per group
  * instead of a COUNT(DISTINCT) expand-and-reshuffle of every value.
  *
  * Input is a hash of the counted value mapped uniformly into [0,1)
  * (callers use the md5-based `h60` convention / 2^60, so the sketch is
  * DETERMINISTIC and engine-portable — the DuckDB oracle reproduces the
  * estimate bit-for-bit via a window formulation, which is what lets
  * q_distinct_kmv hash-match instead of settling for a tolerance check).
  *
  * Estimate: with fewer than k distinct hashes seen, the buffer IS the
  * distinct set — return its size exactly. Otherwise (k-1)/u_(k), the
  * classic unbiased KMV estimator (u_(k) = k-th smallest distinct hash).
  * Relative standard error ≈ 1/sqrt(k-2) (~13% at k=64).
  */
class KmvSketch(k: Int) extends Aggregator[Double, Array[Double], Double] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  /** Buffer: sorted, distinct, at most k smallest hashes seen. */
  override def zero: Array[Double] = Array.empty

  override def reduce(b: Array[Double], u: Double): Array[Double] = {
    val pos = java.util.Arrays.binarySearch(b, u)
    if (pos >= 0) b // duplicate hash — KMV counts distinct values
    else {
      val ins = -pos - 1
      if (ins >= k) b // beyond the current k minima
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Double](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = u
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val bound = math.min(a.length + b.length, k)
    val out = new Array[Double](bound)
    var i = 0; var j = 0; var n = 0
    while (n < bound && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == bound) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Double]): Double =
    if (b.length < k) b.length.toDouble else (k - 1).toDouble / b(k - 1)

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
