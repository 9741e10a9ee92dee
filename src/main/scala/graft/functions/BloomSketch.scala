package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bloom filter (Bloom, CACM 1970 — public literature) as a typed,
  * MERGEABLE Spark `Aggregator`: an m-bit set packed into m/64 longs;
  * each item sets k bits (`bit_i = ((h·A_i + B_i) mod P) mod m`), and a
  * membership probe is the AND of those k bits — never a false negative,
  * false-positive rate ≈ (1 − e^(−kn/m))^k.
  *
  * Why this shape at 100 TB: this is the runtime-filter / semi-join-prune
  * primitive — build a constant-size (m/8 bytes) summary of the small
  * side's join keys with one map-side-combined aggregation, broadcast it,
  * and drop probe-side rows BEFORE the shuffle. Partials merge by
  * elementwise OR, so the build never funnels raw keys anywhere.
  *
  * The hash family reuses [[MinHashSig]]'s (A, B, P) coefficients — the
  * one portable family in the codebase, already mirrored by every DuckDB
  * oracle — so the filter's exact bit pattern, and therefore every probe
  * verdict INCLUDING its false positives, is deterministic and
  * hash-matched by the oracle's SQL reformulation (q_bloom_member), not
  * just bounded in expectation.
  *
  * Input is the item's 60-bit md5 hash reduced mod P (the `h60`
  * convention shared with minhash/KMV/CMS).
  */
class BloomSketch(mBits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(mBits >= 64 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(k >= 1 && k <= MinHashSig.A.length,
    s"k must be in [1, ${MinHashSig.A.length}], got $k")

  private val P = MinHashSig.P
  private val words = mBits / 64

  /** Empty sentinel: zero-length partials stay tiny until the first row. */
  override def zero: Array[Long] = Array.empty

  override def reduce(b0: Array[Long], h0: Long): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](words) else b0
    // Defensive reduction: the h60 convention hands us h ∈ [0, P) already
    // (a no-op here), but an un-reduced 60-bit value would overflow h·A(i)
    // into a negative bit position — floorMod makes misuse well-defined
    // instead of an ArrayIndexOutOfBoundsException.
    val h = java.lang.Math.floorMod(h0, P)
    var i = 0
    while (i < k) {
      val pos = (((h * MinHashSig.A(i) + MinHashSig.B(i)) % P) % mBits).toInt
      b(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

  /** The merged bitset (64-bit words, LSB-first within a word), padded if
    * no rows were seen — callers probe it with shiftright/AND. */
  override def finish(b: Array[Long]): Array[Long] =
    if (b.length == 0) new Array[Long](words) else b

  /** Driver-side probe twin of the SQL bit test (used by specs). */
  def mightContain(bits: Array[Long], h0: Long): Boolean = {
    val h = java.lang.Math.floorMod(h0, P) // same defensive reduction as reduce
    var i = 0
    while (i < k) {
      val pos = (((h * MinHashSig.A(i) + MinHashSig.B(i)) % P) % mBits).toInt
      if ((bits(pos >>> 6) >>> (pos & 63) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
