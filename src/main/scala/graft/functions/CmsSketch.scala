package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005 —
  * public literature) as a typed, MERGEABLE Spark `Aggregator`: a
  * depth × width grid of counters; each item increments one counter per
  * row (`cell_i = ((h·A_i + B_i) mod P) mod width`), and a point estimate
  * is the MINIMUM of an item's counters — always ≥ the true count, over
  * by at most 2N/width with probability 1 − 2^−depth.
  *
  * Why this shape at 100 TB: partials are fixed-size (depth·width longs)
  * and combine by elementwise addition on the map side, so a global or
  * per-group frequency summary is one narrow shuffle of a constant-size
  * buffer instead of a full token-count aggregation — and the SAME
  * merged buffer answers any later point query. The hash family reuses
  * [[MinHashSig]]'s (A, B, P) coefficients — one portable family in the
  * codebase, already mirrored by every DuckDB oracle — so the sketch is
  * DETERMINISTIC and the estimates hash-match the oracle's SQL
  * reformulation exactly (q_heavy_hitters), not just within tolerance.
  *
  * Input is the item's 60-bit md5 hash reduced mod P (the `h60`
  * convention callers already use for minhash/KMV).
  */
class CmsSketch(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= MinHashSig.A.length,
    s"depth must be in [1, ${MinHashSig.A.length}], got $depth")
  require(width >= 2, s"width must be >= 2, got $width")

  private val P = MinHashSig.P

  /** Empty sentinel: zero-length map-side partials stay tiny until the
    * first row lands. */
  override def zero: Array[Long] = Array.empty

  override def reduce(b0: Array[Long], h: Long): Array[Long] = {
    val b = if (b0.length == 0) new Array[Long](depth * width) else b0
    var i = 0
    while (i < depth) {
      val cell = (((h * MinHashSig.A(i) + MinHashSig.B(i)) % P) % width).toInt
      b(i * width + cell) += 1
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  /** The merged grid itself (row-major), padded if no rows were seen —
    * callers point-query it with `least(element_at(...))`. */
  override def finish(b: Array[Long]): Array[Long] =
    if (b.length == 0) new Array[Long](depth * width) else b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
