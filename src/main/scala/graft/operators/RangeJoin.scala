package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: the scale-safe plan for point-in-interval (and
  * band/theta) joins.
  *
  * Spark plans a raw `l.v BETWEEN r.lo AND r.hi` predicate as a broadcast
  * nested-loop or cartesian join — O(|points| x |intervals|) comparisons,
  * the classic 100 TB cliff. Binning restores an equi-join: quantize the
  * value axis into fixed-width bins, explode each interval to the bins it
  * touches, tag each point with its single bin, hash-join on the bin id,
  * then re-apply the exact predicate. A point lies in exactly one bin, so
  * no pair is emitted twice and no dedup pass is needed.
  *
  * Cost model: shuffle volume is |points| + |intervals| x (span/binWidth
  * + 1) instead of the nested-loop's |points| x |intervals| compares —
  * pick binWidth near the median interval span so each interval explodes
  * to ~2 bins. Skewed bins (a hot value range) are ordinary equi-join
  * skew, handled by AQE skew-join splitting; the nested-loop plan has no
  * such escape hatch.
  */
object RangeJoin {

  /** Rows of `points` paired with rows of `intervals` whose
    * `[lo, hi]` (inclusive, integral) contains `v`.
    *
    * Preconditions: `v`, `lo`, `hi` are integral (cast to LONG inside);
    * empty intervals (lo > hi) match nothing and are dropped before the
    * explode — Spark's `sequence(a, b)` would otherwise count DOWN.
    */
  def pointInInterval(
      points: DataFrame,
      v: Column,
      intervals: DataFrame,
      lo: Column,
      hi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    // floorDiv in exact long arithmetic: `/` on longs goes through double
    // (loses bin edges past 2^53 — epoch-ns values), and integral `div`
    // truncates toward zero (folds bins -1 and 0). Subtracting pmod first
    // makes the dividend exactly divisible, so truncation == floor.
    def bin(c: Column) = {
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, w), w)
    }
    val p = points.withColumn("__bin", bin(v))
    val i = intervals
      .where(lo.cast("long") <= hi.cast("long"))
      .withColumn("__bins", sequence(bin(lo), bin(hi)))
      .withColumn("__bin", explode(col("__bins")))
      .drop("__bins")
    p.join(i, Seq("__bin"))
      .where(v.cast("long").between(lo.cast("long"), hi.cast("long")))
      .drop("__bin")
  }

  /** Rows of `left` paired with rows of `right` whose inclusive integral
    * intervals overlap (`lhi >= rlo AND rhi >= llo`).
    *
    * Both sides explode to the bins they touch and hash-join on the bin
    * id. A pair of overlapping intervals can share SEVERAL bins; emitting
    * in only the FIRST bin both intervals occupy — `greatest(bin(llo),
    * bin(rlo))`, a codegen'd comparison — keeps the join duplicate-free
    * without a distinct shuffle. Column name sets must be disjoint.
    */
  def intervalOverlap(
      left: DataFrame,
      llo: Column, lhi: Column,
      right: DataFrame,
      rlo: Column, rhi: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val w = lit(binWidth)
    def bin(c: Column) = {
      val cl = c.cast("long")
      call_function("div", cl - pmod(cl, w), w)
    }
    def explodeBins(df: DataFrame, lo: Column, hi: Column): DataFrame = df
      .where(lo.cast("long") <= hi.cast("long"))
      .withColumn("__bin", explode(sequence(bin(lo), bin(hi))))
    val l = explodeBins(left, llo, lhi)
    val r = explodeBins(right, rlo, rhi)
    l.join(r, Seq("__bin"))
      .where(lhi.cast("long") >= rlo.cast("long") &&
        rhi.cast("long") >= llo.cast("long"))
      .where(col("__bin") === greatest(bin(llo), bin(rlo)))
      .drop("__bin")
  }
}
