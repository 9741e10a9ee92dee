package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group type-7 percentiles with BOUNDED memory (VERDICT r7
  * item 1): two-level binned narrowing instead of Spark's `percentile`,
  * whose aggregation buffer holds every distinct value of the group and
  * ships it through the shuffle (~21 MB for 6 partial rows at sf0.1; a
  * 100 TB group would OOM the executor — agg buffers cannot spill).
  *
  * The replacement computes the SAME doubles (bit-for-bit — it mirrors
  * `PercentileBase.getPercentile`'s arithmetic, verified against the
  * disassembled Spark 4.1.2 class) from passes whose shuffled state is
  * O(groups × bins), never O(distinct values):
  *
  *   1. stats pass:  per group `n`, `min`, `max`       (O(G) rows)
  *   2. histogram:   count per (group, bin of [mn,mx]) (≤ G×B rows)
  *      → locate the bin holding each needed rank k ∈ {⌊h⌋,⌈h⌉},
  *        h = p·(n−1); a bin whose actual min = max IS the answer
  *   3. re-histogram the candidate bins on their ACTUAL [min,max]
  *      (≤ G×ranks×B rows) — adaptive: each level shrinks a rank's
  *      candidate set ~B×, so two levels bound the final exact step at
  *      n/B² expected (B=2048 ⇒ a 10¹²-row group leaves ~10⁵ values)
  *   4. exact step:  rank the surviving values inside their level-2 bin
  *      with a per-bin sort (spillable, unlike an agg buffer)
  *
  * Each pass is a scan + hash-aggregate with map-side partials; every
  * join against located-rank/candidate-bin sets broadcasts the small
  * side. Degenerate shapes are short-circuited, not sorted: a bin of
  * one repeated value resolves at the histogram (`bmn = bmx`), so a
  * constant-heavy column never funnels into the exact step.
  *
  * Trade priced: 4 scans of a 2-column projection vs 1 scan with an
  * unbounded buffer. At 100 TB the scans are embarrassingly parallel
  * and the buffer is fatal, so the scans win. The sketch-path twin for
  * when one pass matters more than exactness stays `q_quantile_hist`.
  */
object BinnedPercentile {

  /** One row per (group, percentile): `(g, p, value)`; `value` is
    * bit-identical to `expr("percentile(v, p)")` over the same rows.
    * `df` is scanned four times — pass a cheap (scan-backed) frame. */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], bins: Int = 2048): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val vals = df.select(col(groupCol).as("g"),
      col(valueCol).cast("double").as("v")).where(col("v").isNotNull)

    // pass 1 — per-group stats; `n` counts non-null values (what the
    // percentile interpolates over, not COUNT(*))
    val stats = vals.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))

    // needed ranks: h = p·(n−1) as double (PercentileBase order of ops),
    // bounding ranks lo=⌊h⌋ / hi=⌈h⌉
    val ranks = stats
      .select(col("g"), col("n"), explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("h", col("p") * (col("n") - 1).cast("double"))
      .withColumn("lo", floor(col("h")).cast("long"))
      .withColumn("hi", ceil(col("h")).cast("long"))
    // every small side below is renamed to DISJOINT column names and
    // joined by name (never df("col")): the frames share the `vals`
    // lineage, and attribute-id references across a self-join are
    // ambiguous to the analyzer
    val needed = ranks
      .select(col("g").as("ng"), explode(array(col("lo"), col("hi"))).as("nr"))
      .distinct()

    // value → bin index over [lo,hi]; a zero-width range is one bin
    def binOf(v: Column, lo: Column, hi: Column): Column =
      when(hi <= lo, lit(0L)).otherwise(
        least(lit(bins - 1L), floor((v - lo) / (hi - lo) * bins).cast("long")))

    // percentile() keys its value map on boxed doubles (Double.equals =
    // bit compare) sorted in double TOTAL order, so −0.0 and 0.0 are
    // DIFFERENT adjacent keys. SQL comparison calls them equal and
    // Spark normalizes −0.0 in sort keys, so three spots need explicit
    // total-order faithfulness (NaN inputs are unsupported — metric
    // semantics):
    // 1. bit equality for the short-circuits — Spark's shortest-
    //    roundtrip string repr is injective on bit patterns;
    def bitEq(a: Column, b: Column): Column =
      a.cast("string") === b.cast("string")
    // 2. a ±0-splitting tiebreaker for ordering: "-0.0" < "0.0" in
    //    binary string order, and any other SQL-equal tie is between
    //    identical bit patterns (ANSI mode forbids the 1/v trick);
    def zkey(v: Column): Column = v.cast("string")
    // 3. per-bin actual min/max through struct ordering (field 2 breaks
    //    the ±0 tie), so a bin of pure −0.0 short-circuits to −0.0 and
    //    a mixed ±0 bin falls through to the ordered exact step.
    def tmin(v: Column): Column = min(struct(v.as("a"), zkey(v).as("z"))).getField("a")
    def tmax(v: Column): Column = max(struct(v.as("a"), zkey(v).as("z"))).getField("a")

    // pass 2 — level-1 histogram + per-bin ACTUAL value range
    val b1 = vals.join(broadcast(stats), Seq("g"))
      .withColumn("b1", binOf(col("v"), col("mn"), col("mx")))
    val hist1 = b1.groupBy("g", "b1")
      .agg(count(lit(1)).as("c1"), tmin(col("v")).as("bmn1"),
        tmax(col("v")).as("bmx1"))
      .withColumn("cb1", sum("c1").over(
        Window.partitionBy("g").orderBy("b1")) - col("c1"))
    // locate: each rank falls in exactly one bin (cb1 ≤ r < cb1+c1)
    val loc1 = hist1.join(broadcast(needed), col("g") === col("ng") &&
        col("nr") >= col("cb1") && col("nr") < col("cb1") + col("c1"))
      .select(col("g"), col("nr").as("r"), col("b1"),
        (col("nr") - col("cb1")).as("r1"), col("bmn1"), col("bmx1"))
    val done1 = loc1.where(bitEq(col("bmn1"), col("bmx1")))
      .select(col("g"), col("r"), col("bmn1").as("rv"))
    val todo1 = loc1.where(!bitEq(col("bmn1"), col("bmx1")))

    // pass 3 — re-histogram candidate bins on their actual range
    val cand1 = todo1.select("g", "b1", "bmn1", "bmx1").distinct()
    val b2 = b1.join(broadcast(cand1), Seq("g", "b1"))
      .withColumn("b2", binOf(col("v"), col("bmn1"), col("bmx1")))
    val hist2 = b2.groupBy("g", "b1", "b2")
      .agg(count(lit(1)).as("c2"), tmin(col("v")).as("bmn2"),
        tmax(col("v")).as("bmx2"))
      .withColumn("cb2", sum("c2").over(
        Window.partitionBy("g", "b1").orderBy("b2")) - col("c2"))
    val t1k = todo1.select(col("g").as("tg"), col("r").as("tr"),
      col("b1").as("tb1"), col("r1").as("tr1"))
    val loc2 = hist2.join(broadcast(t1k), col("g") === col("tg") &&
        col("b1") === col("tb1") &&
        col("tr1") >= col("cb2") && col("tr1") < col("cb2") + col("c2"))
      .select(col("g"), col("tr").as("r"), col("b1"), col("b2"),
        (col("tr1") - col("cb2")).as("r2"), col("bmn2"), col("bmx2"))
    val done2 = loc2.where(bitEq(col("bmn2"), col("bmx2")))
      .select(col("g"), col("r"), col("bmn2").as("rv"))
    val todo2 = loc2.where(!bitEq(col("bmn2"), col("bmx2")))

    // pass 4 — exact: rank inside the surviving level-2 bins (expected
    // n/B² values per bin; the sort spills instead of OOMing)
    val cand2 = todo2.select("g", "b1", "b2").distinct()
    val fin = b2.join(broadcast(cand2), Seq("g", "b1", "b2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("g", "b1", "b2")
          .orderBy(col("v"), zkey(col("v")))).cast("long") - 1)
    val t2k = todo2.select(col("g").as("tg"), col("r").as("tr"),
      col("b1").as("tb1"), col("b2").as("tb2"), col("r2").as("tr2"))
    val done3 = fin.join(broadcast(t2k), col("g") === col("tg") &&
        col("b1") === col("tb1") && col("b2") === col("tb2") &&
        col("rn") === col("tr2"))
      .select(col("g"), col("tr").as("r"), col("v").as("rv"))

    val rankVals = done1.unionAll(done2).unionAll(done3)

    // interpolate exactly like PercentileBase.getPercentile:
    //   lo == hi           → vlo
    //   vlo == vhi (IEEE)  → vlo   — getPercentile's key short-circuit
    //     goes through BoxesRunTime.equals, which unboxes to IEEE ==,
    //     so adjacent −0.0/0.0 KEYS short-circuit to the LOWER (−0.0);
    //     bins above use bit equality instead because collapsing ±0
    //     there would lose which key actually holds the rank
    //   else (hi − h)·vlo + (h − lo)·vhi
    val lows = rankVals.select(col("g").as("lg"), col("r").as("lr"),
      col("rv").as("vlo"))
    val highs = rankVals.select(col("g").as("hg"), col("r").as("hr"),
      col("rv").as("vhi"))
    ranks
      .join(broadcast(lows), col("g") === col("lg") && col("lo") === col("lr"))
      .join(broadcast(highs), col("g") === col("hg") && col("hi") === col("hr"))
      .select(col("g"), col("p"),
        when(col("lo") === col("hi"), col("vlo"))
          .when(col("vlo") === col("vhi"), col("vlo"))
          .otherwise(
            (col("hi").cast("double") - col("h")) * col("vlo") +
            (col("h") - col("lo").cast("double")) * col("vhi"))
          .as("value"))
  }

  /** Pivot the long form to one column per requested percentile —
    * `p` values are the exact literals `perGroup` exploded, so the
    * equality below is bit-safe. */
  def wide(long: DataFrame, ps: Seq[(Double, String)]): DataFrame =
    long.groupBy("g").agg(
      ps.head match { case (p, name) =>
        max(when(col("p") === p, col("value"))).as(name) },
      ps.tail.map { case (p, name) =>
        max(when(col("p") === p, col("value"))).as(name) }: _*)
}
