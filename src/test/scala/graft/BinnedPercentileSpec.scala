package graft

import graft.operators.BinnedPercentile
import org.apache.spark.sql.functions._

/** Pins [[BinnedPercentile]] to Spark's own `percentile` BIT-FOR-BIT —
  * the whole point of the bounded-memory rewrite (VERDICT r7 item 1) is
  * that the declared q_percentile/q_winsorize results must not move by
  * one ULP while the per-group distinct-value buffer disappears from
  * the plan. `java.lang.Double.compare` distinguishes every bit pattern
  * (±0.0, NaN), so equality here is bit equality.
  */
class BinnedPercentileSpec extends SparkSpec {

  // 0.45 lands BOTH bounding ranks inside the 'sign' group's −0.0 run:
  // the correct answer there is −0.0 itself, not just a value that
  // compares equal to it
  private val ps =
    Seq(0.0, 0.01, 0.05, 0.25, 0.45, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0)

  private def compare(df: org.apache.spark.sql.DataFrame, g: String,
      v: String, b1Bits: Int = 16, b2Bits: Int = 12): Unit = {
    val mine = BinnedPercentile.perGroup(df, g, v, ps, b1Bits, b2Bits)
      .collect().map(r => (r.getAs[Any]("g"), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      expr(s"percentile(cast($v as double), $p)").as(s"q$i") }
    val ref = df.where(col(v).isNotNull).groupBy(col(g)).agg(aggs.head, aggs.tail: _*)
      .collect().flatMap { r =>
        ps.zipWithIndex.map { case (p, i) =>
          (r.getAs[Any](0), p) -> r.getDouble(i + 1) } }.toMap
    assert(mine.keySet == ref.keySet,
      s"group/percentile key sets differ: ${mine.keySet.size} vs ${ref.keySet.size}")
    val diffs = ref.collect {
      case (k, want) if java.lang.Double.compare(want, mine(k)) != 0 =>
        s"$k: percentile()=$want binned=${mine(k)}"
    }
    assert(diffs.isEmpty, s"bit mismatches:\n${diffs.mkString("\n")}")
  }

  test("lineitem fixture: every group x 10 percentiles is bit-identical " +
      "to percentile()") {
    compare(Tables.lineitem(spark, sf), "l_returnflag", "l_extendedprice")
  }

  test("degenerate shapes: constant group, singleton, pair, heavy ties, " +
      "sub-ULP-ish clustering — all bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows =
      // constant column: every level-1 bin short-circuits (bmn = bmx)
      Seq.fill(500)(("const", 42.0)) ++
      // singleton and pair groups: n=1 / n=2 interpolation edges
      Seq(("one", 3.14)) ++ Seq(("two", 1.0), ("two", 2.0)) ++
      // 90% ties + 10% spread: ties resolve at histograms, spread at exact
      Seq.fill(900)(("ties", 5.0)) ++ Seq.fill(100)(("ties", rnd.nextDouble() * 10)) ++
      // values clustered in a tiny range far from zero: the level-2
      // re-bin on the ACTUAL bin range must still separate them
      Seq.fill(300)(("tight", 1e15 + rnd.nextDouble())) ++
      // mixed signs incl. -0.0 vs 0.0 (same SQL-equality class)
      Seq.fill(50)(("sign", -0.0)) ++ Seq.fill(50)(("sign", 0.0)) ++
      Seq.tabulate(100)(i => ("sign", (i - 50).toDouble / 7))
    compare(rows.toDF("g0", "v0"), "g0", "v0")
  }

  test("tiny bucket widths force the exact step everywhere and still match " +
      "(stress the rank arithmetic, not the bucket luck)") {
    compare(Tables.lineitem(spark, sf), "l_returnflag", "l_extendedprice",
      b1Bits = 2, b2Bits = 2)
  }

  test("NaN keys collapse and sort above +Inf, like java.lang.Double") {
    // unit: the ordered-bits map, incl. the sign-bit NaN a naive bit
    // transform would send below -Infinity
    import graft.functions.DoubleBits.ordered
    assert(ordered(Double.NaN) ==
      ordered(java.lang.Double.longBitsToDouble(0xfff8000000000000L)))
    assert(ordered(Double.NaN) > ordered(Double.PositiveInfinity))
    assert(ordered(Double.PositiveInfinity) > ordered(Double.MaxValue))
    assert(ordered(Double.NegativeInfinity) < ordered(Double.MinValue))
    // end-to-end: a group with NaNs matches percentile() bit-for-bit
    // (all NaN patterns are ONE key in percentile()'s boxed-Double map,
    // sorted last — Double.compare order)
    import spark.implicits._
    val rows = Seq.tabulate(40)(i => ("nan", i.toDouble)) ++
      Seq.fill(5)(("nan", Double.NaN)) ++
      Seq(("nan", Double.PositiveInfinity), ("nan", Double.NegativeInfinity))
    compare(rows.toDF("g0", "v0"), "g0", "v0")
  }

  test("nulls are ignored exactly like percentile()") {
    import spark.implicits._
    val rows = Seq(("a", Some(1.0)), ("a", None), ("a", Some(2.0)),
      ("a", Some(3.0)), ("b", None), ("b", Some(9.0)))
    compare(rows.toDF("g0", "v0"), "g0", "v0")
  }

  test("release() after materialization frees the pinned " +
      "intermediates without any recompute cascade (ADVICE r8) — " +
      "3 pins on the direct path, 4 on the forced narrowing path") {
    import spark.implicits._
    val sc = spark.sparkContext
    // (expected pins, forced threshold): default threshold → direct
    // path (hist1, ranks, rankVals); threshold 0 → every candidate
    // bucket "too big" → the 3-scan narrowing (adds hist2)
    for ((expectPins, thr) <- Seq((3, 1L << 22), (4, 0L))) {
      val cachedBefore = sc.getPersistentRDDs.size
      val df = Seq.tabulate(200)(i => (s"g${i % 4}", i.toDouble))
        .toDF("g0", "v0")
      val res = graft.operators.BinnedPercentile
        .perGroup(df, "g0", "v0", Seq(0.25, 0.5, 0.9),
          exactDirectMaxBucketRows = thr)
      // construction pins eagerly
      assert(sc.getPersistentRDDs.size >= cachedBefore + expectPins,
        s"expected $expectPins new cache entries, have " +
          s"${sc.getPersistentRDDs.size - cachedBefore}")
      val got = res.collect() // the owning query materializes
      assert(got.length == 4 * 3)

      // release must unpersist WITHOUT running jobs (reverse dependency
      // order means the CacheManager never re-caches a dependent) — a
      // recompute cascade here would show up as job starts
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val counter = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      sc.addSparkListener(counter)
      try {
        assert(graft.operators.BinnedPercentile.release(res) == expectPins)
        // idempotent: a second release finds nothing
        assert(graft.operators.BinnedPercentile.release(res) == 0)
        org.apache.spark.sql.graft.ListenerBus.drain(sc)
        assert(jobs.get() == 0, s"release ran ${jobs.get()} Spark jobs")
      } finally sc.removeSparkListener(counter)
      assert(sc.getPersistentRDDs.size == cachedBefore,
        s"cache entries leaked: ${sc.getPersistentRDDs.size} vs $cachedBefore")
    }
  }

  test("adaptive level-2 skip (r18): the direct exact path and the " +
      "forced 3-scan narrowing produce bit-identical values") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(3000)(i =>
      (s"g${i % 3}", rnd.nextDouble() * 1e6 - 5e5)) ++
      Seq.fill(200)(("g0", 7.25)) // ties straddling rank boundaries
    val df = rows.toDF("g0", "v0")
    def vals(thr: Long) = graft.operators.BinnedPercentile
      .perGroup(df, "g0", "v0", ps, exactDirectMaxBucketRows = thr)
      .collect().map(r => (r.getAs[Any]("g"), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val direct = vals(1L << 22) // every bucket under the budget → direct
    val narrow = vals(0L)       // forced 3-scan narrowing
    assert(direct.keySet == narrow.keySet)
    val diffs = narrow.collect {
      case (k, want) if java.lang.Double.compare(want, direct(k)) != 0 =>
        s"$k: narrowing=$want direct=${direct(k)}"
    }
    assert(diffs.isEmpty, s"paths diverge:\n${diffs.mkString("\n")}")
  }
}
