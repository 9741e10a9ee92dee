package graft

import org.apache.spark.sql.functions._

/** Approximate/sketch operators — the 100 TB substitutes for exact
  * distinct/percentile/membership. Each is bounded against its exact twin
  * (the exact forms are the oracle-checked queries q_agg_distinct /
  * q_percentile). */
class ApproxSpec extends SparkSpec {

  // cache a PROJECTED frame, never the bare relation: a cached bare
  // scan's leaf matches the analyzed plan of EVERY lineitem query in
  // the shared session, so the cache manager substitutes it into
  // concurrently-running suites' plans (it broke PushdownSpec's
  // column-pruning assertions, which need real parquet scans)
  private lazy val li = Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_partkey", "l_extendedprice", "l_returnflag")
    .cache()

  test("approx_percentile lands within rank tolerance of the exact percentile") {
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head.getDouble(0)
    val approx = li.select(expr("approx_percentile(l_extendedprice, 0.5, 10000)"))
      .head.getDouble(0)
    // accuracy 10000 → rank error ≤ n/10000; translate to a value check by
    // rank rather than magnitude
    val n = li.count()
    val rankOfApprox = li.where(col("l_extendedprice") <= approx).count()
    assert(math.abs(rankOfApprox - n / 2.0) <= n / 10000.0 + 1,
      s"approx=$approx exact=$exact rank=$rankOfApprox n=$n")
  }

  test("HLL approx_count_distinct within stated relative error") {
    val exact = li.select(countDistinct("l_partkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct("l_partkey", 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("bloom filter: no false negatives, bounded false positives") {
    val keys = li.select(col("l_orderkey")).distinct()
    val n = keys.count()
    val bloom = keys.stat.bloomFilter("l_orderkey", n, 0.03)
    // every present key hits
    assert(keys.collect().forall(r => bloom.mightContain(r.getLong(0))))
    // absent keys mostly miss (allow generous slack over the 3% target)
    val absentHits = (1 to 2000).count(i => bloom.mightContain(-i.toLong))
    assert(absentHits < 2000 * 0.10, s"fpp too high: $absentHits/2000")
  }

  test("KMV estimate is partition-invariant (mergeable) and within error bound") {
    import graft.functions.KmvSketch
    val kmv = udaf(new KmvSketch(64))
    val hashed = li.select(
      (conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(1.152921504606846976e18)).as("u"),
      col("l_partkey"))
    // merge associativity/commutativity: same estimate at any parallelism
    val ests = Seq(1, 3, 7).map { p =>
      hashed.repartition(p).agg(kmv(col("u"))).head.getDouble(0)
    }
    assert(ests.distinct.size == 1, s"partition-dependent estimates: $ests")
    val exact = li.select(countDistinct("l_partkey")).head.getLong(0)
    // RSE ~ 1/sqrt(k-2) ≈ 13% at k=64; assert a generous 4-sigma band
    assert(math.abs(ests.head - exact) / exact < 0.52,
      s"kmv=${ests.head} exact=$exact")
  }

  test("KMV below k distinct values is exact") {
    import graft.functions.KmvSketch
    val kmv = udaf(new KmvSketch(64))
    val small = li.limit(500).select(
      (conv(substring(md5(col("l_returnflag")), 1, 15), 16, 10)
        .cast("long").cast("double") / lit(1.152921504606846976e18)).as("u"))
    val est = small.agg(kmv(col("u"))).head.getDouble(0)
    assert(est == 3.0, s"3 distinct flags must estimate exactly, got $est")
  }

  test("count-min sketch overestimates but stays within eps * n") {
    val cms = li.stat.countMinSketch(col("l_returnflag"), eps = 0.01,
      confidence = 0.95, seed = 42)
    val exact = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, cnt) =>
      val est = cms.estimateCount(k)
      assert(est >= cnt, s"CMS must never undercount: $k $est < $cnt")
      assert(est <= cnt + 0.01 * n, s"CMS overshoot beyond eps*n for $k")
    }
  }
}
