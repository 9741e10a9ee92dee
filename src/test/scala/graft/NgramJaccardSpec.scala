package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Pins the three n-gram Jaccard formulations against each other:
  * the prefix-filtered AllPairs join is provably lossless at the
  * threshold (≡ uncapped inverted-index join), and the DECLARED
  * stop-shingle-capped query must both bite on the fixture and
  * degenerate to the uncapped join when the cap is loose. */
class NgramJaccardSpec extends SparkSpec {

  test("ppJoinJaccard equals the uncapped inverted-index join") {
    val naive = TextOps.ngramJaccardCapped(spark, sf, Int.MaxValue)
      .select("doc_a", "doc_b", "jaccard")
    val pp = TextOps.ppJoinJaccard(spark, sf)
      .select("doc_a", "doc_b", "jaccard")
    assert(naive.count() == pp.count())
    assert(pp.exceptAll(naive).isEmpty && naive.exceptAll(pp).isEmpty)
  }

  test("a loose cap changes nothing; the declared cap bites on the fixture") {
    val loose = TextOps.ngramJaccardCapped(spark, sf, Int.MaxValue)
    val capped = TextOps.ngramJaccardCapped(spark, sf, TextOps.NgramStopDf)
    val declared = TextOps.qNgramJaccard.build(spark, sf)
    assert(declared.exceptAll(capped.orderBy("doc_a", "doc_b")).isEmpty)
    // the fixture's max shingle df (7) exceeds the cap (5), so the
    // candidate/index table must actually shrink — the gate exercises
    // the cap, not just its bypass
    val totalShingles = TextOps.ngramKeptShingles(spark, sf, Int.MaxValue).count()
    val keptShingles = TextOps.ngramKeptShingles(spark, sf, TextOps.NgramStopDf).count()
    assert(keptShingles < totalShingles,
      s"stop-shingle cap did not bite: $keptShingles == $totalShingles")
  }

  test("reliable (persist, lineage-kept) index equals the localCheckpoint index") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val fast = TextOps.ngramKeptShinglesFrom(docs, TextOps.NgramStopDf)
      .as[(Long, Long)].collect().toSet
    val safe = TextOps.ngramKeptShinglesFrom(docs, TextOps.NgramStopDf, reliable = true)
    try {
      assert(safe.as[(Long, Long)].collect().toSet == fast)
    } finally
      // drop ONLY this test's persisted projection: with maxDf=MaxValue
      // the helper returns the persisted frame itself, so unpersist hits
      // the exact cache entry. A global spark.catalog.clearCache() here
      // raced the parallel ScaleLintSpec sweep (shared session), nuking
      // the memoized index artifacts mid-plan-build and inlining index
      // BUILD shapes into steady-state query plans.
      TextOps.ngramKeptShinglesFrom(docs, Int.MaxValue, reliable = true)
        .unpersist()
  }

  test("boilerplate shingle floods the uncapped index; the cap drops it whole") {
    import spark.implicits._
    // 30 docs share ONE boilerplate shingle (plus unique filler); two docs
    // are genuine near-dups sharing rare shingles. The capped index must
    // produce no pair from the boilerplate shingle alone but keep the
    // genuine pair.
    val boiler = (0L until 30L).map(i =>
      (i, s"copyright acme corporation u$i v$i w$i x$i y$i z$i"))
    val nearDup = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta iota"))
    val docs = (boiler ++ nearDup).toDF("doc_id", "text")
    docs.createOrReplaceTempView("ngram_cap_fixture")

    def pairs(maxDf: Int) = TextOps.ngramJaccardFrom(docs, maxDf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(5)
    // boilerplate docs share exactly 1 of their 4+4-1=7ish shingles →
    // jaccard < 0.5, so even uncapped they don't REPORT, but the capped
    // index must not even SCORE them: verify via the candidate count
    val candUncapped = TextOps.ngramCandidatesFrom(docs, Int.MaxValue).count()
    val candCapped = TextOps.ngramCandidatesFrom(docs, 5).count()
    assert(candUncapped >= 30L * 29 / 2, s"expected boilerplate flood, got $candUncapped")
    assert(candCapped < 30, s"cap failed to drop the flood: $candCapped candidates")
    assert(capped.contains((100L, 101L)), s"genuine near-dup lost: $capped")
    assert(uncapped.contains((100L, 101L)))
  }
}
