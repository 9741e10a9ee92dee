package graft

import graft.operators.TextOps

/** The prefix-filtered AllPairs join must return exactly the naive
  * inverted-index join's pairs — the prefix filter is provably lossless
  * at the threshold, and this pins it. */
class NgramJaccardSpec extends SparkSpec {

  test("ppJoinJaccard equals the naive q_ngram_jaccard result") {
    val naive = TextOps.qNgramJaccard.build(spark, sf)
      .select("doc_a", "doc_b", "jaccard")
    val pp = TextOps.ppJoinJaccard(spark, sf)
      .select("doc_a", "doc_b", "jaccard")
    assert(naive.count() == pp.count())
    assert(pp.exceptAll(naive).isEmpty && naive.exceptAll(pp).isEmpty)
  }
}
