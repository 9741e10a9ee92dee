package graft

/** Pins the independent reference checker ([[RefCheck]]) at the official
  * fixture SFs where the DuckDB oracle independently verifies the same
  * queries — so the checker is itself cross-verified against the oracle
  * before it judges the sf10 decade the oracle cannot reach (VERDICT r13
  * item 6). A checker bug would surface here as a mismatch against a
  * query the oracle proves correct.
  */
class RefCheckSpec extends SparkSpec {

  test("LSH near-dup gate: the plain-Scala full-chain reference " +
      "reproduces q_embed_neardup_lsh exactly at the fixture SF") {
    val (ok, stats) = RefCheck.checkNeardupLsh(spark, sf)
    assert(ok, s"reference diverged: $stats")
    // the chain actually pruned: candidates < n^2/2, sketch kept <= candidates
    assert(stats("candidates") < stats("n") * stats("n") / 2)
    assert(stats("sketch_kept") <= stats("candidates"))
    assert(stats("verified") == stats("spark_rows"))
  }

  test("residual IVF-PQ serve: the plain-Scala ADC reference over the " +
      "on-disk artifact reproduces q_sim_ivfpq_res exactly") {
    val (ok, stats) = RefCheck.checkIvfPqRes(spark, sf)
    assert(ok, s"reference diverged: $stats")
    assert(stats("rows") == stats("spark_rows"))
  }

  test("multi-probe LSH ANN: the plain-Scala reference reproduces " +
      "q_sim_lsh exactly at the fixture SF") {
    val (ok, stats) = RefCheck.checkSimLsh(spark, sf)
    assert(ok, s"reference diverged: $stats")
    // multi-probe candidates are a real subset, not all-pairs
    assert(stats("candidates") < stats("n") * RefCheck.NQueries)
    assert(stats("rows") == stats("spark_rows"))
  }

  test("the geometry laws restated in the checker match the engine's") {
    // an independent checker with a DIFFERENT geometry law would compare
    // incomparable pipelines; pin the restatements across the domain
    for (n <- Seq(1L, 100L, 500L, 512L, 513L, 2000L, 20000L, 200000L,
        1000000L, 100000000L)) {
      assert(RefCheck.refNdBits(n) == graft.operators.Similarity.ndBits(n),
        s"ndBits diverged at n=$n")
      assert(RefCheck.refIvfCells(n) == graft.operators.Similarity.ivfCells(n),
        s"ivfCells diverged at n=$n")
    }
    for (b <- 10 to 28)
      assert(RefCheck.refNdBands(b) == graft.operators.Similarity.ndBands(b),
        s"ndBands diverged at b=$b")
  }
}
