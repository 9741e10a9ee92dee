package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.HashAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.optimizer.BuildLeft

/** Scale lint over the ENTIRE declared query surface: no plan may contain
  * an unbounded nested-loop or cartesian join — the two shapes that turn
  * a 100 TB input into |left| x |right| work — except
  *  - the two queries that are all-pairs ON PURPOSE (exact ground-truth
  *    baselines whose scale-safe twins ship alongside), and
  *  - nested-loop joins whose broadcast side is a global (group-less)
  *    aggregate: that side is ≤ 1 row by construction (a scalar like
  *    max/count/total used as a cross-join constant), so the "loop" is a
  *    single pass.
  * New queries are linted automatically the moment they join
  * SparkEntry.queries — a future regression to a quadratic plan fails CI
  * here, not in a 3 a.m. production incident at 1000 executors. */
class ScaleLintSpec extends SparkSpec {

  private val allPairsByDesign = Set(
    "q_join_theta",    // raw band predicate kept as the declared non-equi
                       // op; scale twin: q_join_range_binned (RangeJoinSpec
                       // pins result equality + equi-join-only plan)
    "q_embed_neardup"  // exact O(n²) near-dup ground truth; scale twin:
                       // q_embed_neardup_lsh under the same oracle
  )

  /** Nested-loop joins whose broadcast side is a CONSTANT-bounded set, so
    * the "loop" is a single linear pass over the stream side:
    *  - q_sim_topk: brute-force cosine baseline — corpus x fixed query
    *    set (SURVEY §2.2 declares brute force as the baseline; the scale
    *    paths are q_sim_ivf/q_sim_lsh re-rank stages)
    *  - q_sim_ivf: the two assign steps score every vector against the K
    *    centroids — n x K with K a constant; the candidate join itself is
    *    an equi-join on cell_id (asserted below)
    *  - q_sim_topk_int8: same corpus x fixed-query-set shape as
    *    q_sim_topk, over the int8-quantized representation */
  // (q_kmeans_seed_par needs no exemption: its distance passes fuse the
  // ≤ 1+rounds·l candidates as projection literals — no join at all)
  // (q_semantic_dedup/_seeded need no exemption since r14: the n × K
  // assignment is a stored fingerprint-keyed artifact — the served plan
  // is equi-joins only)
  private val boundedBroadcastByDesign =
    Set("q_sim_topk", "q_sim_ivf", "q_sim_topk_int8", "q_kmeans_step",
      // IVF-PQ routing: the same n × NCells (and queries × NCells)
      // broadcast assignment; the PQ half joins only on (s, j) keys
      "q_sim_ivfpq",
      // residual IVF-PQ: identical routing shape, residual codebooks
      "q_sim_ivfpq_res",
      // two-stage rerank: stage 1 IS q_sim_ivfpq_res's plan (the
      // exempt bounded broadcast shapes above); stage 2 adds only
      // broadcast EQUI-joins on the RerankK·NQueries shortlist
      "q_sim_ivfpq_rerank",
      // binary-quantization ANN: corpus codes × the fixed query-code
      // set (same n × NQueries shape as q_sim_topk, but each probe is
      // one xor+popcount over 8-byte codes); the re-rank stage adds
      // only broadcast equi-joins on the HamShortK·NQueries shortlist
      "q_sim_hamming",
      // hybrid RRF fusion: the vector leg IS q_sim_topk's exempt
      // corpus × fixed-query-set shape (leg-agnostic — swaps to the
      // compressed-index ANN at scale); the fusion itself joins two
      // ≤ NQueries·FuseDepth ranked lists
      "q_hybrid_rrf",
      // production-leg hybrid: the vector leg IS q_sim_ivfpq_res's
      // exempt routing shape; fusion adds only the tiny ranked-list join
      "q_hybrid_rrf_ann",
      // recall metrology: the ground-truth leg IS q_sim_topk's exempt
      // corpus × fixed-EVAL-query-set scan (recall eval runs exact
      // search for a handful of held-out queries by definition); the
      // ANN leg IS q_sim_ivfpq_res's exempt routing shape; the recall
      // join itself sees ≤ NQueries·k rows per side
      "q_ann_recall",
      // agreement metrology: both legs ARE q_sim_ivfpq_res's /
      // q_sim_ivfpq_rerank's exempt shapes; the overlap join sees
      // ≤ NQueries·k rows per side
      "q_rerank_agreement",
      // probe sweep: the ground-truth leg IS q_sim_topk's exempt
      // corpus × fixed-eval-set scan, the ADC leg IS q_sim_ivfpq_res's
      // exempt routing shape, and the output skeleton is an
      // NProbe × NQueries constant cross join (32 rows)
      "q_probe_sweep",
      // index health: steady-state reads the MEMOIZED stored index
      // (equi-joins only), but a cold or cleared cache inlines the
      // index BUILD — q_sim_ivfpq_res's exempt routing shape — into
      // the plan; the exemption makes the lint cache-state-independent
      "q_index_health",
      // MMR re-rank: the shortlist leg IS q_sim_ivfpq_res's exempt
      // probes × NCells routing shape (queries × a constant-bounded
      // centroid set); everything MMR adds is broadcast equi-joins on
      // the NQueries·RerankK shortlist plus one grouped flatMapGroups
      "q_mmr_rerank")

  private def scalarBuild(j: BroadcastNestedLoopJoinExec): Boolean = {
    val build = if (j.buildSide == BuildLeft) j.left else j.right
    def hasGlobalAgg(p: SparkPlan): Boolean = p.find {
      case h: HashAggregateExec => h.groupingExpressions.isEmpty
      // typed/imperative aggregates (udaf buffers) plan as object-hash
      case o: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        o.groupingExpressions.isEmpty
      case s: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
        s.groupingExpressions.isEmpty
      // a reused broadcast is a leaf; look through to the original
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        hasGlobalAgg(r.child)
      case _ => false
    }.isDefined
    hasGlobalAgg(build)
  }

  test("no unbounded nested-loop/cartesian join in any declared query plan") {
    // static plans: AQE's wrapper hides children from collect until
    // execution, and the lint is about the shape Catalyst commits to
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exempt = allPairsByDesign ++ boundedBroadcastByDesign
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) if !exempt(name) =>
          val plan: SparkPlan =
            fn(spark, sf).queryExecution.executedPlan
          val bad = plan.collectWithSubqueries {
            case c: CartesianProductExec                          => c
            case j: BroadcastNestedLoopJoinExec if !scalarBuild(j) => j
          }
          if (bad.nonEmpty)
            Some(s"$name -> ${bad.map(_.nodeName).mkString(", ")}\n" +
              s"--- offending plan (truncated) ---\n" +
              plan.treeString.linesIterator.take(80).mkString("\n"))
          else None
        case _ => None
      }
      assert(offenders.isEmpty,
        s"quadratic join shapes found:\n${offenders.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("no combinatorial plan explosion: every declared query's physical " +
      "plan holds a bounded number of source scans") {
    // The failure mode this guards (caught live in r8): a lazily-built
    // helper whose tiny intermediates feed several broadcast sides
    // re-embeds its whole upstream DAG once per consumer — the
    // pre-optimization BinnedPercentile compiled to 76 parquet scans and
    // 66 broadcast exchanges, ~6 s of pure stage latency independent of
    // data size. Scan count is the cheapest static proxy for that
    // explosion: real queries here touch ≤ a handful of tables a few
    // times; dozens of scans is always a lineage-duplication bug.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val MaxScans = 16
      val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val plan: SparkPlan = fn(spark, sf).queryExecution.executedPlan
        val scans = plan.collectWithSubqueries {
          case s: org.apache.spark.sql.execution.FileSourceScanExec => s
          case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
          case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
        }
        name -> scans.length
      }
      info(s"max scans: ${counts.maxBy(_._2)}")
      val offenders = counts.filter(_._2 > MaxScans)
      assert(offenders.isEmpty,
        s"plan-explosion suspects (> $MaxScans source scans):\n" +
          offenders.map { case (n, c) => s"$n -> $c scans" }.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("ground-truth all-pairs queries fail fast above the size guard") {
    val e = Tables.embeddings(spark, sf)
    // above the ceiling: refuse, and point at the scale twin
    val ex = intercept[IllegalArgumentException] {
      operators.Guard.assertSmall(e, "q_embed_neardup input `embeddings`",
        "q_embed_neardup_lsh", maxRows = 10)
    }
    assert(ex.getMessage.contains("q_embed_neardup_lsh"),
      s"guard message must name the scale twin: ${ex.getMessage}")
    assert(ex.getMessage.contains("O(n^2)"))
    // at or under the ceiling: transparent pass-through
    val n = e.count()
    assert(operators.Guard.assertSmall(e, "x", "y", maxRows = n).count() == n)
  }

  test("the exemption lists are exact: members really use nested loops") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // look through cached index artifacts: a memoized (persisted) index
    // hides its build shapes behind an InMemoryTableScan, so the
    // member's nested loop may live inside the CACHED plan — walk into
    // it, making this test independent of cache state
    def quadraticIn(p: SparkPlan): Seq[SparkPlan] = {
      val direct = p.collectWithSubqueries {
        case c: CartesianProductExec        => c
        case j: BroadcastNestedLoopJoinExec => j
      }
      val cached = p.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
      }.flatMap(s => quadraticIn(s.relation.cachedPlan))
      direct ++ cached
    }
    try {
      (allPairsByDesign ++ boundedBroadcastByDesign).foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan
        assert(quadraticIn(plan).nonEmpty,
          s"$name no longer needs its exemption — remove it")
      }
      // q_sim_ivf's BNLJs must be confined to centroid assignment: the
      // candidate join itself is an equi-join (that's the IVF point)
      val ivf = SparkEntry.queries("q_sim_ivf")(spark, sf)
        .queryExecution.executedPlan
      val equiJoins = ivf.collectWithSubqueries {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(equiJoins.nonEmpty, "q_sim_ivf candidate join lost its equi form")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
