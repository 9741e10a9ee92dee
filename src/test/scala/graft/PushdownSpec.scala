package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Scan-level lints the 100 TB brief calls out explicitly: filters must
  * reach the parquet scan (PushedFilters), projections must prune the
  * read schema (a scan reading 11 columns for a 3-column query is
  * wrong), and the hot path must stay inside whole-stage codegen. */
class PushdownSpec extends SparkSpec {

  private def scans(plan: SparkPlan): Seq[FileSourceScanExec] =
    plan.collectWithSubqueries { case f: FileSourceScanExec => f }

  /** Static (non-AQE) physical plan — AQE's wrapper hides children
    * until execution; the lint is about the shape Catalyst commits to. */
  private def plan(name: String): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("predicate pushdown: the filter query's predicate reaches the parquet scan") {
    val ss = scans(plan("q_filter_pred"))
    assert(ss.nonEmpty)
    assert(ss.exists(_.metadata.get("PushedFilters").exists(_ != "[]")),
      ss.map(_.metadata.get("PushedFilters")).mkString("; "))
  }

  test("column pruning: narrow queries read narrow schemas") {
    // (query, table width upper bound actually needed at the scan)
    val widths = Map(
      "lineitem" -> 11, "orders" -> 6, "documents" -> 5,
      "embeddings" -> 3, "customer" -> 5)
    val expectations = Seq(
      // q_scan_project projects 4 lineitem columns + the filter column
      ("q_scan_project", "lineitem", 5),
      // q_agg_group (TPC-H Q1 shape): 2 keys + 4 measures + date filter
      ("q_agg_group", "lineitem", 7),
      // q_sim_topk needs vec_id + embedding, never label
      ("q_sim_topk", "embeddings", 2),
      // q_lexical_diversity needs doc_id + text only
      ("q_lexical_diversity", "documents", 2),
      // q_join_inner joins orders(2 used) x customer(2 used)
      ("q_join_inner", "orders", 3))
    expectations.foreach { case (q, table, maxCols) =>
      val ss = scans(plan(q)).filter(_.relation.location.rootPaths
        .exists(_.toString.contains(s"$table.parquet")))
      assert(ss.nonEmpty, s"$q: no scan over $table found")
      ss.foreach { s =>
        val n = s.schema.fields.length
        assert(n <= maxCols,
          s"$q reads $n columns of $table (${s.schema.fieldNames.mkString(",")}) — " +
            s"pruning failed (full width ${widths(table)}, expected ≤ $maxCols)")
      }
    }
  }

  test("no declared query scans a table it doesn't reference (plan hygiene)") {
    // every scan in q_agg_global must be lineitem — a stray dimension
    // scan would mean an accidental join left in the plan
    val ss = scans(plan("q_agg_global"))
    assert(ss.nonEmpty)
    assert(ss.forall(_.relation.location.rootPaths
      .exists(_.toString.contains("lineitem.parquet"))))
  }

  test("hot aggregation paths run inside whole-stage codegen") {
    Seq("q_agg_group", "q_filter_pred", "q_join_inner", "q_token_count")
      .foreach { q =>
        val spans = plan(q).collectWithSubqueries {
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
        }
        assert(spans.nonEmpty, s"$q has no codegen span")
      }
  }
}
