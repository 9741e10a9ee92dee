package graft.operators

import org.apache.spark.sql.DataFrame

/** Fail-fast input-size guard for the two declared ALL-PAIRS ground-truth
  * queries (`q_join_theta`, `q_embed_neardup`) — VERDICT r5 item 7.
  *
  * Both queries are deliberately O(n²) by their own plans: they exist as
  * exact baselines their scale-safe twins (`q_join_range_binned`,
  * `q_embed_neardup_lsh`) are verified against, and ScaleLintSpec pins
  * them as the only two BNLJ exemptions on the surface. The guard makes
  * "deliberate" enforceable: a 100×-scale user cannot run them by
  * accident — the query fails fast with a pointer to its twin instead of
  * launching an n² join over a corpus.
  *
  * Cost: one `limit(max+1).count()` per guarded input — a LocalLimit scan
  * that stops after max+1 rows, negligible against the join it protects.
  */
object Guard {

  /** Default ceiling: far above every fixture (sf0.1 tops out at ~600 k
    * rows) and far below any table a 1000-executor job would touch. */
  val MaxGroundTruthRows = 1000000L

  /** Return `df` unchanged if it has at most `maxRows` rows; otherwise
    * fail fast, naming the scale-safe twin to use instead. */
  def assertSmall(
      df: DataFrame,
      what: String,
      scaleTwin: String,
      maxRows: Long = MaxGroundTruthRows): DataFrame = {
    val n = df.limit(math.min(maxRows + 1, Int.MaxValue.toLong).toInt).count()
    require(n <= maxRows,
      s"$what has >= $n rows (limit $maxRows): this exact all-pairs " +
        s"ground-truth query is O(n^2) by design and refuses to run at " +
        s"scale - use its scale-safe twin $scaleTwin instead")
    df
  }
}
