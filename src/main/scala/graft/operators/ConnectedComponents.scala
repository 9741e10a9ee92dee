package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list, via the
  * alternating large-star / small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC'14 — public
  * paper), reimplemented on DataFrames.
  *
  * Why not plain min-label propagation: propagation needs O(diameter)
  * rounds — a 100 TB near-dup graph with chained duplicates can have long
  * paths, and each round is a full shuffle. Star-contraction converges in
  * O(log n) rounds regardless of diameter.
  *
  * Scale shape: every round is a constant number of hash aggregates and
  * equi-joins over the edge list only — nothing ever materializes beyond
  * O(edges), and upstream LSH banding bounds edges at docs × bands, never
  * all-pairs. Lineage is truncated per round, because an iterative
  * DataFrame loop otherwise nests plans exponentially and kills the
  * optimizer long before the data hurts.
  *
  * Truncation is parameterized (`reliable`): the default
  * `localCheckpoint` keeps round state in executor block storage — fast,
  * but lost if an executor dies mid-loop. On a real cluster set a
  * checkpoint dir (`spark.sparkContext.setCheckpointDir(...)`, an HDFS/
  * object-store path) and pass `reliable = true` for fault-tolerant
  * `checkpoint` files — same labels, proven by the spec.
  */
object ConnectedComponents {

  private val MaxRounds = 50

  /** Per-round lineage truncation: reliable `checkpoint` (requires a
    * checkpoint dir on the context) or executor-local `localCheckpoint`. */
  private def truncate(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliable=true needs spark.sparkContext.setCheckpointDir(...)")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)

  /** Star edges `(hi = member, lo = component minimum)` for every
    * non-isolated node that is not its component's minimum. Input edges
    * `(a, b)` are undirected; self-loops and duplicates are tolerated. */
  def stars(edges0: DataFrame, reliable: Boolean = false): DataFrame = {
    var e = truncate(edges0.toDF("a", "b")
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct(), reliable)
    var eCount = e.count()
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      require(rounds <= MaxRounds,
        s"connected components did not converge in $MaxRounds rounds")
      // Large-star: attach each node's strictly-larger neighbors to the
      // minimum of its closed neighborhood.
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy("u")
        .agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // No intermediate distinct: duplicates here stay bounded by |sym|
      // and the round's final distinct dedupes anyway — one less shuffle.
      val ls = sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo"))
      // Small-star: attach each node and its smaller neighbors to the
      // minimum among them. Large-star output is already (hi > lo), so
      // the smaller neighborhood of `hi` is exactly its `lo` set.
      val smins = ls.groupBy("hi").agg(min("lo").as("m"))
      val ss = truncate(ls.join(smins, "hi")
        .where(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(smins.select(col("hi"), col("m").as("lo")))
        .distinct(), reliable)
      // Cheap-first exact convergence: both sides are distinct sets, so
      // equal counts + empty one-direction difference ⇒ set equality.
      // Counts come off the fresh checkpoint (near-free), so non-final
      // rounds never pay the exceptAll join at all.
      val ssCount = ss.count()
      converged = ssCount == eCount && ss.exceptAll(e).isEmpty
      e = ss
      eCount = ssCount
    }
    e
  }

  /** Component label per node: `(id, cluster_id)` where cluster_id is the
    * minimum node id in the component (isolated nodes label themselves).
    * `nodes` must be a single-column frame named `id`; `edges` a
    * two-column frame of undirected endpoints drawn from `nodes`. */
  def labels(nodes: DataFrame, edges: DataFrame,
      reliable: Boolean = false): DataFrame = {
    val st = stars(edges, reliable).select(col("hi").as("id"), col("lo"))
    nodes.select(col("id"))
      .join(st, Seq("id"), "left")
      .select(col("id"), coalesce(col("lo"), col("id")).as("cluster_id"))
  }
}
