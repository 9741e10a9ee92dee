package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}

/** Drain-and-rebuild geometry migration for the streaming LSH near-dup
  * gate (VERDICT r9 #4).
  *
  * A long-lived [[StreamOps.embedNeardupStream]] is pinned at its
  * start-time `(bands, bits)` — state keys are a pure function of the
  * geometry, so it cannot re-key live ([[StateGeometryGuard]] makes a
  * mismatched restart fail loudly), while the batch gate re-keys per run
  * (`Similarity.ndBits`/`ndBands` grow with the corpus). Once the stream
  * has outgrown its frozen family, migrate in three steps:
  *
  *  1. STOP the old stream. Its checkpoint stays frozen at the old
  *     geometry (never edit it in place).
  *  2. [[catchUpPairs]]: the batch gate at the NEW geometry over the
  *     full corpus seen so far, minus everything the old stream already
  *     emitted — the corpus-internal candidates the new family finds
  *     that the old one missed. Deliver these to the consumer once.
  *  3. Resume on a NEW checkpoint with
  *     `embedNeardupStream(..., nBands = ndBands(b'), nBits = b',
  *     seed = corpus)`: the corpus is re-keyed under the new geometry
  *     into the stream's INITIAL STATE (Spark's native
  *     initial-state support — no state-store files are forged), seeds
  *     emit nothing among themselves, and every live arrival pairs
  *     against the full re-keyed corpus exactly as the batch gate
  *     would.
  *
  * Post-migration contract (spec-pinned in GeometryMigrationSpec):
  * `oldPairs ∪ catchUpPairs ∪ newStreamPairs` equals the batch gate at
  * the new geometry over the final corpus, with the three sets pairwise
  * disjoint — zero lost, zero duplicate candidates. (Old-geometry-only
  * pairs the new family no longer finds remain in `oldPairs`; a
  * consumer re-verifying candidates exactly — the gate's contract —
  * is unaffected by the extras.)
  */
object LshMigration {

  /** Step-2 catch-up: candidates of the NEW geometry over the corpus the
    * old stream processed, minus the pairs it already emitted. Both
    * inputs and the result are `(vec_a, vec_b)` with `vec_a < vec_b`
    * (the gate's canonical orientation). */
  def catchUpPairs(corpus: DataFrame, emittedPairs: DataFrame,
      newBits: Int): DataFrame = {
    val target = Similarity.neardupCandidates(
      corpus.select(col("vec_id"), col("embedding")), newBits)
    target.except(
      emittedPairs.select(col("vec_a").cast("long"), col("vec_b").cast("long")))
  }

  /** Step-3 resume: the migrated stream over `vecs` (the live feed) with
    * the processed corpus seeded under the new geometry, on a FRESH
    * checkpoint. Bands follow `Similarity.ndBands(newBits)` so the
    * stream and the batch gate share one family. */
  def resume(vecs: DataFrame, corpus: DataFrame, newBits: Int,
      newCheckpointLocation: String, maxBucket: Int = Int.MaxValue,
      tws: Boolean = false): DataFrame =
    StreamOps.embedNeardupStream(vecs,
      nBands = Similarity.ndBands(newBits), nBits = newBits,
      maxBucket = maxBucket, tws = tws,
      checkpointLocation = newCheckpointLocation,
      seed = corpus.select(col("vec_id"), col("embedding")))
}

/** Centroid-set migration for [[StreamOps.ivfMaintain]] — simpler than
  * the LSH path because the state is an ADDITIVE MONOID: per-cell
  * counts, integer inertia and integer coordinate sums. A stream whose
  * centroid set must change (re-seeded index, grown K) migrates with NO
  * state seeding at all:
  *
  *  1. stop the old stream (its checkpoint stays frozen; the
  *     [[StateGeometryGuard]] `ivf` family rejects an in-place edit);
  *  2. compute the historical stats ONCE by evaluating the same
  *     `ivfMaintain` transform in BATCH mode over the processed corpus
  *     under the NEW centroids (identical assignment arithmetic);
  *  3. start a fresh-checkpoint stream over the live feed under the new
  *     centroids, and serve `combinedStats(historical, live)` — exact
  *     integer addition, so the result is bit-equal to what a stream
  *     that had seen the whole history under the new centroids would
  *     hold (spec-pinned).
  */
object IvfMigration {
  /** Cell-GROWTH of a maintained code table is
    * [[VecIndexView.migrateCellSplit]]: touched-partition re-shard onto
    * a grown seed set, frozen codebooks, untouched cells byte-identical
    * — the cheap path between this stats merge (no re-keying at all)
    * and [[PqMigration]]'s full re-encode (codebook retrain). */

  /** Exact monoid merge of two cell-stat frames (historical ⊕ live). */
  def combinedStats(historical: DataFrame, live: DataFrame): DataFrame =
    historical.unionByName(live)
      .groupBy("cid")
      .agg(sum("n_assigned").as("n_assigned"),
        sum("inertia").as("inertia"),
        sum("s1").as("s1"), sum("s2").as("s2"),
        sum("s3").as("s3"), sum("s4").as("s4"))
}

/** Codebook-upgrade migration for the PQ encode streams
  * ([[StreamOps.pqEncodeStream]] / [[StreamOps.ivfPqEncodeStream]],
  * VERDICT r10 #7). The encoders are STATELESS, but their sink is not:
  * the compressed index a consumer accumulates is ONE code space —
  * bare small ints, meaningful only against the exact codebooks (and,
  * for the residual layout, cells) that produced them. Retraining the
  * quantizer (corpus drift, a grown cell set, a residual upgrade)
  * therefore migrates the INDEX, not stream state:
  *
  *  1. STOP the old encode stream. Its checkpoint carries the old
  *     fingerprint ([[StateGeometryGuard.pq]]/[[StateGeometryGuard
  *     .ivfpq]]); restarting it with the new artifacts fails loudly —
  *     new-space codes appended to an old-space index would silently
  *     corrupt every downstream ADC search, with nothing in the rows
  *     themselves distinguishing the eras.
  *  2. [[reencoded]] / [[reencodedResidual]]: batch re-encode of the
  *     corpus the old stream processed, under the NEW artifacts — the
  *     encoders are pure projections, so the SAME transform evaluates
  *     in batch mode (the [[IvfMigration]] step-2 trick), making the
  *     replacement segment row-identical to what the new stream would
  *     have produced had it seen the history. The consumer swaps its
  *     historical segment for this — an index REBUILD, the discipline
  *     every production ANN service uses for quantizer upgrades
  *     (distributed, embarrassingly parallel, one pass).
  *  3. [[resume]] / [[resumeResidual]]: the live feed only, on a FRESH
  *     checkpoint binding the new fingerprint.
  *
  * Post-migration contract (spec-pinned in GeometryMigrationSpec):
  * `reencoded(historical) ∪ newStreamCodes` equals the batch encoding
  * of the final corpus under the new artifacts, the two legs disjoint
  * by vec_id — zero lost, zero duplicate, zero mixed-space rows. */
object PqMigration {

  /** Step-2 replacement segment `(vec_id, codes)`: the processed corpus
    * re-encoded under the new codebooks, in the stream's own shape. */
  def reencoded(corpus: DataFrame,
      newCodebooks: Seq[(Int, Long, Seq[Long])]): DataFrame =
    StreamOps.pqEncodeStream(corpus, newCodebooks,
      checkpointLocation = StreamOps.EphemeralState)

  /** Step-3 resume: the live feed encoded under the new codebooks on a
    * fresh checkpoint (which binds the new fingerprint). */
  def resume(vecs: DataFrame, newCodebooks: Seq[(Int, Long, Seq[Long])],
      newCheckpointLocation: String): DataFrame =
    StreamOps.pqEncodeStream(vecs, newCodebooks, newCheckpointLocation)

  /** Residual-layout step 2 `(vec_id, cell_id, codes)` — the cell set
    * migrates together with the codebooks (residuals are relative to
    * the cell means, so neither can change alone). */
  def reencodedResidual(corpus: DataFrame,
      newCells: Seq[(Long, Seq[Double], Seq[Long])],
      newCodebooks: Seq[(Int, Long, Seq[Long])]): DataFrame =
    StreamOps.ivfPqEncodeStream(corpus, newCells, newCodebooks,
      checkpointLocation = StreamOps.EphemeralState)

  /** Residual-layout step 3. */
  def resumeResidual(vecs: DataFrame,
      newCells: Seq[(Long, Seq[Double], Seq[Long])],
      newCodebooks: Seq[(Int, Long, Seq[Long])],
      newCheckpointLocation: String): DataFrame =
    StreamOps.ivfPqEncodeStream(vecs, newCells, newCodebooks,
      newCheckpointLocation)
}
