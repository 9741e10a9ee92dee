package graft.operators

import org.apache.spark.sql.DataFrame

/** Map-side parallelism floor for HEAVY per-row compute.
  *
  * On a real cluster a corpus is many files/row-groups, so the scan's
  * natural split count covers the executors. On the bench/verify
  * fixtures a whole table is ONE parquet file with ONE row group
  * (53 MB embeddings at the sf10 subset), so Spark plans a single
  * input partition — and every operator whose cost is dominated by
  * per-row COMPUTE before its first exchange (hyperplane families:
  * ~560k FMA/vector at the sf10 geometry; PQ encode: 16 codeword
  * distance evals × 4 subspaces/vector; int8 quantization) runs that
  * compute on ONE core of a 24-thread session. The r14 sf10 audit
  * measured the whole capture at ~330% CPU on 24 threads, with the
  * LSH gate at 384 s and the cold pqvec build over an hour — all of
  * it single-core map work, invisible at official SFs (the same shape
  * is merely milliseconds there) and absent on a many-file cluster
  * layout.
  *
  * [[boost]] repartitions a frame up to the session's default
  * parallelism ONLY when the planned scan has fewer partitions — on a
  * cluster-shaped input (≥ parallelism splits) it is a no-op and adds
  * no exchange; on the single-file fixture it adds one small exchange
  * of the raw rows (53 MB for the sf10 embeddings — amortized hundreds
  * of times over by the per-row compute it parallelizes). Apply it
  * ONLY at entry points whose per-row work dwarfs a row's shuffle
  * cost; a cheap projection behind a shuffle does not qualify (the
  * groupBy redistributes anyway).
  */
object Par {
  /** Bytes of planned input per boosted partition (VERDICT r14 #5 made
    * the floor size-aware; this round makes it CORE-COUNT-INDEPENDENT).
    * The r14→r16 gate was `bytes < 128 KiB × defaultParallelism → no-op`
    * — a PER-CORE threshold, so raising the session's core count RAISED
    * the bar and switched the floor off exactly when parallelism had
    * the most to give: the sf0.1 embeddings (799 KB) boosted to 4 ways
    * under `local[4]` (gate 512 KiB) but ran their O(n²) pair predicate
    * on ONE task under `local[32]` (gate 4 MiB) — measured 0.37 s vs
    * 1.29 s for the same q_embed_neardup. The exchange a boost pays is
    * priced by the INPUT's bytes, not by the core count, so the gate
    * must be too: one partition per ~128 KiB of planned input (below
    * ~256 KiB even the heaviest per-row families — ~560k FMA/vector —
    * finish in less than the exchange's fixed cost), capped at the
    * session parallelism. Tiny fixtures still skip the exchange
    * (target ≤ 1), and cluster-shaped inputs (≥ target planned splits)
    * are still untouched. */
  private val BoostBytesPerPartition = 128L << 10

  /** `df` lifted to `min(plannedBytes / 128 KiB, defaultParallelism)`
    * partitions when the planned input has fewer (single-file
    * fixtures) — the map-side parallelism floor for heavy per-row
    * compute, sized by the input itself so the SAME corpus gets the
    * SAME split count at any session core count (the sf0.1 driver
    * bench runs at both 4 and 24+ cores; a core-dependent gate made
    * those two runs execute different plans).
    * Streaming frames pass through untouched: micro-batch sources pick
    * their own split counts per trigger, and `.rdd` is not defined on
    * an unstarted stream. */
  /** `costFactor` declares how much heavier this producer's per-row
    * compute is than ordinary row handling, for inputs whose BYTES are
    * a poor proxy for their WORK: the media kernels synthesize and
    * parse a whole PNG/WAV/GIF container from an 8-byte doc_id, so
    * their planned stats (~12 B/row after pruning) undercount the work
    * by orders of magnitude and the byte-sized floor splits a 32-core
    * session 4 ways. The factor scales the stats before the floor
    * divides them — declared per call site, next to the kernel whose
    * cost it prices; the parallelism cap still bounds the result, so a
    * large factor can never oversplit. */
  def boost(df: DataFrame, costFactor: Int = 1): DataFrame = {
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target =
      (bytes * costFactor / BoostBytesPerPartition).min(BigInt(p)).toInt
    if (target <= 1) return df
    // rdd.getNumPartitions plans the frame (metadata-only for scans)
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
