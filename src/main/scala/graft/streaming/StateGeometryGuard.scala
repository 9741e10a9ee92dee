package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Restart-time guard for streaming operators whose STATE LAYOUT is a
  * pure function of construction parameters.
  *
  * Several stateful ops freeze their geometry into the checkpoint the
  * moment the first micro-batch commits:
  *
  *  - [[StreamOps.neardupStream]] / [[StreamOps.embedNeardupStream]]:
  *    state keyed by `(band, key)` — bands × bits hyperplanes or the
  *    MinHash band layout;
  *  - [[StreamOps.bloomFilterStream]]: the aggregation buffer is an
  *    `mBits`-bit OR-monoid with `k` probe positions per value;
  *  - [[StreamOps.chunkDedupStream]]: state keyed by `chunkTokens`-gram
  *    rolling hashes;
  *  - [[StreamOps.semanticDedupStream]]: state partitioned by the
  *    centroid set, verdicts thresholded at `tau` under `maxCell`.
  *
  * Resuming the same checkpoint with different parameters does not
  * fail: the new keys/probe positions simply never line up with the old
  * state — pre-restart members silently stop participating (missed
  * duplicates, wrong membership), which is strictly worse than a crash.
  * (The batch twins re-key freely — `Similarity.ndBits` grows LSH bits
  * with the corpus — precisely because they have no persistent state.)
  *
  * `bind(checkpoint, family)` turns that into a loud restart-time
  * error: the first bind persists the geometry fingerprint under the
  * checkpoint root; every later bind re-reads and compares. Call it at
  * query-build time (the ops do it when given `checkpointLocation`),
  * right before `writeStream.start()`, with the same location. Changing
  * geometry legitimately = a NEW checkpoint plus a batch backfill of
  * the state from the re-keyed corpus, never an in-place edit.
  */
object StateGeometryGuard {

  /** One frozen state geometry: `kind` names the key/buffer function,
    * the named longs pin it. Doubles ride as IEEE-754 bit images so the
    * fingerprint is exact (no decimal rendering ambiguity). */
  final case class Family(kind: String, params: Seq[(String, Long)]) {
    def render: String =
      params.map { case (n, v) => s""""$n":$v""" }
        .mkString(s"""{"kind":"$kind",""", ",", "}")
  }

  /** The fixed family of [[StreamOps.neardupStream]] (4 bands × 4 rows
    * of the 16-slot MinHash signature). */
  def minhash(maxBucket: Int): Family =
    Family("minhash-4x4",
      Seq("bands" -> 4L, "bits" -> 4L, "maxBucket" -> maxBucket.toLong))

  /** The hyperplane family of [[StreamOps.embedNeardupStream]]. */
  def hyperplane(bands: Int, bits: Int, maxBucket: Int): Family =
    Family("hyperplane", Seq("bands" -> bands.toLong, "bits" -> bits.toLong,
      "maxBucket" -> maxBucket.toLong))

  /** The bitset geometry of [[StreamOps.bloomFilterStream]]. */
  def bloom(mBits: Int, k: Int): Family =
    Family("bloom", Seq("mBits" -> mBits.toLong, "k" -> k.toLong))

  /** The chunk-hash family of [[StreamOps.chunkDedupStream]]. */
  def chunks(chunkTokens: Int): Family =
    Family("chunk-dedup", Seq("chunkTokens" -> chunkTokens.toLong))

  /** Order-insensitive content hash of a centroid set. */
  private def centroidHash(centroids: Seq[(Long, Seq[Long], Long)]): Long =
    centroids
      .map { case (cid, cv, cn2) =>
        scala.util.hashing.MurmurHash3.orderedHash(cid +: cn2 +: cv)
      }
      .sorted.foldLeft(0L)((acc, h) => acc * 1000003L + h)

  /** The cell partitioning of [[StreamOps.semanticDedupStream]]: the
    * centroid set rides as an order-insensitive content hash. */
  def semantic(centroids: Seq[(Long, Seq[Long], Long)], tau: Double,
      maxCell: Int): Family =
    Family("semantic-dedup", Seq("centroids" -> centroidHash(centroids),
      "tauBits" -> java.lang.Double.doubleToLongBits(tau),
      "maxCell" -> maxCell.toLong))

  /** The cell statistics of [[StreamOps.ivfMaintain]] — running sums
    * are only meaningful against the centroid set they were assigned
    * under. */
  def ivf(centroids: Seq[(Long, Seq[Long], Long)]): Family =
    Family("ivf-maintain", Seq("centroids" -> centroidHash(centroids)))

  /** Order-insensitive content hash of a trained PQ codebook set
    * `(subspace, codeword id, fixed-point coords)`. */
  private def codebookHash(cb: Seq[(Int, Long, Seq[Long])]): Long =
    cb.map { case (s, j, cv) =>
        scala.util.hashing.MurmurHash3.orderedHash(s.toLong +: j +: cv)
      }
      .sorted.foldLeft(0L)((acc, h) => acc * 1000003L + h)

  /** Order-insensitive content hash of an IVF-PQ cell set `(cell_id,
    * routing centroid as doubles, fixed-point mean centroid)` — doubles
    * ride as IEEE-754 bit images, like [[semantic]]'s tau. */
  private def cellHash(cells: Seq[(Long, Seq[Double], Seq[Long])]): Long =
    cells.map { case (cid, ctr, ctrm) =>
        scala.util.hashing.MurmurHash3.orderedHash(
          cid +: (ctr.map(java.lang.Double.doubleToLongBits) ++ ctrm))
      }
      .sorted.foldLeft(0L)((acc, h) => acc * 1000003L + h)

  /** The codebook fingerprint of [[StreamOps.pqEncodeStream]] /
    * [[StreamOps.pqSearchStream]]. The encoder is STATELESS, but its
    * SINK is not: codes are bare small ints, meaningful only against
    * the codebooks that produced them — a resume with retrained
    * codebooks would silently append a second code space to the same
    * index (and a search leaderboard would merge scores from two
    * incomparable quantizers). Codebook upgrades go through
    * [[PqMigration]]: re-encode + fresh checkpoint, never in place. */
  def pq(codebooks: Seq[(Int, Long, Seq[Long])]): Family =
    Family("pq-codebook", Seq("codebooks" -> codebookHash(codebooks)))

  /** The cell + residual-codebook fingerprint of
    * [[StreamOps.ivfPqEncodeStream]] / [[StreamOps.ivfPqSearchStream]]
    * — residual codes additionally depend on WHICH mean centroid was
    * subtracted, so the cell set is part of the code space. */
  def ivfpq(cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])]): Family =
    Family("ivfpq-codebook", Seq(
      "cells" -> cellHash(cells),
      "codebooks" -> codebookHash(codebooks)))

  /** The corpus-era fingerprint of [[StreamOps.bm25SearchStream]]: BM25
    * scores are parameterized by the indexed corpus's (N, T) stats and
    * the df-cap — a leaderboard accumulated under one index era is not
    * comparable with scores computed against a re-indexed corpus, so a
    * resume across an index rebuild must fail loudly (fresh checkpoint
    * + re-serve, the [[PqMigration]] discipline). */
  def bm25(n: Long, t: Long, dfCap: Long): Family =
    Family("bm25-index", Seq("n" -> n, "t" -> t, "dfCap" -> dfCap))

  /** The combined fingerprint of [[StreamOps.hybridSearchStream]]: the
    * fused leaderboard depends on BOTH index eras (lexical corpus stats
    * + the residual-ADC cells/codebooks), so a resume across EITHER
    * index rebuild must fail loudly. */
  def hybrid(n: Long, t: Long, dfCap: Long,
      cells: Seq[(Long, Seq[Double], Seq[Long])],
      codebooks: Seq[(Int, Long, Seq[Long])]): Family =
    Family("hybrid-rrf", Seq("n" -> n, "t" -> t, "dfCap" -> dfCap,
      "cells" -> cellHash(cells), "codebooks" -> codebookHash(codebooks)))

  private def marker(checkpointLocation: String) =
    Paths.get(checkpointLocation, "_graft_state_geometry.json")

  /** Persist-or-check: first call under a checkpoint publishes the
    * fingerprint atomically with CREATE_NEW semantics (a crash never
    * leaves a torn file, and a concurrent first bind cannot be silently
    * overwritten — exactly one binder wins, the loser re-enters the
    * compare path); later calls compare and throw on ANY difference. */
  def bind(checkpointLocation: String, family: Family): Unit = {
    val path = marker(checkpointLocation)
    Files.createDirectories(path.getParent)
    if (Files.exists(path)) {
      val prev = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      if (prev != family.render)
        throw new IllegalStateException(
          s"state-geometry mismatch for checkpoint $checkpointLocation: " +
            s"the state store was built with $prev but this query declares " +
            s"${family.render}. State keys/buffers are a pure function of " +
            "the old geometry — resuming would silently orphan every " +
            "pre-restart member. Change geometry by starting a NEW " +
            "checkpoint and backfilling the state from the re-keyed " +
            "corpus; never edit parameters in place.")
    } else {
      // CREATE_NEW publish. ATOMIC_MOVE maps to rename(2) on POSIX,
      // which silently REPLACES an existing target — two concurrent
      // first binds with different families would then end
      // last-writer-wins with no error (ADVICE r9). createLink is an
      // atomic create-new (fails with FileAlreadyExistsException when
      // the marker appeared since the exists() check); the move
      // fallback deliberately omits REPLACE_EXISTING for the same
      // contract. Unique tmp name: concurrent binders must not clobber
      // each other's staging file either.
      val tmp = Files.createTempFile(
        path.getParent, "_graft_state_geometry", ".tmp")
      Files.write(tmp, family.render.getBytes(StandardCharsets.UTF_8))
      try {
        try Files.createLink(path, tmp)
        catch {
          // FileSystemException: filesystems that REJECT hard links
          // (FAT/exFAT, some network mounts/overlays) surface it here
          // rather than UnsupportedOperationException (ADVICE r10) —
          // but FileAlreadyExistsException IS a FileSystemException and
          // must keep re-entering the compare path below, not fall
          // through to a move that would then also EEXIST
          case _: UnsupportedOperationException |
               _: SecurityException =>
            Files.move(tmp, path) // no REPLACE_EXISTING: EEXIST throws
          case e: java.nio.file.FileSystemException
              if !e.isInstanceOf[java.nio.file.FileAlreadyExistsException] =>
            Files.move(tmp, path) // no REPLACE_EXISTING: EEXIST throws
        }
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // lost the first-bind race: re-enter the compare path, which
          // re-reads the winner and throws on any geometry difference
          bind(checkpointLocation, family)
      } finally Files.deleteIfExists(tmp)
    }
  }
}
