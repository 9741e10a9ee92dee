package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Restart-time guard for the streaming LSH dedup states.
  *
  * [[StreamOps.neardupStream]] / [[StreamOps.embedNeardupStream]] key
  * their bucket-membership state by `(band, key)`, where the key is a
  * pure function of the FAMILY parameters (bands × bits hyperplanes, or
  * the MinHash band layout) — so the family is frozen into the
  * checkpoint the moment the first micro-batch commits. Resuming the
  * same checkpoint with different parameters does not fail: the new keys
  * simply never hit the old buckets, every pre-restart document silently
  * stops participating in dedup, and near-duplicates of the existing
  * corpus sail through unflagged. (The batch side re-keys freely —
  * `Similarity.ndBits` scales bits with the corpus — precisely because
  * it has no persistent state; the stream cannot, as documented there.)
  *
  * `bind(checkpoint, family)` turns that silent wrongness into a loud
  * restart-time error: the first bind persists the family fingerprint
  * under the checkpoint root; every later bind re-reads and compares.
  * Call it at query-build time, right before `writeStream.start()`,
  * with the same checkpointLocation. Re-sharding legitimately =
  * a NEW checkpoint plus a batch backfill of the state (bootstrap the
  * stream from the re-keyed corpus), never an in-place parameter edit.
  */
object LshFamilyGuard {

  /** One frozen LSH family: `kind` names the key function (e.g.
    * "minhash-4x4" or "hyperplane"), the ints pin its geometry. */
  final case class Family(kind: String, bands: Int, bits: Int, maxBucket: Int) {
    def render: String =
      s"""{"kind":"$kind","bands":$bands,"bits":$bits,"maxBucket":$maxBucket}"""
  }

  /** The fixed family of [[StreamOps.neardupStream]] (4 bands × 4 rows
    * of the 16-slot MinHash signature). */
  def minhash(maxBucket: Int): Family = Family("minhash-4x4", 4, 4, maxBucket)

  /** The hyperplane family of [[StreamOps.embedNeardupStream]]. */
  def hyperplane(bands: Int, bits: Int, maxBucket: Int): Family =
    Family("hyperplane", bands, bits, maxBucket)

  private def marker(checkpointLocation: String) =
    Paths.get(checkpointLocation, "_graft_lsh_family.json")

  /** Persist-or-check: first call under a checkpoint writes the
    * fingerprint (atomic move, so a crash never leaves a torn file);
    * later calls compare and throw on ANY difference. */
  def bind(checkpointLocation: String, family: Family): Unit = {
    val path = marker(checkpointLocation)
    Files.createDirectories(path.getParent)
    if (Files.exists(path)) {
      val prev = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      if (prev != family.render)
        throw new IllegalStateException(
          s"LSH family mismatch for checkpoint $checkpointLocation: the " +
            s"state store was built with $prev but this query declares " +
            s"${family.render}. Bucket state is keyed by the old family — " +
            "resuming would silently drop every pre-restart member from " +
            "dedup. Re-shard by starting a NEW checkpoint and backfilling " +
            "the state from the re-keyed corpus; never edit parameters " +
            "in place.")
    } else {
      val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
      Files.write(tmp, family.render.getBytes(StandardCharsets.UTF_8))
      try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          try Files.move(tmp, path)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Files.deleteIfExists(tmp); bind(checkpointLocation, family)
          }
        case _: java.nio.file.FileAlreadyExistsException =>
          // lost the first-bind race: re-enter the compare path
          Files.deleteIfExists(tmp); bind(checkpointLocation, family)
      }
    }
  }
}
