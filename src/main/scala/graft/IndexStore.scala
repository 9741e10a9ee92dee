package graft

/** On-disk, build-once index artifacts keyed by corpus fingerprint.
  *
  * Production retrieval serves from PERSISTED index artifacts (postings
  * logs, codebooks, code tables) built once per corpus — not from
  * in-JVM caches: at 100 TB the index is a table on shared storage that
  * every executor, every session, and every restart reads; executor
  * memory holds working sets, not whole indexes. This store gives the
  * batch queries exactly that architecture at test scale: an artifact
  * directory per (kind, corpus fingerprint), built atomically on first
  * use and read as plain parquet thereafter — the same artifacts the
  * streaming maintainers ([[graft.streaming.Bm25IndexView]]) write
  * incrementally.
  *
  * Correctness is untouched: every artifact is a pure deterministic
  * function of the immutable fixture (the oracle re-derives the full
  * build chain in SQL on every run), and the fingerprint covers file
  * sizes + mtimes of the source table, so a regenerated fixture can
  * never serve a stale artifact.
  *
  * Atomicity: a build runs into a temp sibling directory, the
  * `_COMPLETE` marker is written INSIDE it, and one atomic rename
  * publishes the artifact — a killed build leaves no half-artifact, a
  * concurrent builder that loses the rename race discards its copy and
  * reads the winner (the two-rename swap discipline of the streaming
  * views).
  */
object IndexStore {

  /** Artifact root: `GRAFT_INDEX_DIR` if set, else `target/graft-index`
    * under the working directory (repo-local; survives across JVMs of
    * one round, wiped with the build output). */
  private lazy val baseDir: java.nio.file.Path = {
    val base = sys.env.getOrElse("GRAFT_INDEX_DIR",
      new java.io.File("target/graft-index").getAbsolutePath)
    val p = java.nio.file.Paths.get(base)
    java.nio.file.Files.createDirectories(p)
    p
  }

  /** Content fingerprint of the source tables under `corpusDir`:
    * canonical path plus (relative name, size, mtime) of every file of
    * each `<table>.parquet` — md5-hex. Metadata-only (no data read);
    * any regeneration of the fixture changes it. */
  private def fingerprint(corpusDir: String, tables: Seq[String]): String = {
    import scala.jdk.CollectionConverters._
    val sb = new StringBuilder(new java.io.File(corpusDir).getCanonicalPath)
    for (t <- tables) {
      val root = java.nio.file.Paths.get(corpusDir, s"$t.parquet")
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .filter(java.nio.file.Files.isRegularFile(_))
          .sortBy(_.toString)
          .foreach { f =>
            sb.append('|').append(root.relativize(f).toString)
              .append(':').append(java.nio.file.Files.size(f))
              .append(':')
              .append(java.nio.file.Files.getLastModifiedTime(f).toMillis)
          }
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private val locks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** The artifact directory for `kind` over `corpusDir`'s `tables`,
    * building it via `build(tmpDir)` if its completion marker is absent.
    * Returns the published path; `build` writes into the temp path it is
    * given and must not touch the final location. */
  def artifact(corpusDir: String, kind: String, tables: Seq[String])(
      build: String => Unit): String = {
    val dir = baseDir.resolve(s"$kind-${fingerprint(corpusDir, tables)}")
    val marker = dir.resolve("_COMPLETE")
    // JVM-level lock per artifact: one builder; cross-process safety is
    // the marker + atomic publish below
    locks.getOrElseUpdate(dir.toString, new Object).synchronized {
      if (!java.nio.file.Files.exists(marker)) {
        val tmp = baseDir.resolve(
          s"${dir.getFileName}.build-${java.util.UUID.randomUUID()}")
        java.nio.file.Files.createDirectories(tmp)
        // a failed build (a refused corpus, a mid-stage error) must not
        // leave its partial tree behind: repeated failing invocations
        // would otherwise accumulate orphaned .build-* directories, each
        // possibly holding a large half-written stage (ADVICE r15)
        try build(tmp.toString)
        catch { case e: Throwable => deleteTree(tmp); throw e }
        java.nio.file.Files.write(tmp.resolve("_COMPLETE"),
          Array.emptyByteArray)
        try
          java.nio.file.Files.move(tmp, dir,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          // another process published first — theirs is complete, use it
          case e: java.nio.file.FileSystemException =>
            if (java.nio.file.Files.exists(marker)) deleteTree(tmp)
            else throw e
        }
      }
    }
    dir.toString
  }

  /** Delete a build-scratch subtree (staging tables a builder writes
    * under its temp dir and discards before publish). */
  def deleteSubtree(path: String): Unit =
    deleteTree(java.nio.file.Paths.get(path))

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }
}
