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
  *
  * Build-cost accounting (VERDICT r16 #2): every build's wall time and
  * per-stage walls ([[stage]]) are written as `_BUILD.json` INSIDE the
  * artifact and appended to `builds.jsonl` under the store root — so a
  * cold build's cost is attributed to the ARTIFACT that paid it, not to
  * whichever consumer query happened to run first, and a build paid in
  * an untimed warm pass stays visible in the capture regardless of
  * heap-state timing (ADVICE r16).
  *
  * Lifecycle (VERDICT r16 #6): `_SERVED` carries the last-served time
  * (touched on every resolve), [[list]] inventories the store, and
  * [[sweep]] expires artifacts whose recorded corpus has been
  * regenerated or deleted — the fingerprint key makes stale trees
  * unreachable, and unreachable trees at tens of GB each must not
  * accumulate forever.
  */
object IndexStore {

  /** Artifact root: `GRAFT_INDEX_DIR` if set, else `target/graft-index`
    * under the working directory (repo-local; survives across JVMs of
    * one round, wiped with the build output). */
  private lazy val defaultBaseDir: java.nio.file.Path = {
    val base = sys.env.getOrElse("GRAFT_INDEX_DIR",
      new java.io.File("target/graft-index").getAbsolutePath)
    java.nio.file.Paths.get(base)
  }

  /** Test-scoped store-root override: the lifecycle specs (sweep/wipe
    * delete GLOBALLY within the root) must not operate on the real
    * store. Suites run sequentially in the forked test JVM, so a
    * try/finally swap is race-free. */
  private[graft] var baseDirOverrideForTests: Option[java.nio.file.Path] =
    None

  private def baseDir: java.nio.file.Path = {
    val p = baseDirOverrideForTests.getOrElse(defaultBaseDir)
    java.nio.file.Files.createDirectories(p)
    p
  }

  /** The store's builds journal — one JSON line per completed build
    * `(kind, fingerprint, build_secs, stages, notes, t_start_ms,
    * t_end_ms)`. Bench folds the lines written during its run into the
    * capture as `artifact_builds`. */
  def buildsJournal: java.nio.file.Path = baseDir.resolve("builds.jsonl")

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

  /** One in-flight build's accounting frame. A STACK because a build
    * may resolve another artifact (the sharded near-dup escalation
    * builds over the per-shard gates): each frame records only its own
    * stages/notes. Thread-local: builds are JVM-lock-serialized per
    * artifact but distinct artifacts may build on distinct threads. */
  private final class BuildFrame(val kind: String) {
    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val notes = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
  }
  private val frames = new ThreadLocal[List[BuildFrame]] {
    override def initialValue(): List[BuildFrame] = Nil
  }

  /** Per-stage wall logging inside an artifact build: prints
    * `[<kind>] <tag> <secs> s` (the operational pricing a production
    * index build ships with) and records the stage into the build's
    * `_BUILD.json`. Outside a build it still prints (tagged `[build]`)
    * and records nothing. */
  def stage[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    val frame = frames.get.headOption
    println(f"[${frame.map(_.kind).getOrElse("build")}] $tag $secs%.1f s")
    frame.foreach(_.stages += ((tag, secs)))
    r
  }

  /** A scalar build note (a count, a chosen parameter) recorded into
    * the in-flight build's `_BUILD.json` — the audit-visible channel
    * for facts like the escalation's representative-set size. */
  def note(key: String, value: Long): Unit =
    frames.get.headOption.foreach(_.notes += ((key, value)))

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
        val frame = new BuildFrame(kind)
        frames.set(frame :: frames.get)
        val t0ms = System.currentTimeMillis()
        val t0 = System.nanoTime()
        // a failed build (a refused corpus, a mid-stage error) must not
        // leave its partial tree behind: repeated failing invocations
        // would otherwise accumulate orphaned .build-* directories, each
        // possibly holding a large half-written stage (ADVICE r15)
        try build(tmp.toString)
        catch { case e: Throwable => deleteTree(tmp); throw e }
        finally frames.set(frames.get.tail)
        val secs = (System.nanoTime() - t0) / 1e9
        val rec = buildRecord(kind, dir.getFileName.toString, corpusDir,
          tables, secs, t0ms, System.currentTimeMillis(), frame)
        java.nio.file.Files.write(tmp.resolve("_BUILD.json"),
          (rec + "\n").getBytes("UTF-8"))
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
        appendJournal(rec)
      }
    }
    touchServed(dir)
    dir.toString
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def buildRecord(kind: String, name: String, corpusDir: String,
      tables: Seq[String], secs: Double, t0ms: Long, t1ms: Long,
      frame: BuildFrame): String = {
    val stages = frame.stages
      .map { case (t, s) => s"${jsonStr(t)}:${"%.3f".format(s)}" }
      .mkString("{", ",", "}")
    val notes = frame.notes.map { case (k, v) => s"${jsonStr(k)}:$v" }
      .mkString("{", ",", "}")
    s"""{"artifact":${jsonStr(name)},"kind":${jsonStr(kind)},""" +
      s""""corpus_dir":${jsonStr(new java.io.File(corpusDir).getAbsolutePath)},""" +
      s""""tables":[${tables.map(jsonStr).mkString(",")}],""" +
      s""""build_secs":${"%.3f".format(secs)},"stages":$stages,""" +
      s""""notes":$notes,"t_start_ms":$t0ms,"t_end_ms":$t1ms}"""
  }

  private def appendJournal(line: String): Unit =
    try java.nio.file.Files.write(buildsJournal,
      (line + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case _: Throwable => () }

  /** Last-served marker: mtime of `_SERVED`, refreshed on every
    * resolve — the retention signal [[list]] reports and a
    * time-based sweep policy would key on. */
  private def touchServed(dir: java.nio.file.Path): Unit =
    try {
      val f = dir.resolve("_SERVED")
      if (!java.nio.file.Files.exists(f))
        java.nio.file.Files.write(f, Array.emptyByteArray)
      else
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis()))
    } catch { case _: Throwable => () }

  /** One published artifact's inventory row. `corpusDir`/`tables` come
    * from `_BUILD.json` (None for artifacts built before the journal
    * existed); `stale` means the recorded corpus is gone or has been
    * regenerated since (its current fingerprint no longer matches). */
  final case class ArtifactInfo(
      name: String, kind: String, fingerprint: String, bytes: Long,
      builtAtMs: Long, lastServedMs: Long,
      corpusDir: Option[String], tables: Seq[String], stale: Option[Boolean])

  private def treeBytes(p: java.nio.file.Path): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(p).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(java.nio.file.Files.size(_)).sum
  }

  /** Inventory of every published artifact under the store root —
    * `(kind, fingerprint, bytes, built-at, last-served, source corpus,
    * staleness)`, newest-built first. Unpublished `.build-*` scratch
    * and non-artifact files are skipped. */
  def list(): Seq[ArtifactInfo] = {
    import scala.jdk.CollectionConverters._
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    java.nio.file.Files.list(baseDir).iterator().asScala.toSeq
      .filter(d => java.nio.file.Files.isDirectory(d) &&
        java.nio.file.Files.exists(d.resolve("_COMPLETE")) &&
        !d.getFileName.toString.contains(".build-"))
      .map { d =>
        val name = d.getFileName.toString
        // name layout is <kind>-<32-hex fingerprint>
        val (kind, fp) =
          if (name.length > 33 && name.charAt(name.length - 33) == '-')
            (name.dropRight(33), name.takeRight(32))
          else (name, "")
        val meta = try {
          val f = d.resolve("_BUILD.json")
          if (java.nio.file.Files.exists(f)) Some(om.readTree(f.toFile))
          else None
        } catch { case _: Throwable => None }
        val corpus = meta.map(_.get("corpus_dir").asText())
        val tables = meta.toSeq.flatMap(m =>
          m.get("tables").iterator().asScala.map(_.asText()).toSeq)
        val stale = corpus.map { c =>
          !java.nio.file.Files.exists(java.nio.file.Paths.get(c)) ||
            fingerprint(c, tables) != fp
        }
        val builtAt = meta.map(_.get("t_end_ms").asLong).getOrElse(
          java.nio.file.Files.getLastModifiedTime(d).toMillis)
        val served = {
          val f = d.resolve("_SERVED")
          if (java.nio.file.Files.exists(f))
            java.nio.file.Files.getLastModifiedTime(f).toMillis
          else builtAt
        }
        ArtifactInfo(name, kind, fp, treeBytes(d), builtAt, served,
          corpus, tables, stale)
      }
      .sortBy(-_.builtAtMs)
  }

  /** Expire artifacts whose source corpus is gone or regenerated (the
    * fingerprint key already makes them unreachable — this reclaims
    * the disk). Artifacts without recorded provenance are left alone
    * unless `olderThanMs` is given, in which case any artifact not
    * served within that window is also expired. Returns the deleted
    * names. */
  def sweep(olderThanMs: Option[Long] = None): Seq[String] = {
    val now = System.currentTimeMillis()
    list().filter { a =>
      a.stale.contains(true) ||
        olderThanMs.exists(w => now - a.lastServedMs > w)
    }.map { a =>
      deleteTree(baseDir.resolve(a.name))
      a.name
    }
  }

  /** Delete every published artifact whose kind matches one of the
    * given prefixes — the same-path cold-build reset the sf10 audit
    * uses (replacing its raw `rm -rf` lines, VERDICT r16 #6). Returns
    * the deleted names. */
  def wipeKinds(prefixes: Seq[String]): Seq[String] =
    list().filter(a => prefixes.exists(a.kind.startsWith))
      .map { a => deleteTree(baseDir.resolve(a.name)); a.name }

  /** Delete a build-scratch subtree (staging tables a builder writes
    * under its temp dir and discards before publish — the residual
    * fixed-point staging of the pqvec build). */
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
