package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[IndexStore]]: build-once artifact directories keyed by corpus
  * fingerprint — one build per (kind, fingerprint), atomic publish,
  * and a regenerated source file (size or mtime change) can never be
  * served a stale artifact. */
class IndexStoreSpec extends AnyFunSuite {

  private def tempCorpus(): String = {
    val dir = java.nio.file.Files.createTempDirectory("idxstore").toString
    val t = java.nio.file.Paths.get(dir, "documents.parquet")
    java.nio.file.Files.createDirectories(t)
    java.nio.file.Files.write(t.resolve("part-0.parquet"),
      "fixture-bytes".getBytes("UTF-8"))
    dir
  }

  test("build runs exactly once per fingerprint and the artifact is " +
      "published with its marker") {
    val corpus = tempCorpus()
    val builds = new java.util.concurrent.atomic.AtomicInteger
    def build(out: String): Unit = {
      builds.incrementAndGet()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "data"), "x".getBytes("UTF-8"))
      ()
    }
    val a1 = IndexStore.artifact(corpus, "spec-kind", Seq("documents"))(build)
    val a2 = IndexStore.artifact(corpus, "spec-kind", Seq("documents"))(build)
    assert(a1 == a2, "same fingerprint resolved to different artifacts")
    assert(builds.get() == 1, "artifact rebuilt despite completion marker")
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(a1, "_COMPLETE")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(a1, "data")))
  }

  test("a regenerated source file (content length change) yields a NEW " +
      "artifact directory — stale artifacts are unreachable") {
    val corpus = tempCorpus()
    val builds = new java.util.concurrent.atomic.AtomicInteger
    def build(out: String): Unit = { builds.incrementAndGet(); () }
    val a1 = IndexStore.artifact(corpus, "spec-kind2", Seq("documents"))(build)
    // regenerate the fixture: different size => different fingerprint
    java.nio.file.Files.write(
      java.nio.file.Paths.get(corpus, "documents.parquet", "part-0.parquet"),
      "fixture-bytes-regenerated".getBytes("UTF-8"))
    val a2 = IndexStore.artifact(corpus, "spec-kind2", Seq("documents"))(build)
    assert(a1 != a2, "regenerated fixture mapped to the stale artifact")
    assert(builds.get() == 2)
  }

  test("different kinds over the same corpus get distinct artifacts") {
    val corpus = tempCorpus()
    val a = IndexStore.artifact(corpus, "spec-kind-a", Seq("documents"))(_ => ())
    val b = IndexStore.artifact(corpus, "spec-kind-b", Seq("documents"))(_ => ())
    assert(a != b)
  }

  /** Run `body` against a PRIVATE store root — the lifecycle tests
    * below sweep/wipe globally within the root and must never touch
    * the real artifact store. */
  private def withScopedStore[T](body: => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("idxstore-root")
    IndexStore.baseDirOverrideForTests = Some(tmp)
    try body finally IndexStore.baseDirOverrideForTests = None
  }

  test("build records _BUILD.json with stage walls + notes and appends " +
      "a journal line; resolves touch _SERVED (VERDICT r16 #2/#6)") {
    withScopedStore {
      val corpus = tempCorpus()
      val a = IndexStore.artifact(corpus, "spec-meta", Seq("documents")) {
        out =>
          IndexStore.stage("s1") { Thread.sleep(5) }
          IndexStore.note("n_rows", 42L)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, "data"), "x".getBytes("UTF-8"))
          ()
      }
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val meta = om.readTree(
        java.nio.file.Paths.get(a, "_BUILD.json").toFile)
      assert(meta.get("kind").asText() == "spec-meta")
      assert(meta.get("stages").has("s1"))
      assert(meta.get("stages").get("s1").asDouble() >= 0.005)
      assert(meta.get("notes").get("n_rows").asLong() == 42L)
      assert(meta.get("build_secs").asDouble() > 0)
      val journal = new String(java.nio.file.Files.readAllBytes(
        IndexStore.buildsJournal), "UTF-8")
      assert(journal.contains("spec-meta"))
      assert(journal.contains("\"n_rows\":42"))
      // last-served touch: a later resolve advances the _SERVED mtime
      val served = java.nio.file.Paths.get(a, "_SERVED")
      assert(java.nio.file.Files.exists(served))
      val t1 = java.nio.file.Files.getLastModifiedTime(served).toMillis
      Thread.sleep(15)
      IndexStore.artifact(corpus, "spec-meta", Seq("documents"))(_ => ())
      val t2 = java.nio.file.Files.getLastModifiedTime(served).toMillis
      assert(t2 > t1, "resolve did not touch _SERVED")
    }
  }

  test("stage/note outside a build print-only (no crash, nothing " +
      "recorded anywhere)") {
    assert(IndexStore.stage("orphan")(7) == 7)
    IndexStore.note("orphan", 1L)
  }

  test("list() inventories kind, fingerprint, bytes and staleness; " +
      "sweep() expires regenerated-corpus artifacts and keeps fresh " +
      "ones (VERDICT r16 #6)") {
    withScopedStore {
      val corpus = tempCorpus()
      val a = IndexStore.artifact(corpus, "spec-life", Seq("documents")) {
        out =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(out, "data"), "abc".getBytes("UTF-8"))
          ()
      }
      val row = IndexStore.list().find(_.kind == "spec-life").get
      assert(row.fingerprint.length == 32)
      assert(row.bytes >= 3)
      assert(row.corpusDir.contains(
        new java.io.File(corpus).getAbsolutePath))
      assert(row.stale.contains(false))
      // regenerate the corpus: the OLD artifact becomes stale, a new
      // build gets a new directory; sweep reclaims only the stale one
      java.nio.file.Files.write(java.nio.file.Paths.get(
        corpus, "documents.parquet", "part-0.parquet"),
        "regenerated-longer-bytes".getBytes("UTF-8"))
      val b = IndexStore.artifact(corpus, "spec-life", Seq("documents")) {
        _ => ()
      }
      assert(a != b)
      val stale = IndexStore.list().filter(_.kind == "spec-life")
        .filter(_.stale.contains(true))
      assert(stale.map(n => s"spec-life-${n.fingerprint}")
        .contains(new java.io.File(a).getName))
      val gone = IndexStore.sweep()
      assert(gone.contains(new java.io.File(a).getName))
      assert(!gone.contains(new java.io.File(b).getName))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(a)))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(b)))
    }
  }

  test("sweep(olderThanMs) expires artifacts not served within the " +
      "window; a recent resolve protects them") {
    withScopedStore {
      val corpus = tempCorpus()
      val a = IndexStore.artifact(corpus, "spec-age", Seq("documents")) {
        _ => ()
      }
      // nothing expires under a generous window
      assert(IndexStore.sweep(Some(60000L)).isEmpty)
      // age the served marker past the window
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(a, "_SERVED"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 3600 * 1000))
      val gone = IndexStore.sweep(Some(60000L))
      assert(gone.contains(new java.io.File(a).getName))
    }
  }

  test("wipeKinds deletes exactly the matching kind prefixes — the " +
      "sf10 runner's same-path cold-build reset") {
    withScopedStore {
      val corpus = tempCorpus()
      val a = IndexStore.artifact(corpus, "spec-wipe-x", Seq("documents"))(
        _ => ())
      val b = IndexStore.artifact(corpus, "spec-keep-y", Seq("documents"))(
        _ => ())
      val gone = IndexStore.wipeKinds(Seq("spec-wipe-"))
      assert(gone.contains(new java.io.File(a).getName))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(a)))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(b)))
    }
  }

  test("a failed build publishes nothing and the next call retries") {
    val corpus = tempCorpus()
    val builds = new java.util.concurrent.atomic.AtomicInteger
    intercept[RuntimeException] {
      IndexStore.artifact(corpus, "spec-kind3", Seq("documents")) { _ =>
        builds.incrementAndGet(); throw new RuntimeException("boom")
      }
    }
    val a = IndexStore.artifact(corpus, "spec-kind3", Seq("documents")) { out =>
      builds.incrementAndGet()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "data"), "y".getBytes("UTF-8"))
      ()
    }
    assert(builds.get() == 2, "failed build was treated as published")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(a, "data")))
  }
}
