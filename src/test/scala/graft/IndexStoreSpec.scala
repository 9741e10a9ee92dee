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
