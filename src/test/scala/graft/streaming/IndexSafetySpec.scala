package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** Round-14 lifecycle-safety guarantees of the maintained index views
  * (ADVICE r13 + VERDICT r13 #4):
  *  - compaction folds only FULLY-COMMITTED batches (catalog applied),
  *    closing the marker-before-catalog crash window that could lose
  *    updated docs' postings / fresh vectors' codes forever;
  *  - an upsert whose new text is too short to shingle still leaves a
  *    log trace, so compact physically drops the superseded rows;
  *  - legacy append-only dirs REFUSE inserts colliding with
  *    catalog-unseen docs (df/n/t would double-count);
  *  - the compact/ingest mutual exclusion is a LEASE, not prose: a
  *    live lease refuses ingest and a second compactor; a stale lease
  *    (dead pid or TTL) is recovered automatically. */
class IndexSafetySpec extends SparkSpec {
  import spark.implicits._

  private def servedSet(df: org.apache.spark.sql.DataFrame) =
    df.select("h", "df", "neighbor_id", "dl", "tf")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def docRows() = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text")).as[DocText].collect().sortBy(_.doc_id)

  test("bm25 compact skips a batch whose postings marker committed but " +
      "whose catalog didn't (crash window): the replay completes it and " +
      "nothing is lost") {
    val dir = java.nio.file.Files.createTempDirectory("bm25crashwin").toString
    val rows = docRows()
    // batch 0: full corpus, committed normally
    Bm25IndexView.applyChangelogBatch(
      rows.map(r => (r.doc_id, r.text, "insert", r.doc_id + 1)).toSeq
        .toDF("doc_id", "text", "event_type", "sequence"), 0L, dir)
    val want0 = servedSet(Bm25IndexView.served(spark, dir))

    // batch 1 CRASHED between its postings marker (step 1) and the
    // catalog merge (step 4): craft exactly what step 1 leaves behind —
    // the update's postings partition + the skip-marker, no catalog
    val d3 = rows(3).doc_id
    val newText = rows(3).text.split(" ").reverse.mkString(" ")
    val ver = rows.map(_.doc_id).max + 2
    TextOps.bm25Postings(Seq((d3, newText)).toDF("doc_id", "text"))
      .withColumn("ver", lit(ver))
      .select(col("doc_id"), col("ver"), col("dl"), col("h"), col("tf"))
      .write.parquet(s"$dir/postings/batch=1")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/_postings-batch-1"))

    // compact BEFORE the stream replay: batch 1 must NOT fold (its id
    // is past the catalog's _applied_batch) — pre-fix, the fold judged
    // its rows against the pre-batch catalog head, dropped them,
    // deleted the dir, and the surviving marker made the replay skip
    // the postings step: the update's postings were lost forever
    Bm25IndexView.compact(spark, dir)
    assert(new java.io.File(s"$dir/postings/batch=1").exists(),
      "compaction folded a batch whose catalog commit is missing")
    // the uncommitted rows don't serve either (catalog head is older)
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want0,
      "uncommitted batch rows leaked into the served index")

    // the foreachBatch replay completes batch 1 (postings step is
    // fast-skipped by the surviving marker; terms/stats/catalog run)
    Bm25IndexView.applyChangelogBatch(
      Seq((d3, newText, "update_after", ver)).toSeq
        .toDF("doc_id", "text", "event_type", "sequence"), 1L, dir)
    val snapshot = rows.map(r =>
      if (r.doc_id == d3) DocText(d3, newText) else r).toSeq
      .toDF("doc_id", "text")
    val want1 = servedSet(TextOps.bm25ServedIndex(snapshot))
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want1,
      "replayed batch does not serve")

    // and NOW it folds — physically, with the superseded rows dropped
    Bm25IndexView.compact(spark, dir)
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want1,
      "post-replay compaction changed the served index")
    assert(spark.read.parquet(s"$dir/postings_compacted2").count()
      == TextOps.bm25Postings(snapshot).count(),
      "updated doc's postings were lost or duplicated across the crash window")
  }

  test("vec compact skips a batch whose codes marker committed but whose " +
      "catalog didn't: fresh inserts survive the crash window") {
    val dir = java.nio.file.Files.createTempDirectory("veccrashwin").toString
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, _) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.as[VecRow].collect().sortBy(_.vec_id)
    VecIndexView.applyChangelogBatch(
      rows.map(r => (r.vec_id, r.embedding, "insert", r.vec_id + 1)).toSeq
        .toDF("vec_id", "embedding", "event_type", "sequence"),
      0L, dir, cells, cbs)
    def codeSet() = VecIndexView.servedIndex(spark, dir)
      .select(col("vec_id"), col("s").cast("int"), col("j"),
        col("cell_id").cast("long"))
      .as[(Long, Int, Long, Long)].collect().toSet
    val want0 = codeSet()

    // batch 1 (a fresh INSERT) crashed after its codes partition +
    // marker, before the catalog merge
    val newId = rows.map(_.vec_id).max + 1000
    val ver = rows.map(_.vec_id).max + 2
    StreamOps.ivfPqEncodeProj(
        Seq((newId, rows(0).embedding)).toDF("vec_id", "embedding"),
        cells, cbs)
      .select(col("vec_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("s", "j")))
      .select(col("vec_id"), lit(ver).as("ver"), col("cell_id"),
        col("s").cast("int").as("s"), col("j"))
      .write.parquet(s"$dir/codes/batch=1")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/_codes-batch-1"))

    VecIndexView.compact(spark, dir)
    assert(new java.io.File(s"$dir/codes/batch=1").exists(),
      "vec compaction folded a batch whose catalog commit is missing")
    assert(codeSet() == want0, "uncommitted codes leaked into the serve")

    // replay completes the batch; the insert serves and then folds
    VecIndexView.applyChangelogBatch(
      Seq((newId, rows(0).embedding, "insert", ver)).toSeq
        .toDF("vec_id", "embedding", "event_type", "sequence"),
      1L, dir, cells, cbs)
    val snapshot = (rows.toSeq :+ VecRow(newId, rows(0).embedding))
      .toDF("vec_id", "embedding")
    val want1 = StreamOps.ivfPqEncodeProj(snapshot, cells, cbs)
      .select(col("vec_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("s", "j")))
      .select(col("vec_id"), col("s").cast("int"), col("j"),
        col("cell_id").cast("long"))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(codeSet() == want1, "replayed insert does not serve")
    VecIndexView.compact(spark, dir)
    assert(codeSet() == want1, "post-replay vec compaction changed the serve")
    assert(spark.read.parquet(s"$dir/codes_compacted").count() == want1.size,
      "fresh insert's codes were lost across the crash window")
  }

  test("an upsert to a <3-token text physically drops the superseded " +
      "version's rows at compaction") {
    val dir = java.nio.file.Files.createTempDirectory("bm25short").toString
    val rows = docRows()
    Bm25IndexView.applyChangelogBatch(
      rows.map(r => (r.doc_id, r.text, "insert", r.doc_id + 1)).toSeq
        .toDF("doc_id", "text", "event_type", "sequence"), 0L, dir)
    Bm25IndexView.compact(spark, dir) // everything into the base

    // update d3 to a 2-token text: bm25Postings emits NO rows for it
    val d3 = rows(3).doc_id
    val ver = rows.map(_.doc_id).max + 2
    Bm25IndexView.applyChangelogBatch(
      Seq((d3, "tiny text", "update_after", ver)).toSeq
        .toDF("doc_id", "text", "event_type", "sequence"), 1L, dir)
    val snapshot = rows.map(r =>
      if (r.doc_id == d3) DocText(d3, "tiny text") else r).toSeq
      .toDF("doc_id", "text")
    val want = servedSet(TextOps.bm25ServedIndex(snapshot))
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want,
      "short-text upsert does not serve the snapshot")
    assert(Bm25IndexView.stats(spark, dir) == TextOps.bm25Stats(snapshot))

    // pre-fix: the upsert produced zero log rows, compact never touched
    // d3's bucket, and the superseded rows stayed physically in the base
    Bm25IndexView.compact(spark, dir)
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want,
      "compaction changed the served index")
    assert(spark.read.parquet(s"$dir/postings_compacted2").count()
      == TextOps.bm25Postings(snapshot).count(),
      "superseded rows of a short-text upsert remain in the base")
  }

  test("legacy dirs refuse inserts colliding with catalog-unseen docs; " +
      "new unique ids stay accepted; still refused after the fold") {
    val dir = java.nio.file.Files.createTempDirectory("bm25collide").toString
    val rows = docRows().take(12)
    // a pre-r12 flat-append layout: loose postings + terms + stats
    val corpus = rows.toSeq.toDF("doc_id", "text")
    val postings = TextOps.bm25Postings(corpus)
    postings.write.parquet(s"$dir/postings-tmp")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/postings"))
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/postings-tmp"))
      .iterator().asScala.filter(_.toString.endsWith(".parquet"))
      .foreach { f =>
        java.nio.file.Files.move(f,
          java.nio.file.Paths.get(s"$dir/postings/${f.getFileName}"))
      }
    postings.groupBy("h").agg(count(lit(1)).as("df"))
      .write.parquet(s"$dir/terms")
    val (n0, t0) = TextOps.bm25Stats(corpus)
    Seq((n0, t0)).toDF("n", "t").write.parquet(s"$dir/stats")

    // a colliding "insert" of a legacy doc is refused
    val ex = intercept[IllegalStateException] {
      Bm25IndexView.applyBatch(
        Seq(DocText(rows(0).doc_id, "completely different words here")).toDF(
          "doc_id", "text"), 60L, dir)
    }
    assert(ex.getMessage.contains("double-count"),
      s"wrong refusal message: ${ex.getMessage}")
    // a genuinely new id is accepted and serves
    val extra = DocText(777777L, "alpha beta gamma delta")
    Bm25IndexView.applyBatch(Seq(extra).toDF("doc_id", "text"), 61L, dir)
    val corpus2 = (rows.toSeq :+ extra).toDF("doc_id", "text")
    assert(servedSet(Bm25IndexView.served(spark, dir))
      == servedSet(TextOps.bm25ServedIndex(corpus2)))
    // folding the legacy zone into the v2 base does not catalog its
    // docs — the collision stays refused afterwards
    Bm25IndexView.compact(spark, dir)
    intercept[IllegalStateException] {
      Bm25IndexView.applyBatch(
        Seq(DocText(rows(1).doc_id, "other new words again")).toDF(
          "doc_id", "text"), 62L, dir)
    }
  }

  test("compact/ingest lease: a live lease refuses ingest and a second " +
      "compactor; stale leases (TTL or dead pid) are recovered; compact " +
      "releases on completion") {
    val dir = java.nio.file.Files.createTempDirectory("bm25lease").toString
    val rows = docRows()
    Bm25IndexView.applyChangelogBatch(
      rows.map(r => (r.doc_id, r.text, "insert", r.doc_id + 1)).toSeq
        .toDF("doc_id", "text", "event_type", "sequence"), 0L, dir)
    val lease = java.nio.file.Paths.get(s"$dir/_compact-lease")
    val host = java.net.InetAddress.getLocalHost.getHostName
    def b1 = Seq((rows(3).doc_id, "replacement words for doc three",
      "update_after", rows.map(_.doc_id).max + 2L)).toSeq
      .toDF("doc_id", "text", "event_type", "sequence")

    // LIVE lease (this very process — alive by construction)
    java.nio.file.Files.write(lease,
      s"$host|${ProcessHandle.current().pid()}|${System.currentTimeMillis()}"
        .getBytes("UTF-8"))
    val ex = intercept[IllegalStateException] {
      Bm25IndexView.applyChangelogBatch(b1, 1L, dir)
    }
    assert(ex.getMessage.contains("compaction holds the lease"),
      s"wrong ingest refusal: ${ex.getMessage}")
    intercept[IllegalStateException] { Bm25IndexView.compact(spark, dir) }
    assert(java.nio.file.Files.exists(lease),
      "a refused compactor deleted someone else's live lease")

    // TTL-stale cross-host lease → recovered, ingest proceeds
    java.nio.file.Files.write(lease,
      s"elsewhere|12345|${System.currentTimeMillis() - IndexFiles.LeaseTtlMs - 60000}"
        .getBytes("UTF-8"))
    Bm25IndexView.applyChangelogBatch(b1, 1L, dir)
    assert(!java.nio.file.Files.exists(lease), "stale lease not recovered")

    // dead-pid same-host lease (a process we know has exited) → stale
    val p = new ProcessBuilder("true").start()
    p.waitFor()
    java.nio.file.Files.write(lease,
      s"$host|${p.pid()}|${System.currentTimeMillis()}".getBytes("UTF-8"))
    Bm25IndexView.compact(spark, dir) // recovers + acquires + releases
    assert(!java.nio.file.Files.exists(lease),
      "compact did not release the lease")
    // everything still serves the materialized state
    val snapshot = rows.map(r =>
      if (r.doc_id == rows(3).doc_id)
        DocText(r.doc_id, "replacement words for doc three")
      else r).toSeq.toDF("doc_id", "text")
    assert(servedSet(Bm25IndexView.served(spark, dir))
      == servedSet(TextOps.bm25ServedIndex(snapshot)))
  }
}
