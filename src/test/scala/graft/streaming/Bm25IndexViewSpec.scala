package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DocEvent(doc_id: Long, text: String, event_type: String,
    sequence: Long)

/** The maintained BM25 index: ingest stream in, served index out —
  * row-identical to the batch build over the changelog's materialized
  * latest state, replay no-op, and the maintained artifacts serve the
  * search stream with results ≡ the batch `q_bm25` over the same
  * state. */
class Bm25IndexViewSpec extends SparkSpec {
  import spark.implicits._

  private def servedSet(df: org.apache.spark.sql.DataFrame) =
    df.select("h", "df", "neighbor_id", "dl", "tf")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("ingested index ≡ batch build; replay no-op; maintained artifacts " +
      "serve the search stream ≡ batch q_bm25") {
    val dir = java.nio.file.Files.createTempDirectory("bm25view").toString
    val docs = graft.Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[DocText].collect().sortBy(_.doc_id)

    val in = MemoryStream[DocText](spark)
    val q = in.toDF().writeStream
      .foreachBatch(Bm25IndexView.writer(dir))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bm25view-ckpt").toString)
      .start()
    try {
      rows.grouped((rows.length + 2) / 3)
        .foreach { c => in.addData(c.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    // 1. served view ≡ the batch build over the same corpus
    val got = servedSet(Bm25IndexView.served(spark, dir))
    val want = servedSet(TextOps.bm25ServedIndex(docs))
    assert(got == want,
      s"served view diverged: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    // stats match the batch stats
    assert(Bm25IndexView.stats(spark, dir) == TextOps.bm25Stats(docs))
    // maintained health ≡ the batch q_lexical_health over the same corpus
    val gotH = Bm25IndexView.health(spark, dir)
      .as[(String, Long)].collect().toSeq
    val wantH = graft.SparkEntry.queries("q_lexical_health")(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(gotH == wantH, s"maintained health diverged: $gotH vs $wantH")

    // 2. replay of an already-applied batch is a no-op on every artifact
    val before = (got, Bm25IndexView.stats(spark, dir))
    Bm25IndexView.applyBatch(
      rows.take(5).toSeq.toDF("doc_id", "text"), batchId = 0L, baseDir = dir)
    assert((servedSet(Bm25IndexView.served(spark, dir)),
      Bm25IndexView.stats(spark, dir)) == before, "replay changed the view")

    // 2b. CRASH-RETRY on the postings log: a crash AFTER batch 0's
    // postings committed but BEFORE its skip-marker re-runs the batch —
    // the per-batch partition Overwrite (or, post-catalog, the
    // empty-effective skip) never appends duplicate postings (which
    // would double-count tf in served scores; ADVICE r11). terms/stats/
    // catalog markers already read 0 = applied, so only the postings
    // step re-executes, exactly the crash window.
    val batch0 = rows.grouped((rows.length + 2) / 3).next()
    val postingsBefore =
      spark.read.parquet(s"$dir/postings").count()
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_postings-batch-0"))
    Bm25IndexView.applyBatch(
      batch0.toSeq.toDF("doc_id", "text"), batchId = 0L, baseDir = dir)
    assert(spark.read.parquet(s"$dir/postings").count() == postingsBefore,
      "crash-retry duplicated postings rows")
    assert(servedSet(Bm25IndexView.served(spark, dir)) == got,
      "crash-retry changed the served index")

    // 3. maintain → serve: the search stream over the MAINTAINED index
    // equals the batch q_bm25 (ranks and scores)
    val (n, t) = Bm25IndexView.stats(spark, dir)
    val qrows = rows.filter(_.doc_id < 8)
    val qin = MemoryStream[DocText](spark)
    val sq = StreamOps.bm25SearchStream(qin.toDF(),
      Bm25IndexView.served(spark, dir), n, t, k = 5,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("bm25_view_search")
      .outputMode("append").start()
    try {
      qin.addData(qrows.toIndexedSeq); sq.processAllAvailable()
      val gotS = spark.table("bm25_view_search")
        .withColumn("maxv", max("ver").over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id"), col("rank").cast("long"),
          col("neighbor_id"), col("score"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val wantS = TextOps.qBm25.build(spark, sf)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(gotS == wantS,
        s"served search diverged: ${gotS.diff(wantS).take(5)} vs ${wantS.diff(gotS).take(5)}")
    } finally sq.stop()
  }

  test("changelog lifecycle: inserts+updates+deletes serve ≡ the batch " +
      "index over the materialized latest state; late events lose; " +
      "replay and crash-retry are no-ops; compaction physically drops " +
      "superseded rows; search over the maintained index ≡ batch") {
    val dir = java.nio.file.Files.createTempDirectory("bm25cdc").toString
    val docs = graft.Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[DocText].collect().sortBy(_.doc_id)
    def rev(t: String) = t.split(" ").reverse.mkString(" ")

    val d2 = rows(2).doc_id; val d3 = rows(3).doc_id
    val d5 = rows(5).doc_id; val d7 = rows(7).doc_id
    // batch 0: insert everything (seq = doc_id + 1)
    val b0 = rows.map(r => DocEvent(r.doc_id, r.text, "insert", r.doc_id + 1))
    val base = rows.map(_.doc_id).max + 2
    // batch 1: update d3 and d5 (with their update_before images, which
    // must be skipped), delete d2 and d7
    val b1 = Seq(
      DocEvent(d3, rows(3).text, "update_before", base),
      DocEvent(d3, rev(rows(3).text), "update_after", base),
      DocEvent(d5, rows(5).text, "update_before", base + 1),
      DocEvent(d5, rev(rows(5).text), "update_after", base + 1),
      DocEvent(d2, "", "delete", base + 2),
      DocEvent(d7, "", "delete", base + 3))
    // batch 2: re-insert d2 with new text (resurrection), update d3
    // AGAIN within the same batch as its first update's replay twin,
    // and a LATE event for d5 (stale sequence — must lose)
    val b2 = Seq(
      DocEvent(d2, rows(2).text + " extra tail tokens", "insert", base + 4),
      DocEvent(d3, rev(rows(3).text) + " more words here", "update_after", base + 5),
      DocEvent(d5, "stale text that must never serve", "update_after", 1L))

    val in = MemoryStream[DocEvent](spark)
    val q = in.toDF().writeStream
      .foreachBatch(Bm25IndexView.changelogWriter(dir))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bm25cdc-ckpt").toString)
      .start()
    try {
      Seq(b0.toSeq, b1, b2).foreach { b =>
        in.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()

    // the changelog's materialized latest state
    val snapRows = rows.flatMap { r =>
      r.doc_id match {
        case `d2` => Some(DocText(d2, rows(2).text + " extra tail tokens"))
        case `d3` => Some(DocText(d3, rev(rows(3).text) + " more words here"))
        case `d5` => Some(DocText(d5, rev(rows(5).text)))
        case `d7` => None
        case _    => Some(r)
      }
    }
    val snapshot = snapRows.toSeq.toDF("doc_id", "text")

    // 1. served ≡ batch build over the snapshot; stats match
    val want = servedSet(TextOps.bm25ServedIndex(snapshot))
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want,
      "changelog-served index diverged from the batch build over the snapshot")
    assert(Bm25IndexView.stats(spark, dir) == TextOps.bm25Stats(snapshot),
      "maintained (n, t) diverged from the snapshot stats")

    // 2. replay of batch 1 (same batchId) is a no-op
    Bm25IndexView.applyChangelogBatch(
      b1.toDF("doc_id", "text", "event_type", "sequence"), 1L, dir)
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want,
      "batch replay changed the served index")

    // 2b. crash window: batch 1's postings marker lost after full apply
    // — the re-run must not duplicate or truncate anything
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_postings-batch-1"))
    Bm25IndexView.applyChangelogBatch(
      b1.toDF("doc_id", "text", "event_type", "sequence"), 1L, dir)
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want,
      "marker-loss re-run changed the served index")

    // 2c. cross-batch duplicate delivery: an at-least-once source
    // re-sends batch 2's events under a NEW batchId — already-sequenced
    // events are late, leave no log rows, and change nothing
    Bm25IndexView.applyChangelogBatch(
      b2.toDF("doc_id", "text", "event_type", "sequence"), 9L, dir)
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want,
      "cross-batch duplicate delivery changed the served index")
    assert(Bm25IndexView.stats(spark, dir) == TextOps.bm25Stats(snapshot))

    // 3. compaction: served identical, and the base physically holds
    // EXACTLY the snapshot's postings rows (superseded + deleted gone)
    Bm25IndexView.compact(spark, dir)
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want,
      "compaction changed the served index")
    val basePostings = spark.read.parquet(s"$dir/postings_compacted2")
    assert(basePostings.count() == TextOps.bm25Postings(snapshot).count(),
      "compacted base retains superseded/deleted rows")
    assert(!new java.io.File(s"$dir/postings").listFiles()
      .exists(_.getName.startsWith("batch=")), "log not drained")

    // 4. post-compact mutation: delete one more doc, serve follows,
    // re-compact physically shrinks only that doc's bucket
    val d9 = rows(9).doc_id
    Bm25IndexView.applyChangelogBatch(
      Seq(DocEvent(d9, "", "delete", base + 9))
        .toDF("doc_id", "text", "event_type", "sequence"), 10L, dir)
    val snapshot2 = snapRows.filterNot(_.doc_id == d9).toSeq
      .toDF("doc_id", "text")
    val want2 = servedSet(TextOps.bm25ServedIndex(snapshot2))
    assert(servedSet(Bm25IndexView.served(spark, dir)) == want2,
      "post-compact delete not reflected in serve")
    assert(Bm25IndexView.stats(spark, dir) == TextOps.bm25Stats(snapshot2))
    def baseFiles(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$dir/postings_compacted2"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
    }
    val filesBefore = baseFiles()
    Bm25IndexView.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/postings_compacted2").count()
      == TextOps.bm25Postings(snapshot2).count(),
      "re-compaction kept the deleted doc's rows")
    val touched = d9 % Bm25IndexView.CompactBuckets
    val untouched = filesBefore.filterNot(_._1.contains(s"bucket=$touched"))
    val after = baseFiles()
    assert(untouched.forall { case (f, sig) => after.get(f).contains(sig) },
      "an untouched bucket was rewritten by the tombstone fold")

    // 5. serve the search stream from the maintained index ≡ the batch
    // BM25 ranking over the materialized state
    val (n, t) = Bm25IndexView.stats(spark, dir)
    val qrows = snapshot2.where(col("doc_id") < 8)
      .as[DocText].collect().toSeq
    val qin = MemoryStream[DocText](spark)
    val sq = StreamOps.bm25SearchStream(qin.toDF(),
      Bm25IndexView.served(spark, dir), n, t, k = 5,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("bm25_cdc_search")
      .outputMode("append").start()
    try {
      qin.addData(qrows.toIndexedSeq); sq.processAllAvailable()
      val gotS = spark.table("bm25_cdc_search")
        .withColumn("maxv", max("ver").over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id"), col("rank").cast("long"),
          col("neighbor_id"), col("score"))
        .as[(Long, Long, Long, Double)].collect().toSet
      val wantS = TextOps.bm25MoreLikeThis(snapshot2)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("score"))
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(gotS == wantS,
        s"search over the changelog-maintained index diverged: " +
          s"${gotS.diff(wantS).take(5)} vs ${wantS.diff(gotS).take(5)}")
    } finally sq.stop()
  }

  test("legacy append-only dirs stay readable and compactable; " +
      "update/delete into them is refused with a migration message") {
    val dir = java.nio.file.Files.createTempDirectory("bm25legacy").toString
    val docs = graft.Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[DocText].collect().sortBy(_.doc_id).take(20)
    // simulate a PRE-r12 flat-append layout: loose parquet files
    // directly under postings/ (no batch dirs, no ver column), plus
    // top-level terms/stats — exactly what the r11 writer left behind
    val postings = TextOps.bm25Postings(rows.toSeq.toDF("doc_id", "text"))
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
    val (n0, t0) = TextOps.bm25Stats(rows.toSeq.toDF("doc_id", "text"))
    Seq((n0, t0)).toDF("n", "t").write.parquet(s"$dir/stats")

    // reads work on the flat layout (ADVICE r12: no format break)
    val corpus = rows.toSeq.toDF("doc_id", "text")
    assert(servedSet(Bm25IndexView.served(spark, dir))
      == servedSet(TextOps.bm25ServedIndex(corpus)),
      "flat legacy layout no longer serves")

    // mutations are refused with the migration message
    val ex = intercept[IllegalStateException] {
      Bm25IndexView.applyChangelogBatch(
        Seq(DocEvent(rows(0).doc_id, "", "delete", 999L))
          .toDF("doc_id", "text", "event_type", "sequence"), 50L, dir)
    }
    assert(ex.getMessage.contains("legacy append-only"),
      s"wrong refusal message: ${ex.getMessage}")

    // append-only inserts of new unique docs remain correct
    val extra = DocText(999999L, "alpha beta gamma delta")
    Bm25IndexView.applyBatch(Seq(extra).toSeq.toDF("doc_id", "text"), 51L, dir)
    val corpus2 = (rows.toSeq :+ extra).toDF("doc_id", "text")
    assert(servedSet(Bm25IndexView.served(spark, dir))
      == servedSet(TextOps.bm25ServedIndex(corpus2)),
      "append into a legacy dir diverged")

    // compaction folds the legacy zone + the new batch into the v2
    // base and serves identically
    Bm25IndexView.compact(spark, dir)
    assert(servedSet(Bm25IndexView.served(spark, dir))
      == servedSet(TextOps.bm25ServedIndex(corpus2)),
      "legacy fold changed the served index")
    assert(spark.read.parquet(s"$dir/postings_compacted2").count()
      == TextOps.bm25Postings(corpus2).count())
    // still refused after the fold: folding does not catalog legacy docs
    intercept[IllegalStateException] {
      Bm25IndexView.applyChangelogBatch(
        Seq(DocEvent(rows(0).doc_id, "", "delete", 999L))
          .toDF("doc_id", "text", "event_type", "sequence"), 52L, dir)
    }
  }

  test("compaction: folded postings serve row-identically; untouched " +
      "buckets stay byte-identical; re-compaction and crash re-fold are " +
      "no-ops") {
    val dir = java.nio.file.Files.createTempDirectory("bm25compact").toString
    val docs = graft.Tables.documents(spark, sf)
    val rows = docs.select(col("doc_id"), col("text"))
      .as[DocText].collect().sortBy(_.doc_id)
    // ingest three batches through the maintained view's own writer
    rows.grouped((rows.length + 2) / 3).zipWithIndex.foreach { case (c, i) =>
      Bm25IndexView.applyBatch(c.toSeq.toDF("doc_id", "text"), i.toLong, dir)
    }
    val want = Bm25IndexView.served(spark, dir)
      .select("h", "df", "neighbor_id", "dl", "tf")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val wantPostings = spark.read.parquet(s"$dir/postings").count()

    // 1. fold the whole log: served row-identical, log drained
    Bm25IndexView.compact(spark, dir)
    def servedSet() = Bm25IndexView.served(spark, dir)
      .select("h", "df", "neighbor_id", "dl", "tf")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(servedSet() == want, "compaction changed the served index")
    assert(spark.read.parquet(s"$dir/postings_compacted2").count() == wantPostings)
    assert(!new java.io.File(s"$dir/postings").listFiles()
      .exists(_.getName.startsWith("batch=")), "log not drained")

    // 2. re-compaction with an empty log is a no-op (byte-identical base)
    def baseFiles(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/postings_compacted2"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
    }
    val before = baseFiles()
    Bm25IndexView.compact(spark, dir)
    assert(baseFiles() == before, "empty-log compaction rewrote the base")

    // 3. a tiny late batch (one doc -> ONE doc-bucket): only that
    // bucket rewrites, every other bucket stays byte-identical
    val lateId = 999999L
    val late = Seq((lateId, "alpha beta gamma")).toDF("doc_id", "text")
    Bm25IndexView.applyBatch(late, 99L, dir)
    val lateBucket = lateId % Bm25IndexView.CompactBuckets
    Bm25IndexView.compact(spark, dir)
    val after = baseFiles()
    val untouched = before.filterNot(_._1.contains(s"bucket=$lateBucket"))
    assert(untouched.forall { case (f, sig) => after.get(f).contains(sig) },
      "an untouched bucket was rewritten")
    assert(spark.read.parquet(s"$dir/postings_compacted2").count()
      == wantPostings + 1)

    // 4. crash re-fold: a marker-committed batch's partition survived
    // the log cleanup's crash — re-present it and compact again; the
    // (doc_id, h) dedup absorbs it
    TextOps.bm25Postings(late)
      .withColumn("ver", lit(99L))
      .select(col("doc_id"), col("ver"), col("dl"), col("h"), col("tf"))
      .write.parquet(s"$dir/postings/batch=99")
    Bm25IndexView.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/postings_compacted2").count()
      == wantPostings + 1, "crash re-fold duplicated postings")
    assert(servedSet().size == want.size + 1)

    // 5. an UNCOMMITTED batch partition (no marker — the ingest crashed
    // before acknowledging) is NOT folded: the foreachBatch replay owns
    // it (ADVICE r12: folding it would double its rows against the
    // replay's rewrite)
    TextOps.bm25Postings(
        Seq((888888L, "epsilon zeta eta")).toDF("doc_id", "text"))
      .withColumn("ver", lit(100L))
      .select(col("doc_id"), col("ver"), col("dl"), col("h"), col("tf"))
      .write.parquet(s"$dir/postings/batch=100")
    Bm25IndexView.compact(spark, dir)
    assert(new java.io.File(s"$dir/postings/batch=100").exists(),
      "compaction folded an uncommitted batch partition")
    assert(spark.read.parquet(s"$dir/postings_compacted2").count()
      == wantPostings + 1, "uncommitted rows leaked into the base")
  }
}
