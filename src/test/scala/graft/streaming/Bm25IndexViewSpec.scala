package graft.streaming

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The maintained BM25 index: ingest stream in, served index out —
  * row-identical to the batch build over the ingested corpus, replay
  * no-op, and the maintained artifacts serve the search stream with
  * results ≡ the batch `q_bm25`. */
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
    // the per-batch partition Overwrite replaces instead of appending
    // duplicate postings (which would double-count tf in served scores;
    // ADVICE r11). terms/stats markers already read 0 = applied, so
    // only the postings step re-executes, exactly the crash window.
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
    assert(spark.read.parquet(s"$dir/postings_compacted").count() == wantPostings)
    assert(!new java.io.File(s"$dir/postings").listFiles()
      .exists(_.getName.startsWith("batch=")), "log not drained")

    // 2. re-compaction with an empty log is a no-op (byte-identical base)
    def baseFiles(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(s"$dir/postings_compacted"))
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

    // 3. a tiny late batch (one doc, one shingle -> ONE bucket): only
    // that bucket rewrites, every other bucket stays byte-identical
    val late = Seq((999999L, "alpha beta gamma")).toDF("doc_id", "text")
    Bm25IndexView.applyBatch(late, 99L, dir)
    val lateBucket = graft.operators.TextOps
      .bm25Postings(late).select(pmod(col("h"),
        lit(Bm25IndexView.CompactBuckets.toLong))).head().getLong(0)
    Bm25IndexView.compact(spark, dir)
    val after = baseFiles()
    val untouched = before.filterNot(_._1.contains(s"bucket=$lateBucket"))
    assert(untouched.forall { case (f, sig) => after.get(f).contains(sig) },
      "an untouched bucket was rewritten")
    assert(spark.read.parquet(s"$dir/postings_compacted").count()
      == wantPostings + 1)

    // 4. crash re-fold: the log deletion raced a crash — re-present the
    // folded batch and compact again; the (doc_id, h) dedup absorbs it
    graft.operators.TextOps.bm25Postings(late)
      .write.parquet(s"$dir/postings/batch=99")
    Bm25IndexView.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/postings_compacted").count()
      == wantPostings + 1, "crash re-fold duplicated postings")
    assert(servedSet().size == want.size + 1)
  }
}
