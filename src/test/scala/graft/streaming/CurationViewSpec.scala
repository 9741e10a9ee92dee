package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class DocRow(doc_id: Long, text: String, lang: String, source: String,
    n_chars: Long)

/** The end-to-end maintained curation table: documents stream in, the
  * q_dedup_verdict table is continuously maintained and always equals
  * the batch verdict over everything seen so far. */
class CurationViewSpec extends SparkSpec {
  import spark.implicits._

  private def docRows = graft.Tables.documents(spark, sf)
    .as[DocRow].collect().sortBy(_.doc_id)

  test("maintained verdicts equal the batch q_dedup_verdict over the union") {
    val base = java.nio.file.Files.createTempDirectory("graft-curation").toFile
    try {
      val in = MemoryStream[DocRow](spark)
      val q = in.toDF().writeStream
        .foreachBatch(CurationView.writer(base.getAbsolutePath))
        .outputMode("append").start()
      try {
        val chunks = docRows.grouped((docRows.length + 2) / 3).toSeq
        chunks.zipWithIndex.foreach { case (c, i) =>
          in.addData(c.toIndexedSeq)
          q.processAllAvailable()
          // after every batch the view covers exactly the docs so far
          val view = CurationView.readVerdicts(spark, base.getAbsolutePath)
          val seen = chunks.take(i + 1).flatten.map(_.doc_id).toSet
          assert(view.select("doc_id").as[Long].collect().toSet == seen,
            s"batch $i: view does not cover the delivered docs")
        }
        // final view ≡ the DECLARED batch query (which routes through the
        // dir-bound oracle-matched label pipeline — so this also pins
        // labelsFrom ≡ clusterLabels)
        val got = CurationView.readVerdicts(spark, base.getAbsolutePath)
          .as[(Long, Boolean, Boolean, Boolean, String)].collect().toSet
        val expect = graft.operators.TextOps.qDedupVerdict.build(spark, sf)
          .as[(Long, Boolean, Boolean, Boolean, String)].collect().toSet
        assert(got == expect,
          s"extra=${got.diff(expect).take(5)} missing=${expect.diff(got).take(5)}")
        // replaying an already-applied batch is a no-op
        val before = got
        CurationView.applyBatch(
          chunks.head.toSeq.toDF(), batchId = 0L, base.getAbsolutePath)
        val after = CurationView.readVerdicts(spark, base.getAbsolutePath)
          .as[(Long, Boolean, Boolean, Boolean, String)].collect().toSet
        assert(after == before, "replay must not change the view")
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }

  test("cdc source -> CurationView: changelog in, curated corpus out") {
    import graft.sources.MockMaxScaleServer
    import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
    import org.scalatest.time.{Seconds, Span}
    // the full Layer A → Layer B story: a documents table's changelog
    // arrives over the wire protocol and the maintained verdict table
    // curates it — exact dup, near-dup cluster, benchmark contamination
    val docsSchema =
      """{"namespace":"MaxScaleChangeDataSchema.avro","type":"record","name":"ChangeRecord","fields":[
        |{"name":"domain","type":"int","real_type":"int","length":-1},
        |{"name":"server_id","type":"int","real_type":"int","length":-1},
        |{"name":"sequence","type":"int","real_type":"int","length":-1},
        |{"name":"event_number","type":"int","real_type":"int","length":-1},
        |{"name":"timestamp","type":"int","real_type":"int","length":-1},
        |{"name":"event_type","type":"string","real_type":"varchar","length":32},
        |{"name":"doc_id","type":"int","real_type":"int","length":-1},
        |{"name":"text","type":"string","real_type":"varchar","length":256},
        |{"name":"lang","type":"string","real_type":"varchar","length":8},
        |{"name":"source","type":"string","real_type":"varchar","length":16},
        |{"name":"n_chars","type":"int","real_type":"int","length":-1}
        |]}""".stripMargin.replace("\n", "")
    def doc(seq: Long, id: Int, text: String): String =
      s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
        s""""timestamp":${1700000000 + seq},"event_type":"insert","doc_id":$id,""" +
        s""""text":"$text","lang":"en","source":"src0","n_chars":${text.length}}"""
    val dup = "the quick brown fox jumps over the lazy dog today"
    val benchText = "held out benchmark span one two three four five six"
    val contamText = "prefix words then benchmark span one two three four stolen"
    val srv = new MockMaxScaleServer(docsSchema, Seq(
      doc(1, 1, dup),
      doc(2, 2, dup), // exact duplicate, higher id
      doc(3, 3, "an entirely different document about spark engines and scale"),
      doc(4, 29, benchText), // 29 % 29 == 0: the benchmark doc
      doc(5, 5, contamText))) // shares the 5-gram "span one two three four"
    val base = java.nio.file.Files.createTempDirectory("graft-cdc-curation").toFile
    try {
      val cdc = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.docs").option("timeoutSeconds", 1)
        .load()
      val q = cdc
        .select(col("doc_id").cast("long"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("long"))
        .writeStream
        .foreachBatch(CurationView.writer(base.getAbsolutePath))
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          val v = CurationView.readVerdicts(spark, base.getAbsolutePath)
            .as[(Long, Boolean, Boolean, Boolean, String)].collect()
            .map(t => t._1 -> t._5).toMap
          assert(v.keySet == Set(1L, 2L, 3L, 5L, 29L), s"got $v")
          assert(v(1L) == "keep", s"first copy keeps: $v")
          assert(v(2L) == "drop_exact", s"second copy drops: $v")
          assert(v(3L) == "keep", s"unique doc keeps: $v")
          assert(v(5L) == "drop_contam", s"benchmark leak drops: $v")
          assert(v(29L) == "keep", s"the benchmark doc itself keeps: $v")
        }
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(base)
    }
  }

  test("migration capstone: bootstrap snapshot seeds the verdict table, " +
      "the follow stream curates the seam and beyond — view ≡ batch " +
      "verdict over the union") {
    import graft.sources.MockMaxScaleServer
    import graft.sources.cdc.CdcBootstrap
    import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
    import org.scalatest.time.{Seconds, Span}
    // the full switch-over story a consumer of the reference walks: the
    // existing corpus arrives as ONE bounded batch pull (snapshot), live
    // traffic follows on the stream that starts exactly at the anchor —
    // and the maintained verdict table must equal the batch
    // q_dedup_verdict semantics over snapshot ∪ stream, including docs
    // that land in the anchor/stream seam.
    val docsSchema =
      """{"namespace":"MaxScaleChangeDataSchema.avro","type":"record","name":"ChangeRecord","fields":[
        |{"name":"domain","type":"int","real_type":"int","length":-1},
        |{"name":"server_id","type":"int","real_type":"int","length":-1},
        |{"name":"sequence","type":"int","real_type":"int","length":-1},
        |{"name":"event_number","type":"int","real_type":"int","length":-1},
        |{"name":"timestamp","type":"int","real_type":"int","length":-1},
        |{"name":"event_type","type":"string","real_type":"varchar","length":32},
        |{"name":"doc_id","type":"int","real_type":"int","length":-1},
        |{"name":"text","type":"string","real_type":"varchar","length":256},
        |{"name":"lang","type":"string","real_type":"varchar","length":8},
        |{"name":"source","type":"string","real_type":"varchar","length":16},
        |{"name":"n_chars","type":"int","real_type":"int","length":-1}
        |]}""".stripMargin.replace("\n", "")
    def doc(seq: Long, id: Int, text: String): String =
      s"""{"domain":0,"server_id":1,"sequence":$seq,"event_number":1,""" +
        s""""timestamp":${1700000000 + seq},"event_type":"insert","doc_id":$id,""" +
        s""""text":"$text","lang":"en","source":"src0","n_chars":${text.length}}"""
    val dup = "the quick brown fox jumps over the lazy dog again today"
    val benchText = "held out benchmark span one two three four five six"
    // history half: an exact-dup pair, a unique doc, the benchmark doc
    val srv = new MockMaxScaleServer(docsSchema, Seq(
      doc(1, 1, dup),
      doc(2, 2, dup),
      doc(3, 3, "an entirely different document about spark engines and scale"),
      doc(4, 29, benchText)))
    val base = java.nio.file.Files.createTempDirectory("graft-capstone-cur").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft-capstone-ckpt")
    try {
      val opts = Map(
        "host" -> "127.0.0.1", "port" -> srv.port.toString,
        "user" -> "u", "password" -> "p",
        "table" -> "db.docs", "timeoutSeconds" -> "1")
      val (snapshot, follow) = CdcBootstrap.snapshotAndFollow(spark, opts)
      // the seam moment: live traffic lands after the anchor was chosen —
      // a third copy of the dup text and a benchmark-contaminated doc,
      // both of which must flow through the STREAM, exactly once
      val contamText = "prefix words then benchmark span one two three four stolen"
      srv.push(doc(5, 5, contamText))
      srv.push(doc(6, 6, dup))

      def curationCols(df: org.apache.spark.sql.DataFrame) =
        df.select(col("doc_id").cast("long"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("long"))

      // history, exactly once: the snapshot seeds the verdict table
      CurationView.applyBatch(curationCols(snapshot), batchId = -1L,
        base.getAbsolutePath)
      val seeded = CurationView.readVerdicts(spark, base.getAbsolutePath)
        .as[(Long, Boolean, Boolean, Boolean, String)].collect()
        .map(t => t._1 -> t._5).toMap
      assert(seeded == Map(1L -> "keep", 2L -> "drop_exact",
        3L -> "keep", 29L -> "keep"), s"seeded=$seeded")

      val q = curationCols(follow).writeStream
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch(CurationView.writer(base.getAbsolutePath))
        .outputMode("append").start()
      try {
        eventually(timeout(Span(30, Seconds)), interval(Span(1, Seconds))) {
          q.processAllAvailable()
          val v = CurationView.readVerdicts(spark, base.getAbsolutePath)
            .as[(Long, Boolean, Boolean, Boolean, String)].collect()
            .map(t => t._1 -> t._5).toMap
          assert(v.keySet == Set(1L, 2L, 3L, 5L, 6L, 29L), s"got $v")
          assert(v(5L) == "drop_contam", s"seam contamination drops: $v")
          assert(v(6L) == "drop_exact", s"seam third copy drops: $v")
        }
        // exactly-once across the seam: the accumulated doc log holds each
        // doc exactly once (an overlap would also corrupt dup verdicts)
        val log = spark.read.parquet(s"${base.getAbsolutePath}/docs")
        assert(log.count() == 6 &&
          log.select("doc_id").distinct().count() == 6)
        // the maintained view ≡ the batch verdict over snapshot ∪ stream
        val union = curationCols(snapshot).unionByName(
          spark.read.parquet(s"${base.getAbsolutePath}/docs")
            .where(col("doc_id").isin(5L, 6L)))
        val expect = graft.operators.TextOps.dedupVerdictFrom(
          union, graft.operators.TextOps.labelsFrom(union))
          .as[(Long, Boolean, Boolean, Boolean, String)].collect().toSet
        val got = CurationView.readVerdicts(spark, base.getAbsolutePath)
          .as[(Long, Boolean, Boolean, Boolean, String)].collect().toSet
        assert(got == expect,
          s"extra=${got.diff(expect).take(5)} missing=${expect.diff(got).take(5)}")
      } finally q.stop()
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteDirectory(base)
      org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    }
  }

  test("a late benchmark arrival retroactively contaminates an older doc") {
    val base = java.nio.file.Files.createTempDirectory("graft-curation3").toFile
    try {
      val in = MemoryStream[DocRow](spark)
      val q = in.toDF().writeStream
        .foreachBatch(CurationView.writer(base.getAbsolutePath))
        .outputMode("append").start()
      try {
        def verdicts() = CurationView
          .readVerdicts(spark, base.getAbsolutePath)
          .as[(Long, Boolean, Boolean, Boolean, String)].collect()
          .map(t => t._1 -> t._5).toMap
        val leaked = "alpha beta gamma delta epsilon zeta eta theta"
        // batch 1: a normal doc — clean, kept
        in.addData(DocRow(5L, s"prefix $leaked suffix words", "en", "src0", 40L))
        q.processAllAvailable()
        assert(verdicts()(5L) == "keep")
        // batch 2: the BENCHMARK doc (id % 29 == 0) sharing a 5-gram
        // arrives later — the old doc must flip to drop_contam, which
        // only a global recompute can do
        in.addData(DocRow(29L, s"held out $leaked benchmark", "en", "src1", 40L))
        q.processAllAvailable()
        val v = verdicts()
        assert(v(29L) == "keep", s"benchmark doc keeps: $v")
        assert(v(5L) == "drop_contam",
          s"older doc must flip once the benchmark lands: $v")
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }

  test("a late arrival can demote an existing representative (global recompute)") {
    val base = java.nio.file.Files.createTempDirectory("graft-curation2").toFile
    try {
      val in = MemoryStream[DocRow](spark)
      val q = in.toDF().writeStream
        .foreachBatch(CurationView.writer(base.getAbsolutePath))
        .outputMode("append").start()
      try {
        // batch 1: one doc, trivially kept
        val text = (1 to 30).map(i => s"tok$i").mkString(" ")
        in.addData(DocRow(100L, text, "en", "src0", text.length.toLong))
        q.processAllAvailable()
        val v1 = CurationView.readVerdicts(spark, base.getAbsolutePath)
          .as[(Long, Boolean, Boolean, Boolean, String)].collect()
          .map(t => t._1 -> t._5).toMap
        assert(v1(100L) == "keep")
        // batch 2: a LONGER near-duplicate arrives (same shingles + tail)
        val longer = text + " extra trailing tokens here"
        in.addData(DocRow(200L, longer, "en", "src0", longer.length.toLong))
        q.processAllAvailable()
        val v2 = CurationView.readVerdicts(spark, base.getAbsolutePath)
          .as[(Long, Boolean, Boolean, Boolean, String)].collect()
          .map(t => t._1 -> t._5).toMap
        // the longer doc takes the representative slot; the old keeper is
        // demoted — exactly what per-key state could never do
        assert(v2(200L) == "keep", s"longer near-dup should win: $v2")
        assert(v2(100L) == "drop_neardup", s"old keeper should demote: $v2")
      } finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(base)
  }
}
