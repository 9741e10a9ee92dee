package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class VecEvent(vec_id: Long, embedding: Seq[Float], event_type: String,
    sequence: Long)

/** The maintained residual IVF-PQ code table: vector changelog in,
  * served code table out — row-identical to the batch residual index
  * over the changelog's materialized latest state, replay no-op,
  * era-mismatch refused, compaction physically drops superseded rows,
  * and the maintained artifacts serve the search stream ≡ the batch
  * `q_sim_ivfpq_res`. */
class VecIndexViewSpec extends SparkSpec {
  import spark.implicits._

  private def codeSet(df: DataFrame) =
    df.select(col("vec_id"), col("s").cast("int"), col("j"),
        col("cell_id").cast("long"))
      .as[(Long, Int, Long, Long)].collect().toSet

  test("maintained code table ≡ the batch residual index; " +
      "updates/deletes follow the changelog; late events lose; replay " +
      "and crash-retry no-ops; compaction drops superseded rows " +
      "physically; search over the maintained index ≡ batch " +
      "q_sim_ivfpq_res; retrained-era writer refused") {
    val dir = java.nio.file.Files.createTempDirectory("vecview").toString
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    // the frozen geometry era + the batch index it produced
    val (cells, cbs, batchIdx) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.as[VecRow].collect().sortBy(_.vec_id)

    // ---- batch 0: insert the whole corpus through the changelog
    val b0 = rows.map(r => VecEvent(r.vec_id, r.embedding, "insert",
      r.vec_id + 1))
    val in = MemoryStream[VecEvent](spark)
    val q = in.toDF().writeStream
      .foreachBatch(VecIndexView.changelogWriter(dir, cells, cbs))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("vecview-ckpt").toString)
      .start()
    try { in.addData(b0.toIndexedSeq); q.processAllAvailable() }
    finally q.stop()

    // 1. full-corpus ingest serves ROW-IDENTICAL to the batch build
    // (the pqResIndexFor artifact shape) — the vector side now has the
    // ingest → serve parity BM25 had
    val afterInsert = codeSet(VecIndexView.servedIndex(spark, dir))
    assert(afterInsert == codeSet(batchIdx),
      "full-corpus maintained index diverged from the batch build")

    // 2. search the MAINTAINED index ≡ the batch q_sim_ivfpq_res
    val qrows = rows.filter(_.vec_id < 8)
    val qin = MemoryStream[VecRow](spark)
    val sq = StreamOps.ivfPqSearchStream(qin.toDF(),
      VecIndexView.servedIndex(spark, dir), cells, cbs, k = 5,
      checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("vecview_search")
      .outputMode("append").start()
    try {
      qin.addData(qrows.toIndexedSeq); sq.processAllAvailable()
      val got = spark.table("vecview_search")
        .withColumn("maxv", max("ver").over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
        .where(col("ver") === col("maxv"))
        .select(col("query_id").cast("long"), col("rank").cast("int"),
          col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      val expect = graft.operators.Similarity.qSimIvfPqRes.build(spark, sf)
        .select(col("query_id"), col("rank").cast("int"), col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
      assert(got == expect,
        s"search over maintained index diverged: ${got.diff(expect).take(5)}")
    } finally sq.stop()

    // ---- batch 1: update two vectors (swap their embeddings — both
    // may ROUTE TO DIFFERENT CELLS, the cross-cell marker case),
    // delete two others
    val base = rows.map(_.vec_id).max + 2
    val (va, vb) = (rows(3), rows(5))
    val (vd1, vd2) = (rows(2).vec_id, rows(7).vec_id)
    val b1 = Seq(
      VecEvent(va.vec_id, vb.embedding, "update_after", base),
      VecEvent(vb.vec_id, va.embedding, "update_after", base + 1),
      VecEvent(vd1, Seq.empty, "delete", base + 2),
      VecEvent(vd2, Seq.empty, "delete", base + 3))
    VecIndexView.applyChangelogBatch(
      b1.toDF("vec_id", "embedding", "event_type", "sequence"),
      1L, dir, cells, cbs)
    // batch 2: resurrect vd1 with vb's old embedding; a LATE event for
    // va (stale sequence) that must lose
    val b2 = Seq(
      VecEvent(vd1, vb.embedding, "insert", base + 4),
      VecEvent(va.vec_id, va.embedding, "update_after", 1L))
    VecIndexView.applyChangelogBatch(
      b2.toDF("vec_id", "embedding", "event_type", "sequence"),
      2L, dir, cells, cbs)

    // the materialized latest state
    val snapRows = rows.flatMap { r =>
      r.vec_id match {
        case x if x == va.vec_id => Some(VecRow(x, vb.embedding))
        case x if x == vb.vec_id => Some(VecRow(x, va.embedding))
        case x if x == vd1       => Some(VecRow(x, vb.embedding))
        case x if x == vd2       => None
        case _                   => Some(r)
      }
    }
    val snapshot = snapRows.toSeq.toDF("vec_id", "embedding")
    // batch encode of the snapshot under the SAME frozen era
    val wantCodes = codeSet(
      StreamOps.ivfPqEncodeProj(snapshot, cells, cbs)
        .select(col("vec_id"), col("cell_id"),
          posexplode(col("codes")).as(Seq("s", "j")))
        .select(col("vec_id"), col("s"), col("j"), col("cell_id")))
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == wantCodes,
      "changelog-maintained code table diverged from the snapshot encode")

    // 3. replay (same batchId) and marker-loss crash-retry are no-ops
    VecIndexView.applyChangelogBatch(
      b1.toDF("vec_id", "embedding", "event_type", "sequence"),
      1L, dir, cells, cbs)
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == wantCodes,
      "replay changed the served table")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_codes-batch-1"))
    VecIndexView.applyChangelogBatch(
      b1.toDF("vec_id", "embedding", "event_type", "sequence"),
      1L, dir, cells, cbs)
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == wantCodes,
      "marker-loss re-run changed the served table")
    // cross-batch duplicate delivery under a NEW batchId: all late
    VecIndexView.applyChangelogBatch(
      b2.toDF("vec_id", "embedding", "event_type", "sequence"),
      9L, dir, cells, cbs)
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == wantCodes,
      "cross-batch duplicate delivery changed the served table")

    // 4. compaction: served identical; the base physically holds
    // EXACTLY the snapshot's code rows; log drained
    VecIndexView.compact(spark, dir)
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == wantCodes,
      "compaction changed the served table")
    assert(spark.read.parquet(s"$dir/codes_compacted").count()
      == wantCodes.size, "compacted base retains superseded/deleted rows")
    assert(IndexFiles.listBatchDirs(
      java.nio.file.Paths.get(s"$dir/codes")).isEmpty, "log not drained")

    // 5. post-compact delete: serve follows; re-compact rewrites ONLY
    // the deleted vector's cell partition
    val d9 = snapRows.find(r => r.vec_id != va.vec_id && r.vec_id != vb.vec_id
      && r.vec_id != vd1 && r.vec_id > 8).get
    VecIndexView.applyChangelogBatch(
      Seq(VecEvent(d9.vec_id, Seq.empty, "delete", base + 9))
        .toDF("vec_id", "embedding", "event_type", "sequence"),
      10L, dir, cells, cbs)
    val want2 = wantCodes.filterNot(_._1 == d9.vec_id)
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == want2,
      "post-compact delete not reflected in serve")
    def baseFiles(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$dir/codes_compacted"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
    }
    val filesBefore = baseFiles()
    val d9cell = wantCodes.find(_._1 == d9.vec_id).get._4
    VecIndexView.compact(spark, dir)
    assert(spark.read.parquet(s"$dir/codes_compacted").count()
      == want2.size, "re-compaction kept the deleted vector's rows")
    val untouched = filesBefore.filterNot(_._1.contains(s"cell_id=$d9cell"))
    val after = baseFiles()
    assert(untouched.forall { case (f, sig) => after.get(f).contains(sig) },
      "an untouched cell partition was rewritten by the tombstone fold")

    // 6. a retrained-era writer is REFUSED
    val cbs2 = cbs.map { case (s0, j, cv) => (s0, j, cv.map(_ + 1L)) }
    val ex = intercept[IllegalStateException] {
      VecIndexView.applyChangelogBatch(
        Seq(VecEvent(1L, rows(1).embedding, "insert", base + 20))
          .toDF("vec_id", "embedding", "event_type", "sequence"),
        11L, dir, cells, cbs2)
    }
    assert(ex.getMessage.contains("quantizer era"),
      s"wrong era refusal: ${ex.getMessage}")

    // 7. the search stream over the POST-MUTATION maintained index ≡
    // the same stream over the batch encode of the snapshot (identical
    // static frames by (1); this pins the end-to-end wiring)
    val snapIdx = StreamOps.ivfPqEncodeProj(
        snapshot.where(col("vec_id") =!= d9.vec_id), cells, cbs)
      .select(col("vec_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("s", "j")))
      .select(col("vec_id"), col("s"), col("j"), col("cell_id"))
    def searchOver(idx: DataFrame, name: String): Set[(Long, Int, Long)] = {
      val qin2 = MemoryStream[VecRow](spark)
      val s2 = StreamOps.ivfPqSearchStream(qin2.toDF(), idx, cells, cbs,
        k = 5, checkpointLocation = StreamOps.EphemeralState)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        qin2.addData(qrows.toIndexedSeq); s2.processAllAvailable()
        spark.table(name)
          .withColumn("maxv", max("ver").over(
            org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
          .where(col("ver") === col("maxv"))
          .select(col("query_id").cast("long"), col("rank").cast("int"),
            col("neighbor_id"))
          .as[(Long, Int, Long)].collect().toSet
      } finally s2.stop()
    }
    assert(searchOver(VecIndexView.servedIndex(spark, dir), "vv_maint")
      == searchOver(snapIdx, "vv_batch"),
      "post-mutation search diverged from the batch-encoded snapshot")
  }

  test("hybrid serving from BOTH maintained views: document + vector " +
      "changelogs (with updates and deletes) in, s_hybrid_search over " +
      "the maintained artifacts ≡ the same stream over batch-built " +
      "artifacts of the materialized state") {
    val docs = graft.Tables.documents(spark, sf)
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, _) = graft.operators.Similarity.pqResArtifacts(e)
    val docRows = docs.select(col("doc_id"), col("text"))
      .as[DocText].collect().sortBy(_.doc_id)
    val vecRows = e.as[VecRow].collect().sortBy(_.vec_id)
    def rev(t: String) = t.split(" ").reverse.mkString(" ")

    // mutate BOTH corpora consistently for ids in both domains:
    // update 3, delete 7 (then the queries are ids < 8 minus 7)
    val lexDir = java.nio.file.Files.createTempDirectory("hyb-lex").toString
    val vecDir = java.nio.file.Files.createTempDirectory("hyb-vec").toString
    val base = 1000000L
    Bm25IndexView.applyChangelogBatch(
      docRows.map(r => DocEvent(r.doc_id, r.text, "insert", r.doc_id + 1))
        .toSeq.toDF("doc_id", "text", "event_type", "sequence"),
      0L, lexDir)
    Bm25IndexView.applyChangelogBatch(
      Seq(DocEvent(3L, rev(docRows(3).text), "update_after", base),
          DocEvent(7L, "", "delete", base + 1))
        .toDF("doc_id", "text", "event_type", "sequence"), 1L, lexDir)
    VecIndexView.applyChangelogBatch(
      vecRows.map(r => VecEvent(r.vec_id, r.embedding, "insert", r.vec_id + 1))
        .toSeq.toDF("vec_id", "embedding", "event_type", "sequence"),
      0L, vecDir, cells, cbs)
    VecIndexView.applyChangelogBatch(
      Seq(VecEvent(3L, vecRows(5).embedding, "update_after", base),
          VecEvent(7L, Seq.empty, "delete", base + 1))
        .toDF("vec_id", "embedding", "event_type", "sequence"),
      1L, vecDir, cells, cbs)
    // one compaction each — serving reads the folded bases
    Bm25IndexView.compact(spark, lexDir)
    VecIndexView.compact(spark, vecDir)

    // materialized snapshots
    val snapDocs = docRows.flatMap {
      case r if r.doc_id == 3L => Some(DocText(3L, rev(docRows(3).text)))
      case r if r.doc_id == 7L => None
      case r => Some(r)
    }.toSeq.toDF("doc_id", "text")
    val snapVecs = vecRows.flatMap {
      case r if r.vec_id == 3L => Some(VecRow(3L, vecRows(5).embedding))
      case r if r.vec_id == 7L => None
      case r => Some(r)
    }.toSeq.toDF("vec_id", "embedding")

    val (n, t) = Bm25IndexView.stats(spark, lexDir)
    assert((n, t) == graft.operators.TextOps.bm25Stats(snapDocs))
    val batchLex = graft.operators.TextOps.bm25ServedIndex(snapDocs)
      .localCheckpoint(eager = true)
    val batchVec = StreamOps.ivfPqEncodeProj(snapVecs, cells, cbs)
      .select(col("vec_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("s", "j")))
      .select(col("vec_id"), col("s"), col("j"), col("cell_id"))
      .localCheckpoint(eager = true)

    val qids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L)
    val qrows = snapDocs.where(col("doc_id").isin(qids: _*))
      .join(snapVecs.select(col("vec_id").as("doc_id"), col("embedding")),
        "doc_id")
      .as[(Long, String, Seq[Float])].collect().toSeq
    def serve(lex: DataFrame, vec: DataFrame, name: String)
        : Set[(Long, Long, Long)] = {
      val qin = MemoryStream[(Long, String, Seq[Float])](spark)
      val sq = StreamOps.hybridSearchStream(
        qin.toDF().toDF("doc_id", "text", "embedding"),
        lex, n, t, vec, cells, cbs, k = 5, fuseDepth = 20,
        checkpointLocation = StreamOps.EphemeralState)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        qin.addData(qrows.toIndexedSeq); sq.processAllAvailable()
        spark.table(name)
          .withColumn("maxv", max("ver").over(
            org.apache.spark.sql.expressions.Window.partitionBy("query_id")))
          .where(col("ver") === col("maxv"))
          .select(col("query_id"), col("rank").cast("long"),
            col("neighbor_id"))
          .as[(Long, Long, Long)].collect().toSet
      } finally sq.stop()
    }
    val gotMaint = serve(
      Bm25IndexView.served(spark, lexDir).localCheckpoint(eager = true),
      VecIndexView.servedIndex(spark, vecDir).localCheckpoint(eager = true),
      "hyb_maint")
    val gotBatch = serve(batchLex, batchVec, "hyb_batch")
    assert(gotMaint.nonEmpty && gotMaint == gotBatch,
      s"maintained-artifact hybrid serving diverged: " +
        s"${gotMaint.diff(gotBatch).take(5)} vs ${gotBatch.diff(gotMaint).take(5)}")
    // the deleted doc never surfaces; the updated doc's leaderboard moved
    assert(!gotMaint.exists(_._3 == 7L), "deleted doc served as a neighbor")
  }

  test("cell-split migration: post-split maintained index ≡ a " +
      "from-scratch build at the grown cell set (frozen codebooks); " +
      "untouched cell partitions byte-identical; old-era writers and " +
      "old-era serve checkpoints refused") {
    val dir = java.nio.file.Files.createTempDirectory("vecsplit").toString
    // a CLUSTERED corpus where a split is genuinely local (the fixture's
    // near-uniform embeddings make any new centroid steal members from
    // every cell, which would leave nothing byte-identical to check):
    // 16 anchor directions e_g (the deterministic vec_id<16 seeds) plus
    // 8 members per group at e_g ± 0.2·e_{32+g} — a new seed placed on
    // group 0's MINUS side captures exactly that half-cluster (cosine 1
    // vs ≈0.98 to the anchor) and nothing else.
    val dim = 64
    def vec(hot: Map[Int, Float]): Seq[Float] =
      (0 until dim).map(d => hot.getOrElse(d, 0.0f))
    val anchors = (0 until 16).map(g =>
      VecRow(g.toLong, vec(Map(g -> 1.0f))))
    val members = (0 until 128).map { k =>
      val g = k % 16
      val side = if ((k / 16) % 2 == 0) 0.2f else -0.2f
      VecRow(16L + k, vec(Map(g -> 1.0f, (32 + g) -> side)))
    }
    val rows = (anchors ++ members).toArray
    val e = rows.toSeq.toDF("vec_id", "embedding")
    val (cells, cbs, _) = graft.operators.Similarity.pqResArtifacts(e)
    assert(cells.length == 16)

    // maintain the full corpus, fold it
    VecIndexView.applyChangelogBatch(
      rows.map(r => VecEvent(r.vec_id, r.embedding, "insert", r.vec_id + 1))
        .toSeq.toDF("vec_id", "embedding", "event_type", "sequence"),
      0L, dir, cells, cbs)
    VecIndexView.compact(spark, dir)

    // a serve checkpoint bound to the OLD era, committed once
    val oldCkpt = java.nio.file.Files
      .createTempDirectory("vecsplit-serve").toString
    val qin0 = MemoryStream[VecRow](spark)
    val s0 = StreamOps.ivfPqSearchStream(qin0.toDF(),
      VecIndexView.servedIndex(spark, dir), cells, cbs, k = 5,
      checkpointLocation = oldCkpt)
      .writeStream.format("memory").queryName("vecsplit_old")
      .option("checkpointLocation", oldCkpt)
      .outputMode("append").start()
    try { qin0.addData(rows.take(2).toIndexedSeq); s0.processAllAvailable() }
    finally s0.stop()

    // grow the seed set: the old seeds plus one on group 0's minus side
    // (vec_id 16 + 16 + 0 = the first side=-1 member of group 0)
    val splitSeed = 32L
    val oldSeedIds = cells.map(_._1)
    val newCells = graft.operators.Similarity
      .pqResCellsWithSeeds(e, oldSeedIds :+ splitSeed)
    assert(newCells.length == cells.length + 1)

    def baseFiles(): Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"$dir/codes_compacted"))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p)
          && p.getFileName.toString.endsWith(".parquet"))
        .map(p => p.toString -> (java.nio.file.Files.size(p),
          java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
    }
    val filesBefore = baseFiles()
    val touched = VecIndexView.migrateCellSplit(
      spark, dir, e, cells, newCells, cbs)

    // 1. post-split ≡ from-scratch encode at the new cell set
    val want = codeSet(
      StreamOps.ivfPqEncodeProj(e, newCells, cbs)
        .select(col("vec_id"), col("cell_id"),
          posexplode(col("codes")).as(Seq("s", "j")))
        .select(col("vec_id"), col("s"), col("j"), col("cell_id")))
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == want,
      "post-split index diverged from the from-scratch build")
    // the split is LOCAL: exactly the split cluster's cell and the new
    // cell are touched (geometry makes this exact, not probabilistic)
    assert(touched == Set(0L, splitSeed),
      s"split touched the wrong cells: $touched")

    // 2. untouched cell partitions byte-identical
    val after = baseFiles()
    val untouched = filesBefore.filterNot { case (f, _) =>
      touched.exists(c => f.contains(s"cell_id=$c"))
    }
    assert(untouched.nonEmpty, "no untouched partition survived to check")
    assert(untouched.forall { case (f, sig) => after.get(f).contains(sig) },
      "an untouched cell partition was rewritten")

    // 3. an old-era writer is refused after the swap
    intercept[IllegalStateException] {
      VecIndexView.applyChangelogBatch(
        Seq(VecEvent(rows(1).vec_id, rows(1).embedding, "update_after",
          99999L)).toDF("vec_id", "embedding", "event_type", "sequence"),
        5L, dir, cells, cbs)
    }
    // ...and a new-era writer is accepted (live ingest continues)
    VecIndexView.applyChangelogBatch(
      Seq(VecEvent(rows(1).vec_id, rows(1).embedding, "update_after",
        99999L)).toDF("vec_id", "embedding", "event_type", "sequence"),
      5L, dir, newCells, cbs)
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == want,
      "same-embedding update under the new era changed the table")

    // 4. the OLD serve checkpoint refuses the new geometry
    val qin1 = MemoryStream[VecRow](spark)
    intercept[IllegalStateException] {
      StreamOps.ivfPqSearchStream(qin1.toDF(),
        VecIndexView.servedIndex(spark, dir), newCells, cbs, k = 5,
        checkpointLocation = oldCkpt)
    }
  }

  test("codebook-retrain migration: post-migration index ≡ from-scratch " +
      "encode under the new codebooks; old-era writers and serve " +
      "checkpoints refused both directions; search over the migrated " +
      "index ≡ a fresh-encode serve") {
    val dir = java.nio.file.Files.createTempDirectory("veccbmig").toString
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val (cells, cbs, _) = graft.operators.Similarity.pqResArtifacts(e)
    val rows = e.as[VecRow].collect().sortBy(_.vec_id)

    // a real changelog: insert everything, then update one vector's
    // embedding and delete another — the migration must re-encode the
    // MATERIALIZED state, not the insert history
    VecIndexView.applyChangelogBatch(
      rows.map(r => VecEvent(r.vec_id, r.embedding, "insert", r.vec_id + 1))
        .toSeq.toDF("vec_id", "embedding", "event_type", "sequence"),
      0L, dir, cells, cbs)
    val base = rows.map(_.vec_id).max + 2
    val (vu, vd) = (rows(3), rows(2).vec_id)
    VecIndexView.applyChangelogBatch(
      Seq(VecEvent(vu.vec_id, rows(5).embedding, "update_after", base),
          VecEvent(vd, Seq.empty, "delete", base + 1))
        .toDF("vec_id", "embedding", "event_type", "sequence"),
      1L, dir, cells, cbs)
    val snapRows = rows.flatMap { r =>
      r.vec_id match {
        case x if x == vu.vec_id => Some(VecRow(x, rows(5).embedding))
        case x if x == vd        => None
        case _                   => Some(r)
      }
    }
    val snapshot = snapRows.toSeq.toDF("vec_id", "embedding")

    // an old-era serve checkpoint, committed once
    val oldCkpt = java.nio.file.Files
      .createTempDirectory("veccbmig-serve").toString
    val qin0 = MemoryStream[VecRow](spark)
    val s0 = StreamOps.ivfPqSearchStream(qin0.toDF(),
      VecIndexView.servedIndex(spark, dir), cells, cbs, k = 5,
      checkpointLocation = oldCkpt)
      .writeStream.format("memory").queryName("veccbmig_old")
      .option("checkpointLocation", oldCkpt)
      .outputMode("append").start()
    try { qin0.addData(rows.take(2).toIndexedSeq); s0.processAllAvailable() }
    finally s0.stop()

    // "retrained" codebooks: a deterministic perturbation — a valid
    // quantizer whose nearest-codeword assignments provably move
    val cbs2 = cbs.map { case (s, j, cv) =>
      (s, j, cv.updated(0, cv.head + (j + 1) * 4096L)) }
    def encSet(cb: Seq[(Int, Long, Seq[Long])]) = codeSet(
      StreamOps.ivfPqEncodeProj(snapshot, cells, cb)
        .select(col("vec_id"), col("cell_id"),
          posexplode(col("codes")).as(Seq("s", "j")))
        .select(col("vec_id"), col("s"), col("j"), col("cell_id")))
    val want = encSet(cbs2)
    assert(want != encSet(cbs), "perturbed codebooks moved no codes — " +
      "the fixture proves nothing")

    // a writer already holding the retrained codebooks is refused
    // BEFORE the migration runs (era mismatch, the forward direction)
    intercept[IllegalStateException] {
      VecIndexView.applyChangelogBatch(
        Seq(VecEvent(rows(1).vec_id, rows(1).embedding, "update_after",
          base + 2)).toDF("vec_id", "embedding", "event_type", "sequence"),
        2L, dir, cells, cbs2)
    }

    val kept = VecIndexView.migrateCodebooks(
      spark, dir, snapshot, cells, cbs, cbs2)
    assert(kept.nonEmpty, "migration rewrote no partitions")

    // 1. post-migration ≡ from-scratch encode under the new codebooks
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == want,
      "post-migration index diverged from the from-scratch build")

    // 2. old-era writer refused after the swap; new-era accepted, and a
    // same-embedding update leaves the served set identical
    intercept[IllegalStateException] {
      VecIndexView.applyChangelogBatch(
        Seq(VecEvent(rows(1).vec_id, rows(1).embedding, "update_after",
          base + 3)).toDF("vec_id", "embedding", "event_type", "sequence"),
        3L, dir, cells, cbs)
    }
    VecIndexView.applyChangelogBatch(
      Seq(VecEvent(rows(1).vec_id, rows(1).embedding, "update_after",
        base + 3)).toDF("vec_id", "embedding", "event_type", "sequence"),
      3L, dir, cells, cbs2)
    assert(codeSet(VecIndexView.servedIndex(spark, dir)) == want,
      "same-embedding update under the new era changed the table")

    // 3. the old serve checkpoint refuses the retrained geometry
    val qin1 = MemoryStream[VecRow](spark)
    intercept[IllegalStateException] {
      StreamOps.ivfPqSearchStream(qin1.toDF(),
        VecIndexView.servedIndex(spark, dir), cells, cbs2, k = 5,
        checkpointLocation = oldCkpt)
    }

    // 4. search over the MIGRATED maintained index ≡ the same stream
    // over a from-scratch encoded static frame (both under cbs2)
    val staticIdx = StreamOps.ivfPqEncodeProj(snapshot, cells, cbs2)
      .select(col("vec_id"), col("cell_id"),
        posexplode(col("codes")).as(Seq("s", "j")))
      .select(col("vec_id"), col("s"), col("j"), col("cell_id"))
    def serveOver(idx: org.apache.spark.sql.DataFrame, name: String) = {
      val qin = MemoryStream[VecRow](spark)
      val q = StreamOps.ivfPqSearchStream(qin.toDF(), idx, cells, cbs2,
        k = 5, checkpointLocation = StreamOps.EphemeralState)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        qin.addData(snapRows.filter(_.vec_id < 8).toIndexedSeq)
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name)
        .select(col("query_id").cast("long"), col("rank").cast("int"),
          col("neighbor_id"))
        .as[(Long, Int, Long)].collect().toSet
    }
    val gotServe = serveOver(VecIndexView.servedIndex(spark, dir),
      "veccbmig_migrated")
    val wantServe = serveOver(staticIdx, "veccbmig_fresh")
    assert(gotServe == wantServe,
      s"search over the migrated index diverged: " +
        s"${gotServe.diff(wantServe).take(5)} vs " +
        s"${wantServe.diff(gotServe).take(5)}")
  }
}
