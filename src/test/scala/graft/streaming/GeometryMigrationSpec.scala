package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Mid-life LSH geometry upgrade (VERDICT r9 #4): a long-lived
  * `s_embed_neardup_stream` pinned at its start-time `(bands, bits)`
  * migrates to the batch gate's grown geometry via drain → catch-up
  * diff → seeded resume on a fresh checkpoint ([[LshMigration]]).
  * Contract: zero lost and zero duplicate candidates, and the
  * post-migration stream is candidate-equivalent to the batch gate at
  * the new geometry.
  */
class GeometryMigrationSpec extends SparkSpec {
  import spark.implicits._

  test("drain → catch-up → seeded resume: post-migration candidates ≡ " +
      "the batch gate at the new b; zero lost/duplicate pairs") {
    val all = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val (first, second) = all.splitAt(all.length / 2)
    val dir = Files.createTempDirectory("lsh_migration").toString

    // ---- life at the OLD geometry (the frozen start-time family)
    val oldBits = 10
    val in1 = MemoryStream[(Long, Array[Float])](spark)
    val q1 = StreamOps.embedNeardupStream(
        in1.toDF().toDF("vec_id", "embedding"),
        nBands = Similarity.ndBands(oldBits), nBits = oldBits,
        maxBucket = Int.MaxValue, checkpointLocation = s"$dir/ckpt_v1")
      .writeStream.option("checkpointLocation", s"$dir/ckpt_v1")
      .format("memory").queryName("mig_p1").outputMode("append").start()
    try { in1.addData(first); q1.processAllAvailable() } finally q1.stop()
    val p1 = spark.table("mig_p1").as[(Long, Long)].collect().toSet

    // ---- the corpus outgrew b=10: migrate to the batch gate's b'=12
    val newBits = 12
    val corpus = first.toDF("vec_id", "embedding")

    // the old checkpoint cannot be re-keyed in place — the guard refuses
    intercept[IllegalStateException] {
      StreamOps.embedNeardupStream(in1.toDF().toDF("vec_id", "embedding"),
        nBands = Similarity.ndBands(newBits), nBits = newBits,
        maxBucket = Int.MaxValue, checkpointLocation = s"$dir/ckpt_v1")
    }

    // step 2: catch-up diff — corpus-internal pairs the new family finds
    val catchUp = LshMigration
      .catchUpPairs(corpus, spark.table("mig_p1"), newBits)
      .as[(Long, Long)].collect().toSet

    // step 3: seeded resume on a FRESH checkpoint at the new geometry
    val in2 = MemoryStream[(Long, Array[Float])](spark)
    val q2 = LshMigration.resume(in2.toDF().toDF("vec_id", "embedding"),
        corpus, newBits, s"$dir/ckpt_v2")
      .writeStream.option("checkpointLocation", s"$dir/ckpt_v2")
      .format("memory").queryName("mig_p2").outputMode("append").start()
    try {
      // split the live feed across micro-batches: pairs must span them
      val (s1, s2) = second.splitAt(second.length / 2)
      in2.addData(s1); q2.processAllAvailable()
      in2.addData(s2); q2.processAllAvailable()
    } finally q2.stop()
    val p2 = spark.table("mig_p2").as[(Long, Long)].collect().toSet

    // ---- the contract, against the batch gate at the new geometry
    val batchNew = Similarity.neardupCandidates(
        all.toDF("vec_id", "embedding"), newBits)
      .as[(Long, Long)].collect().toSet
    val firstIds = first.map(_._1).toSet
    val withinFirst = batchNew.filter(p => firstIds(p._1) && firstIds(p._2))

    // post-migration stream ≡ batch gate (every pair involving a live
    // arrival, against the full seeded corpus)
    assert(p2 == batchNew -- withinFirst,
      s"missing=${(batchNew -- withinFirst) -- p2} extra=${p2 -- (batchNew -- withinFirst)}")
    // zero lost: everything the new family finds is delivered by one of
    // the three legs
    assert(batchNew.subsetOf(p1 ++ catchUp ++ p2),
      s"lost=${batchNew -- (p1 ++ catchUp ++ p2)}")
    // zero duplicates: the legs are pairwise disjoint
    assert((p1 & catchUp).isEmpty && (p2 & (p1 ++ catchUp)).isEmpty,
      s"dups=${(p1 & catchUp) ++ (p2 & (p1 ++ catchUp))}")
    // sanity: the upgrade actually changed the family's verdicts
    assert(catchUp.nonEmpty || p1 == withinFirst,
      "fixture produced no geometry-sensitive pairs — weaken nothing, " +
        "pick a fixture where b matters")
  }

  test("IVF centroid migration: historical batch stats ⊕ fresh stream " +
      "equals the stream that saw the whole history (exact monoid merge)") {
    val sf = "/root/testdata/sf0.01"
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    // the NEW centroid set (grown K: 6 seeds instead of 4) — the old
    // checkpoint's geometry guard would reject it; migration recomputes
    val cents = Similarity.quantizedInt8(e).where(col("vec_id") < 6)
      .select(col("vec_id"), col("qv"), col("qn2"))
      .as[(Long, Seq[Long], Long)].collect().toSeq.sortBy(_._1)
    val all = e.as[(Long, Seq[Float])].collect().sortBy(_._1)
    val (first, second) = all.splitAt(all.length / 2)
    // step 2: historical stats in BATCH mode (same transform, new cents)
    val historical = StreamOps.ivfMaintain(
      first.toSeq.toDF("vec_id", "embedding"), cents,
      checkpointLocation = StreamOps.EphemeralState)
    // step 3: fresh stream over the LIVE feed only
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamOps.ivfMaintain(in.toDF().toDF("vec_id", "embedding"),
        cents, checkpointLocation = StreamOps.EphemeralState)
      .writeStream.format("memory").queryName("ivf_mig")
      .outputMode("complete").start()
    try {
      second.grouped(math.max(1, second.length / 2)).foreach { c =>
        in.addData(c.toIndexedSeq); q.processAllAvailable()
      }
      val combined = IvfMigration.combinedStats(
          historical, spark.table("ivf_mig"))
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      // ground truth: the same transform over the WHOLE corpus
      val want = StreamOps.ivfMaintain(
          all.toSeq.toDF("vec_id", "embedding"), cents,
          checkpointLocation = StreamOps.EphemeralState)
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(combined == want && combined.nonEmpty,
        s"monoid merge diverged:\n got=$combined\nwant=$want")
    } finally q.stop()
  }

  test("PQ codebook upgrade: drain → batch re-encode → fresh resume; " +
      "re-encoded ∪ live ≡ the batch encoding under the new codebooks") {
    val all = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val (first, second) = all.splitAt(all.length / 2)
    val firstDf = first.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("pq_migration").toString

    // ---- life under the OLD quantizer (trained on the half corpus)
    val oldCb = Similarity.pqCodebooks(firstDf)
    val in1 = MemoryStream[(Long, Array[Float])](spark)
    val q1 = StreamOps.pqEncodeStream(in1.toDF().toDF("vec_id", "embedding"),
        oldCb, checkpointLocation = s"$dir/ckpt_v1")
      .writeStream.option("checkpointLocation", s"$dir/ckpt_v1")
      .format("memory").queryName("pqmig_p1").outputMode("append").start()
    try { in1.addData(first); q1.processAllAvailable() } finally q1.stop()
    val p1 = spark.table("pqmig_p1").as[(Long, Seq[Long])].collect().toMap
    assert(p1.size == first.size)

    // ---- the quantizer is retrained on the grown corpus
    val newCb = Similarity.pqCodebooks(all.toDF("vec_id", "embedding"))

    // the old checkpoint cannot switch code spaces — the guard refuses
    intercept[IllegalStateException] {
      StreamOps.pqEncodeStream(in1.toDF().toDF("vec_id", "embedding"),
        newCb, checkpointLocation = s"$dir/ckpt_v1")
    }

    // step 2: batch re-encode of the processed corpus (index rebuild)
    val re = PqMigration.reencoded(firstDf, newCb)
      .as[(Long, Seq[Long])].collect().toMap
    // step 3: fresh checkpoint over the LIVE feed only
    val in2 = MemoryStream[(Long, Array[Float])](spark)
    val q2 = PqMigration.resume(in2.toDF().toDF("vec_id", "embedding"),
        newCb, s"$dir/ckpt_v2")
      .writeStream.option("checkpointLocation", s"$dir/ckpt_v2")
      .format("memory").queryName("pqmig_p2").outputMode("append").start()
    try {
      val (s1, s2) = second.splitAt(second.length / 2)
      in2.addData(s1); q2.processAllAvailable()
      in2.addData(s2); q2.processAllAvailable()
    } finally q2.stop()
    val p2 = spark.table("pqmig_p2").as[(Long, Seq[Long])].collect().toMap

    // ---- the contract: the migrated index IS the new-space encoding
    val want = PqMigration.reencoded(all.toDF("vec_id", "embedding"), newCb)
      .as[(Long, Seq[Long])].collect().toMap
    assert((re.keySet & p2.keySet).isEmpty, "legs must partition by vec_id")
    assert(re ++ p2 == want,
      s"mixed/lost codes: got=${(re ++ p2).toSeq.diff(want.toSeq).take(3)} " +
        s"want=${want.toSeq.diff((re ++ p2).toSeq).take(3)}")
    // sanity: the upgrade actually moved codewords — otherwise the
    // fixture proves nothing about era mixing
    assert(re.exists { case (id, cs) => p1(id) != cs },
      "retraining changed no codes — pick a fixture where training data " +
        "matters")
  }

  test("residual IVF-PQ upgrade: cells + codebooks migrate together; " +
      "re-encoded ∪ live ≡ the batch residual index under the new artifacts") {
    val all = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val (first, second) = all.splitAt(all.length / 2)
    val firstDf = first.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("ivfpq_migration").toString

    val (oldCells, oldCb, _) = Similarity.pqResArtifacts(firstDf)
    val in1 = MemoryStream[(Long, Array[Float])](spark)
    val q1 = StreamOps.ivfPqEncodeStream(
        in1.toDF().toDF("vec_id", "embedding"), oldCells, oldCb,
        checkpointLocation = s"$dir/ckpt_v1")
      .writeStream.option("checkpointLocation", s"$dir/ckpt_v1")
      .format("memory").queryName("ivfpqmig_p1").outputMode("append").start()
    try { in1.addData(first); q1.processAllAvailable() } finally q1.stop()
    val p1 = spark.table("ivfpqmig_p1").as[(Long, Long, Seq[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val (newCells, newCb, _) =
      Similarity.pqResArtifacts(all.toDF("vec_id", "embedding"))

    intercept[IllegalStateException] {
      StreamOps.ivfPqEncodeStream(in1.toDF().toDF("vec_id", "embedding"),
        newCells, newCb, checkpointLocation = s"$dir/ckpt_v1")
    }

    val re = PqMigration.reencodedResidual(firstDf, newCells, newCb)
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val in2 = MemoryStream[(Long, Array[Float])](spark)
    val q2 = PqMigration.resumeResidual(
        in2.toDF().toDF("vec_id", "embedding"), newCells, newCb,
        s"$dir/ckpt_v2")
      .writeStream.option("checkpointLocation", s"$dir/ckpt_v2")
      .format("memory").queryName("ivfpqmig_p2").outputMode("append").start()
    try { in2.addData(second); q2.processAllAvailable() } finally q2.stop()
    val p2 = spark.table("ivfpqmig_p2").as[(Long, Long, Seq[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap

    val want = PqMigration
      .reencodedResidual(all.toDF("vec_id", "embedding"), newCells, newCb)
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert((re.keySet & p2.keySet).isEmpty, "legs must partition by vec_id")
    assert(re ++ p2 == want,
      s"mixed/lost rows: got=${(re ++ p2).toSeq.diff(want.toSeq).take(3)} " +
        s"want=${want.toSeq.diff((re ++ p2).toSeq).take(3)}")
    assert(re.exists { case (id, row) => p1(id) != row },
      "new artifacts changed no rows — fixture proves nothing")
  }

  test("tws (RocksDB) path: seeded resume is pair-equivalent to the " +
      "flatMapGroupsWithState path") {
    val all = graft.Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1).toSeq
    val (first, second) = all.splitAt(all.length / 2)
    val corpus = first.toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("lsh_migration_tws").toString
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Array[Float])](spark)
      val q = LshMigration.resume(in.toDF().toDF("vec_id", "embedding"),
          corpus, newBits = 12, s"$dir/ckpt", tws = true)
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .format("memory").queryName("mig_tws").outputMode("append").start()
      try { in.addData(second); q.processAllAvailable() } finally q.stop()
      val pTws = spark.table("mig_tws").as[(Long, Long)].collect().toSet
      val batchNew = Similarity.neardupCandidates(
          all.toDF("vec_id", "embedding"), 12)
        .as[(Long, Long)].collect().toSet
      val firstIds = first.map(_._1).toSet
      assert(pTws == batchNew.filterNot(p => firstIds(p._1) && firstIds(p._2)),
        s"tws pairs diverge from the batch gate")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
