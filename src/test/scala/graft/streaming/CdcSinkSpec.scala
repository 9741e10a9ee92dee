package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Test-only transactional commit fake (the TableSwap seam's second
  * implementation): generations are IMMUTABLE directories and the table
  * path is a SYMLINK atomically repointed at commit — the pointer-swap a
  * transactional table format's metadata commit performs. Readers
  * resolve through the link, so they observe exactly one committed
  * generation; a crash before the pointer move leaves the old
  * generation visible and the orphan staging dir unreachable. */
object TransactionalFakeSwap extends TableSwap {
  val commits = new java.util.concurrent.atomic.AtomicLong
  override def publish(tableDir: String, write: String => Unit): Unit = {
    import java.nio.file.{Files, LinkOption, Paths, StandardCopyOption}
    val dir = Paths.get(tableDir)
    val gen = Paths.get(tableDir + ".gen-" + System.nanoTime())
    write(gen.toString)
    // a pre-existing REAL directory (table created by another swap impl)
    // becomes the retiring generation
    if (Files.exists(dir, LinkOption.NOFOLLOW_LINKS) &&
        !Files.isSymbolicLink(dir))
      Files.move(dir, Paths.get(tableDir + ".gen-pre-" + System.nanoTime()))
    // commit = atomic pointer move (relative target: same parent dir)
    val ptr = Paths.get(tableDir + ".ptr-" + System.nanoTime())
    Files.createSymbolicLink(ptr, gen.getFileName)
    Files.move(ptr, dir, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    commits.incrementAndGet()
  }
}

/** The sink half of the CDC pipeline: changelog stream in, maintained
  * latest-state parquet table out, via foreachBatch + idempotent merge. */
class CdcSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def freshDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory(SparkSpec.localDir.toPath, "cdc-sink-")
    java.nio.file.Files.delete(d)
    d.toString
  }

  test("stream -> foreachBatch sink equals full recompaction of the log") {
    val dir = freshDir()
    val in = MemoryStream[Ev](spark)
    val q = in.toDF().writeStream
      .foreachBatch(CdcSink.writer(dir, "user_id", Seq("ts", "event_id")))
      .start()
    try {
      in.addData(
        Ev(1, 1, ts(0), "insert"), Ev(2, 2, ts(1), "insert"),
        Ev(3, 1, ts(2), "update"))
      q.processAllAvailable()
      in.addData(
        Ev(4, 2, ts(3), "update"), Ev(5, 3, ts(4), "insert"))
      q.processAllAvailable()

      val state = CdcSink.readState(spark, dir)
        .select("user_id", "event_id", "event_type")
        .as[(Long, Long, String)].collect().toSet
      // latest per user across BOTH batches
      assert(state == Set(
        (1L, 3L, "update"), (2L, 4L, "update"), (3L, 5L, "insert")))
    } finally q.stop()
  }

  test("merge is idempotent under batch retry and old-batch replay") {
    val dir = freshDir()
    val newer = Seq(
      Ev(10, 1, ts(5), "update"), Ev(11, 2, ts(6), "update"))
      .toDF()
    val older = Seq(Ev(1, 1, ts(0), "insert")).toDF()

    CdcSink.applyChangelog(newer, dir, "user_id", Seq("ts", "event_id"))
    val after1 = CdcSink.readState(spark, dir).collect().toSet

    // foreachBatch retry: the exact same batch applied again
    CdcSink.applyChangelog(newer, dir, "user_id", Seq("ts", "event_id"))
    assert(CdcSink.readState(spark, dir).collect().toSet == after1)

    // out-of-order replay of an OLDER version must not regress the table
    CdcSink.applyChangelog(older, dir, "user_id", Seq("ts", "event_id"))
    val after3 = CdcSink.readState(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(after3(1L) == 10L, s"older replay regressed user 1: $after3")
  }

  test("wire to table: maxscale-cdc source -> CdcSink materializes state") {
    import graft.sources.MockMaxScaleServer
    import MockMaxScaleServer.{Schema, event}
    val dir = freshDir()
    val srv = new MockMaxScaleServer(Schema, Seq(
      event(1, "insert", 1, "v1"),
      event(2, "insert", 2, "w1"),
      event(3, "update_after", 1, "v2")))
    try {
      val cdc = spark.readStream.format("maxscale-cdc")
        .option("host", "127.0.0.1").option("port", srv.port)
        .option("user", "u").option("password", "p")
        .option("table", "db.t").option("timeoutSeconds", 1)
        .load()
      val q = cdc.writeStream
        .foreachBatch(CdcSink.writer(dir, "id", Seq("sequence")))
        .start()
      try {
        org.scalatest.concurrent.Eventually.eventually(
          org.scalatest.concurrent.Eventually.timeout(
            org.scalatest.time.Span(20, org.scalatest.time.Seconds))) {
          q.processAllAvailable()
          val state = CdcSink.readState(spark, dir)
            .select("id", "name", "event_type")
            .as[(Int, String, String)].collect().toSet
          assert(state == Set(
            (1, "v2", "update_after"), (2, "w1", "insert")))
        }
      } finally q.stop()
    } finally srv.close()
  }

  test("s_scd2: closed versions stream out; late rows never rewrite history") {
    val in = MemoryStream[Ev](spark)
    val hist = StreamOps.scd2History[Long, Ev](
      in.toDS(), _.user_id, _.ts.getTime)
      .map { case (ev, validTo) => (ev.user_id, ev.event_id, validTo) }
    val q = hist.writeStream.format("memory").queryName("s_scd2")
      .outputMode("append").start()
    try {
      in.addData(
        Ev(1, 1, ts(0), "insert"), Ev(2, 1, ts(2), "update"),
        Ev(3, 2, ts(1), "insert"))
      q.processAllAvailable()
      val t1 = spark.table("s_scd2").as[(Long, Long, Long)].collect().toSet
      // user 1's first version closed at ts(2); user 2 still open
      assert(t1 == Set((1L, 1L, ts(2).getTime)))

      in.addData(Ev(4, 1, ts(5), "update"), Ev(5, 2, ts(6), "update"))
      q.processAllAvailable()
      val t2 = spark.table("s_scd2").as[(Long, Long, Long)].collect().toSet
      assert(t2 == Set(
        (1L, 1L, ts(2).getTime), (1L, 2L, ts(5).getTime),
        (2L, 3L, ts(6).getTime)))

      // a LATE row (before user 1's open version) is dropped, not applied
      in.addData(Ev(6, 1, ts(3), "late"))
      q.processAllAvailable()
      assert(spark.table("s_scd2").count() == 3)
    } finally q.stop()
  }

  test("s_scd2 equals the batch q_scd2 closed rows over the same log") {
    import graft.operators.Cdc
    // batch twin over the events table at sf0.001
    val batchClosed = Cdc.qScd2.build(spark, sf)
      .filter(col("is_current") === 0)
      .select("user_id", "event_id", "valid_to_us")
      .as[(Long, Long, Long)].collect().toSet

    val events = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[Ev].collect().toSeq

    // exact epoch-µs (Timestamp.getTime is ms-truncated; nanos carries
    // the full fractional second)
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    val in = MemoryStream[Ev](spark)
    val hist = StreamOps.scd2History[Long, Ev](
      // plain µs versioning matches q_scd2's (ts, event_id) order as
      // long as no user has two events in the same µs — asserted below
      in.toDS(), _.user_id, e => micros(e.ts))
      .map { case (ev, validTo) => (ev.user_id, ev.event_id, validTo) }
    val dup = events.groupBy(e => (e.user_id, micros(e.ts)))
      .count(_._2.size > 1)
    assert(dup == 0, s"$dup same-µs collisions; fixture assumption broken")

    val q = hist.writeStream.format("memory").queryName("s_scd2_eq")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("s_scd2_eq")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batchClosed)
    } finally q.stop()
  }

  test("s_scd2 on transformWithState/RocksDB: closed rows equal the fmgs twin " +
      "and the batch q_scd2; one state row per key") {
    import graft.operators.Cdc
    val prevConf = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val batchClosed = Cdc.qScd2.build(spark, sf)
      .filter(col("is_current") === 0)
      .select("user_id", "event_id", "valid_to_us")
      .as[(Long, Long, Long)].collect().toSet
    val events = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .as[Ev].collect().toSeq
    def micros(t: Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    val in = MemoryStream[Ev](spark)
    val hist = StreamOps.scd2HistoryTws[Long, Ev](
      in.toDS(), _.user_id, e => micros(e.ts))
      .map { case (ev, validTo) => (ev.user_id, ev.event_id, validTo) }
    val q = hist.writeStream.format("memory").queryName("s_scd2_tws")
      .outputMode("append").start()
    try {
      // two batches so the open version actually rides the RocksDB store
      val (b1, b2) = events.splitAt(events.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("s_scd2_tws")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batchClosed,
        s"tws scd2 diverged: extra=${streamed.diff(batchClosed).take(5)} " +
          s"missing=${batchClosed.diff(streamed).take(5)}")
      // state footprint: exactly the open version — one row per key
      val nKeys = events.map(_.user_id).distinct.size
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      info(s"state rows: $stateRows for $nKeys keys")
      assert(stateRows <= nKeys,
        s"state ($stateRows rows) exceeds one open version per key ($nKeys)")
    } finally {
      q.stop()
      prevConf match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("delete events tombstone their key; an older delete cannot resurrect") {
    val dir = freshDir()
    val del = Some(col("event_type") === "delete")
    CdcSink.applyChangelog(
      Seq(Ev(1, 1, ts(0), "insert"), Ev(2, 2, ts(1), "insert")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), del)
    // delete user 1, then re-insert user 1 later; replay an OLD delete last
    CdcSink.applyChangelog(
      Seq(Ev(3, 1, ts(2), "delete"), Ev(4, 2, ts(3), "update")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), del)
    val afterDelete = CdcSink.readState(spark, dir)
      .select("user_id").as[Long].collect().toSet
    assert(afterDelete == Set(2L), "deleted key still present")

    // replayed OLDER insert must NOT resurrect the deleted key — the
    // retained tombstone is what it loses against
    CdcSink.applyChangelog(
      Seq(Ev(1, 1, ts(0), "insert")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), del)
    assert(CdcSink.readState(spark, dir)
      .select("user_id").as[Long].collect().toSet == Set(2L),
      "replayed old insert resurrected a deleted key")

    CdcSink.applyChangelog(
      Seq(Ev(5, 1, ts(5), "insert")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), del)
    // old delete (before the re-insert) replayed: must NOT kill user 1
    CdcSink.applyChangelog(
      Seq(Ev(3, 1, ts(2), "delete")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), del)
    val state = CdcSink.readState(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(state == Map(1L -> 5L, 2L -> 4L))
  }

  test("compact bin-packs many small files; content and tombstones preserved") {
    val dir = freshDir()
    // a fragmented table (e.g. merge parallelism x many bucket rewrites)
    // with one tombstoned key
    (1 to 6).map(i => Ev(i.toLong, i.toLong, ts(i), "insert")).toDF()
      .withColumn("__tombstone", col("user_id") === 3)
      .repartition(6)
      .write.parquet(dir)
    val before = CdcSink.readState(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(before.size == 5) // tombstoned key hidden
    import scala.jdk.CollectionConverters._
    def nParquet() = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
    assert(nParquet() > 1)

    CdcSink.compact(spark, dir) // tiny table -> one target file
    assert(nParquet() == 1, s"expected 1 file after compaction, got ${nParquet()}")
    assert(CdcSink.readState(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet == before)
    // the tombstone survived compaction (still guards replays)
    assert(spark.read.parquet(dir).where(col("__tombstone")).count() == 1)
  }

  test("purgeTombstones reclaims deleted keys; visible state unchanged") {
    val dir = freshDir()
    val del = Some(col("event_type") === "delete")
    CdcSink.applyChangelog(
      Seq(Ev(1, 1, ts(0), "insert"), Ev(2, 2, ts(1), "insert"),
        Ev(3, 1, ts(2), "delete")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), del)
    // tombstone physically present, invisible to readers
    assert(spark.read.parquet(dir).count() == 2)
    assert(CdcSink.readState(spark, dir).count() == 1)
    CdcSink.purgeTombstones(spark, dir)
    assert(spark.read.parquet(dir).count() == 1)
    assert(CdcSink.readState(spark, dir)
      .select("user_id").as[Long].collect().toSet == Set(2L))
  }

  test("bucketed merge rewrites only touched buckets, leaves the rest byte-identical") {
    val dir = freshDir()
    val n = 4
    // batch 1: enough keys to populate several buckets
    val b1 = (1L to 40L).map(k => Ev(k, k, ts(0), "insert")).toDF()
    CdcSink.applyChangelogBucketed(b1, dir, "user_id", Seq("ts", "event_id"), n)

    import scala.jdk.CollectionConverters._
    def bucketFiles(): Map[String, Set[(String, Long)]] =
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("__bucket="))
        .map { p =>
          p.getFileName.toString ->
            java.nio.file.Files.list(p).iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .map(f => (f.getFileName.toString,
                java.nio.file.Files.getLastModifiedTime(f).toMillis)).toSet
        }.toMap
    val before = bucketFiles()
    assert(before.size > 1, s"want >1 bucket dirs, got ${before.keySet}")

    // batch 2: a single key -> exactly one bucket touched
    val b2 = Seq(Ev(100L, 7L, ts(5), "update")).toDF()
    CdcSink.applyChangelogBucketed(b2, dir, "user_id", Seq("ts", "event_id"), n)
    val after = bucketFiles()

    val touched = before.keySet.filter(k => before(k) != after.getOrElse(k, Set()))
    assert(touched.size == 1, s"expected 1 rewritten bucket, got $touched")

    // state is still exactly the latest row per key
    val state = CdcSink.readBucketedState(spark, dir)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(state(7L) == 100L)
    assert(state.size == 40)
    assert((1L to 40L).filter(_ != 7L).forall(k => state(k) == k))
  }

  test("bucketed and whole-table merges agree") {
    val dirA = freshDir(); val dirB = freshDir()
    val batches = Seq(
      (1L to 20L).map(k => Ev(k, k % 7, ts(k.toInt % 50), "e")).toDF(),
      (21L to 30L).map(k => Ev(k, k % 5, ts((k.toInt % 40) + 5), "e")).toDF())
    batches.foreach { b =>
      CdcSink.applyChangelog(b, dirA, "user_id", Seq("ts", "event_id"))
      CdcSink.applyChangelogBucketed(b, dirB, "user_id", Seq("ts", "event_id"), 4)
    }
    val a = CdcSink.readState(spark, dirA)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val b = CdcSink.readBucketedState(spark, dirB)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("compact and purge preserve the hash-bucket layout") {
    val dir = freshDir()
    val del = Some(col("event_type") === "delete")
    CdcSink.applyChangelogBucketed(
      (1L to 20L).map(k => Ev(k, k, ts(0), "insert")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), 4, del)
    CdcSink.applyChangelogBucketed(
      Seq(Ev(21, 5, ts(3), "delete")).toDF(),
      dir, "user_id", Seq("ts", "event_id"), 4, del)
    import scala.jdk.CollectionConverters._
    def bucketDirs() = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("__bucket=")).toSet
    val layout = bucketDirs()
    assert(layout.nonEmpty)

    CdcSink.compact(spark, dir)
    assert(bucketDirs() == layout, "compaction flattened the bucket layout")
    assert(CdcSink.readBucketedState(spark, dir).count() == 19)

    CdcSink.purgeTombstones(spark, dir)
    assert(bucketDirs().subsetOf(layout), "purge flattened the bucket layout")
    assert(CdcSink.readBucketedState(spark, dir).count() == 19)
    assert(spark.read.parquet(dir).count() == 19) // tombstone physically gone
  }

  test("TableSwap seam: the retry/replay/delete idempotence matrix holds " +
      "under BOTH publication protocols (rename swap + transactional fake)") {
    val del = Some(col("event_type") === "delete")
    for (swap <- Seq[(String, TableSwap)](
        "rename" -> RenameSwap, "transactional" -> TransactionalFakeSwap)) {
      val (label, impl) = swap
      val dir = freshDir()
      def apply(evs: Ev*): Unit = CdcSink.applyChangelog(
        evs.toDF(), dir, "user_id", Seq("ts", "event_id"), del, impl)
      def state(): Map[Long, Long] = CdcSink.readState(spark, dir)
        .select("user_id", "event_id").as[(Long, Long)].collect().toMap

      apply(Ev(10, 1, ts(5), "update"), Ev(11, 2, ts(6), "update"))
      val after1 = state()
      assert(after1 == Map(1L -> 10L, 2L -> 11L), s"[$label] $after1")

      // foreachBatch retry: the exact same batch applied again
      apply(Ev(10, 1, ts(5), "update"), Ev(11, 2, ts(6), "update"))
      assert(state() == after1, s"[$label] retry changed the table")

      // out-of-order replay of an OLDER version must not regress
      apply(Ev(1, 1, ts(0), "insert"))
      assert(state()(1L) == 10L, s"[$label] older replay regressed user 1")

      // delete tombstones; a replayed older insert cannot resurrect
      apply(Ev(12, 1, ts(7), "delete"))
      assert(state().keySet == Set(2L), s"[$label] delete not applied")
      apply(Ev(1, 1, ts(0), "insert"))
      assert(state().keySet == Set(2L),
        s"[$label] replayed old insert resurrected a deleted key")
    }
    // the fake really committed via the pointer swap, every generation
    assert(TransactionalFakeSwap.commits.get() >= 5)
  }

  test("transactional fake's pointer swap is observable: the table path " +
      "is a symlink to an immutable committed generation") {
    val dir = freshDir()
    CdcSink.applyChangelog(
      Seq(Ev(1, 1, ts(0), "insert")).toDF(), dir, "user_id",
      Seq("ts", "event_id"), None, TransactionalFakeSwap)
    val p = java.nio.file.Paths.get(dir)
    assert(java.nio.file.Files.isSymbolicLink(p), "table path is not a pointer")
    val gen1 = java.nio.file.Files.readSymbolicLink(p).toString
    assert(CdcSink.readState(spark, dir).count() == 1)

    CdcSink.applyChangelog(
      Seq(Ev(2, 2, ts(1), "insert")).toDF(), dir, "user_id",
      Seq("ts", "event_id"), None, TransactionalFakeSwap)
    val gen2 = java.nio.file.Files.readSymbolicLink(p).toString
    assert(gen1 != gen2, "commit did not advance the generation pointer")
    assert(CdcSink.readState(spark, dir).count() == 2)
    // the retired generation is still intact (immutable history — what a
    // transactional format's time travel reads)
    assert(java.nio.file.Files.exists(
      p.getParent.resolve(gen1)), "retired generation was mutated/deleted")
  }

  test("swap is atomic-ish: a table always exists after the first batch") {
    val dir = freshDir()
    CdcSink.applyChangelog(
      Seq(Ev(1, 1, ts(0), "insert")).toDF(), dir, "user_id",
      Seq("ts", "event_id"))
    // no .next-/.old- residue after a clean apply
    val parent = java.nio.file.Paths.get(dir).getParent
    import scala.jdk.CollectionConverters._
    val residue = java.nio.file.Files.list(parent).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.contains(".next-") || n.contains(".old-")).toList
    assert(residue.isEmpty, s"leftover swap dirs: $residue")
    assert(CdcSink.readState(spark, dir).count() == 1)
  }
}
