package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** sf1-scale STREAMING soak (VERDICT r9 #2): drive a 10× changelog
  * through the maintained-view sinks and the RocksDB/tws stateful twins,
  * recording rows/s, per-batch cost, and state size per micro-batch —
  * the streaming counterpart of the batch growth audit. The batch audit
  * measures queries; this measures the accumulate-and-maintain loops
  * whose cost is a function of TOTAL STATE, not batch size (recompute-
  * per-batch views) or that hold corpus-shaped state (LSH buckets,
  * semantic cells).
  *
  * Run: `SPARK_GRAFT_STREAM_SF_DIR=target/sf1 sbt "runMain
  * graft.BenchStream"` — writes `bench_stream_out.json` and prints a
  * compact summary as the final stdout line. State-bound invariants
  * (state rows ≤ admissions; ≤ cap × buckets) are ASSERTED, not just
  * recorded — a violated bound fails the run loudly.
  */
object BenchStream {

  private def timeIt[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def dirBytes(p: String): Long = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) return -1L
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(f => java.nio.file.Files.size(f)).sum
  }

  /** State rows via Spark's state-store reader; -1 when the layout is
    * not readable that way (diagnostic only — the asserted bounds use
    * it when available). */
  private def stateRows(spark: SparkSession, ckpt: String,
      stateVar: String = null): Long =
    try {
      var r = spark.read.format("statestore")
      if (stateVar != null) r = r.option("stateVarName", stateVar)
      r.load(ckpt).count()
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_STREAM_SF_DIR", "target/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft_bench_stream").toString
    val out = new StringBuilder
    def section(name: String, fields: (String, String)*): Unit = {
      out.append(s""""$name":{""")
        .append(fields.map { case (k, v) => s""""$k":$v""" }.mkString(","))
        .append("},")
      // progress line per section so a stalled soak names its stage
      System.err.println(s"[bench-stream] $name done: " +
        fields.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    def f(d: Double) = "%.3f".format(d)
    def batchSecs(ts: Seq[Double]) = "[" + ts.map(f).mkString(",") + "]"
    // Optional comma-separated SECTION filter (diagnostic isolation —
    // a flagged soak metric must be re-measurable in a fresh JVM
    // without paying the whole 15-min soak; the recorded per-round
    // capture always runs all sections). Names: cdc_sink,
    // curation_view, dedup_cluster_view, neardup_stream,
    // semantic_dedup, bm25, hybrid (incl. mmr), rerank (incl.
    // index_health).
    val onlySections = sys.env.get("SPARK_GRAFT_STREAM_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    def sectionOn(name: String): Boolean =
      onlySections.forall(_.contains(name))

    // ---------------------------------------------------- s_cdc_sink
    // the 10x changelog: 1M events as (sequence, event_type, id, value)
    // upserts keyed by user id — CdcSink merges + swaps per micro-batch
    if (sectionOn("cdc_sink")) locally {
      val rows = graft.Tables.events(spark, sfDir)
        .select(col("event_id").cast("long"), col("event_type"),
          col("user_id").cast("long"), col("value").cast("double"))
        .as[(Long, String, Long, Double)].collect()
      val dir = s"$work/cdc_sink"
      val in = MemoryStream[(Long, String, Long, Double)](spark)
      val q = in.toDF().toDF("sequence", "event_type", "id", "value")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(graft.streaming.CdcSink.writer(
          s"$dir/state", keyCol = "id", orderCols = Seq("sequence")))
        .start()
      val perBatch = try rows.grouped(100000).map { chunk =>
        in.addData(chunk.toIndexedSeq)
        timeIt(q.processAllAvailable())._2
      }.toSeq finally q.stop()
      val keys = graft.streaming.CdcSink.readState(spark, s"$dir/state").count()
      section("cdc_sink",
        "rows" -> rows.length.toString,
        "rows_per_sec" -> "%.0f".format(rows.length / perBatch.sum),
        "batch_secs" -> batchSecs(perBatch),
        "state_keys" -> keys.toString,
        "state_bytes" -> dirBytes(s"$dir/state").toString)
    }

    // ------------------------------------------------ s_curation_view
    // recompute-per-batch maintained verdict table over the doc log:
    // per-batch cost grows with TOTAL docs — the measured recompute curve
    if (sectionOn("curation_view")) locally {
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("long"), col("text"), col("lang"),
          col("source"), col("n_chars").cast("long"))
        .as[(Long, String, String, String, Long)].collect()
      val dir = s"$work/curation"
      val in = MemoryStream[(Long, String, String, String, Long)](spark)
      val q = in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(graft.streaming.CurationView.writer(s"$dir/view"))
        .start()
      val perBatch = try docs.grouped(10000).map { chunk =>
        in.addData(chunk.toIndexedSeq)
        timeIt(q.processAllAvailable())._2
      }.toSeq finally q.stop()
      val verdicts = graft.streaming.CurationView
        .readVerdicts(spark, s"$dir/view").count()
      require(verdicts == docs.length.toLong,
        s"curation view lost docs: $verdicts of ${docs.length}")
      section("curation_view",
        "docs" -> docs.length.toString,
        "docs_per_sec" -> "%.0f".format(docs.length / perBatch.sum),
        "batch_secs" -> batchSecs(perBatch),
        "view_bytes" -> dirBytes(s"$dir/view").toString)
    }

    // -------------------------------------------- s_dedup_cluster_view
    // recluster-per-batch over the accumulated edge log
    if (sectionOn("dedup_cluster_view")) locally {
      val docsDf = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val pairs = graft.operators.TextOps.minhashPairsFrom(docsDf)
        .as[(Long, Long)].collect()
      val dir = s"$work/cluster_view"
      val in = MemoryStream[(Long, Long)](spark)
      val q = in.toDF().toDF("doc_a", "doc_b")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(graft.streaming.DedupClusterView.writer(s"$dir/view"))
        .start()
      val n = math.max(1, pairs.length / 5)
      val perBatch = try pairs.grouped(n).map { chunk =>
        in.addData(chunk.toIndexedSeq)
        timeIt(q.processAllAvailable())._2
      }.toSeq finally q.stop()
      val labeled = graft.streaming.DedupClusterView
        .readLabels(spark, s"$dir/view").count()
      section("dedup_cluster_view",
        "edges" -> pairs.length.toString,
        "batch_secs" -> batchSecs(perBatch),
        "labeled_docs" -> labeled.toString)
    }

    // --------------------------------- s_neardup_stream (tws/RocksDB)
    // corpus-shaped LSH bucket state at 10x docs; bounds asserted
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (sectionOn("neardup_stream")) locally {
      val docs = graft.Tables.documents(spark, sfDir)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect()
      val maxBucket = 64
      val dir = s"$work/neardup_tws"
      val in = MemoryStream[(Long, String)](spark)
      val npairs = new java.util.concurrent.atomic.AtomicLong
      val q = graft.streaming.StreamOps.neardupStream(
          in.toDF().toDF("doc_id", "text"), maxBucket = maxBucket,
          tws = true, checkpointLocation = s"$dir/ckpt")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          npairs.addAndGet(b.count()); ()
        }
        .start()
      val perBatch = try docs.grouped(10000).map { chunk =>
        in.addData(chunk.toIndexedSeq)
        timeIt(q.processAllAvailable())._2
      }.toSeq finally q.stop()
      val admitted = spark.createDataset(docs.toIndexedSeq)
        .filter(d => d._2.split(" ").length >= 3).count()
      val sr = stateRows(spark, s"$dir/ckpt", stateVar = "members")
      // bucket membership: each admitted doc joins at most 4 bands
      if (sr >= 0) require(sr <= 4L * admitted,
        s"neardup state rows $sr exceed 4 x admissions $admitted")
      section("neardup_stream_tws",
        "docs" -> docs.length.toString,
        "docs_per_sec" -> "%.0f".format(docs.length / perBatch.sum),
        "batch_secs" -> batchSecs(perBatch),
        "pairs" -> npairs.get().toString,
        "state_rows" -> sr.toString,
        "admitted" -> admitted.toString,
        "state_bytes" -> dirBytes(s"$dir/ckpt/state").toString)
    }

    // ------------------------------- s_semantic_dedup (tws/RocksDB)
    // per-cell member codes at 10x vectors; bounds asserted
    if (sectionOn("semantic_dedup")) locally {
      val e = graft.Tables.embeddings(spark, sfDir)
      val n = e.count()
      val k = graft.operators.Similarity.semDedupK(n)
      val maxCell = 4096
      val cents = graft.operators.Similarity.quantizedInt8(e)
        .where(col("vec_id") < k)
        .select(col("vec_id"), col("qv"), col("qn2"))
        .as[(Long, Seq[Long], Long)].collect().toSeq
      val vecs = e.select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Array[Float])].collect()
      val dir = s"$work/semdedup_tws"
      val in = MemoryStream[(Long, Array[Float])](spark)
      val nOut = new java.util.concurrent.atomic.AtomicLong
      val q = graft.streaming.StreamOps.semanticDedupStream(
          in.toDF().toDF("vec_id", "embedding"), cents, maxCell = maxCell,
          tws = true, checkpointLocation = s"$dir/ckpt")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          nOut.addAndGet(b.count()); ()
        }
        .start()
      val perBatch = try vecs.grouped(4000).map { chunk =>
        in.addData(chunk.toIndexedSeq)
        timeIt(q.processAllAvailable())._2
      }.toSeq finally q.stop()
      val sr = stateRows(spark, s"$dir/ckpt", stateVar = "members")
      if (sr >= 0) {
        require(sr <= n, s"semantic state rows $sr exceed admissions $n")
        require(sr <= k.toLong * maxCell,
          s"semantic state rows $sr exceed K x maxCell ${k * maxCell}")
      }
      section("semantic_dedup_tws",
        "vecs" -> vecs.length.toString,
        "vecs_per_sec" -> "%.0f".format(vecs.length / perBatch.sum),
        "batch_secs" -> batchSecs(perBatch),
        "verdicts" -> nOut.get().toString,
        "k" -> k.toString,
        "state_rows" -> sr.toString,
        "state_bytes" -> dirBytes(s"$dir/ckpt/state").toString)
    }

    // --------------------- s_bm25_maintain → s_bm25_search (r11)
    // the lexical retrieval lifecycle at 10x: ingest the corpus into
    // the maintained index, then serve a query stream from the
    // maintained artifacts — per-batch ingest cost and serving rate
    if (sectionOn("bm25")) locally {
      val docs = graft.Tables.documents(spark, sfDir)
      val rows = docs.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect()
      val dir = s"$work/bm25"
      val in = MemoryStream[(Long, String)](spark)
      val q = in.toDF().toDF("doc_id", "text")
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch(graft.streaming.Bm25IndexView.writer(s"$dir/index"))
        .start()
      val perBatch = try rows.grouped(10000).map { chunk =>
        in.addData(chunk.toIndexedSeq)
        timeIt(q.processAllAvailable())._2
      }.toSeq finally q.stop()
      section("bm25_maintain",
        "docs" -> rows.length.toString,
        "docs_per_sec" -> "%.0f".format(rows.length / perBatch.sum),
        "batch_secs" -> batchSecs(perBatch),
        "postings_bytes" -> dirBytes(s"$dir/index/postings").toString,
        "terms_bytes" -> dirBytes(s"$dir/index/terms").toString)

      // compaction: fold the per-batch postings log into the bucketed
      // base — read amplification (file count) before/after, fold cost
      def parquetFiles(p: String): Long = {
        val root = java.nio.file.Paths.get(p)
        if (!java.nio.file.Files.exists(root)) return 0L
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala
          .count(f => f.toString.endsWith(".parquet"))
      }
      val filesBefore = parquetFiles(s"$dir/index/postings")
      val (_, compactSecs) = timeIt(
        graft.streaming.Bm25IndexView.compact(spark, s"$dir/index"))
      section("bm25_compact",
        "fold_secs" -> f(compactSecs),
        "log_files_before" -> filesBefore.toString,
        "base_files_after" ->
          parquetFiles(s"$dir/index/postings_compacted2").toString,
        "served_rows" ->
          graft.streaming.Bm25IndexView.served(spark, s"$dir/index")
            .count().toString)

      // serve 64 query docs in 4 batches from the MAINTAINED artifacts
      val (n, t) = graft.streaming.Bm25IndexView.stats(spark, s"$dir/index")
      val served = graft.streaming.Bm25IndexView.served(spark, s"$dir/index")
      val qrows = rows.filter(_._1 < 64)
      val qin = MemoryStream[(Long, String)](spark)
      val nOut = new java.util.concurrent.atomic.AtomicLong
      val sq = graft.streaming.StreamOps.bm25SearchStream(
          qin.toDF().toDF("doc_id", "text"), served, n, t, k = 5,
          checkpointLocation = graft.streaming.StreamOps.EphemeralState)
        .writeStream.option("checkpointLocation", s"$dir/search-ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          nOut.addAndGet(b.count()); ()
        }
        .start()
      val servePerBatch = try qrows.grouped(16).map { chunk =>
        qin.addData(chunk.toIndexedSeq)
        timeIt(sq.processAllAvailable())._2
      }.toSeq finally sq.stop()
      section("bm25_search",
        "queries" -> qrows.length.toString,
        "queries_per_sec" -> "%.1f".format(qrows.length / servePerBatch.sum),
        "batch_secs" -> batchSecs(servePerBatch),
        "leaderboard_rows" -> nOut.get().toString)

      // PRODUCTION QUERY VOLUME (VERDICT r12 item 7): the 16-per-batch
      // soak is dominated by fixed per-trigger plan overhead — serve
      // ONE 1024-query batch to measure the amortized rate
      val qrows1k = rows.filter(_._1 < 1024)
      val qin1k = MemoryStream[(Long, String)](spark)
      val nOut1k = new java.util.concurrent.atomic.AtomicLong
      val sq1k = graft.streaming.StreamOps.bm25SearchStream(
          qin1k.toDF().toDF("doc_id", "text"), served, n, t, k = 5,
          checkpointLocation = graft.streaming.StreamOps.EphemeralState)
        .writeStream.option("checkpointLocation", s"$dir/search1k-ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          nOut1k.addAndGet(b.count()); ()
        }
        .start()
      val serve1k = try {
        qin1k.addData(qrows1k.toIndexedSeq)
        timeIt(sq1k.processAllAvailable())._2
      } finally sq1k.stop()
      section("bm25_search_1k",
        "queries" -> qrows1k.length.toString,
        "queries_per_sec" -> "%.1f".format(qrows1k.length / serve1k),
        "batch_secs" -> f(serve1k),
        "leaderboard_rows" -> nOut1k.get().toString,
        "leaderboard_rows_expected" -> (qrows1k.length * 5).toString)
    }

    // ------------------------------ s_index_growth (VERDICT r17 #7)
    // Maintenance cost per batch as the maintained index GROWS: feed
    // the corpus through each view TWICE (second pass with offset ids
    // — the index is 2× when it ends), and compare the mean wall of
    // each pass's LAST quartile of batches. A growth_ratio near 1
    // means per-batch maintenance is index-size-independent (the
    // append-only design claim); a ratio ≫1 names a maintenance stage
    // that reads the whole maintained state per batch.
    if (sectionOn("index_growth")) locally {
      def tailMean(ts: Seq[Double]): Double = {
        val q = ts.takeRight(math.max(1, ts.length / 4))
        q.sum / q.length
      }
      // --- bm25 twin
      val docs = graft.Tables.documents(spark, sfDir)
      val rows = docs.select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect()
      val off = rows.iterator.map(_._1).max + 1
      val bdir = s"$work/bm25growth"
      val bin = MemoryStream[(Long, String)](spark)
      val bq = bin.toDF().toDF("doc_id", "text")
        .writeStream.option("checkpointLocation", s"$bdir/ckpt")
        .foreachBatch(graft.streaming.Bm25IndexView.writer(s"$bdir/index"))
        .start()
      def ingestB(idOff: Long): Seq[Double] = rows.grouped(10000).map { c =>
        bin.addData(c.map { case (id, t) => (id + idOff, t) }.toIndexedSeq)
        timeIt(bq.processAllAvailable())._2
      }.toSeq
      val (b1, b2) = try (ingestB(0), ingestB(off)) finally bq.stop()
      section("bm25_index_growth",
        "docs_per_pass" -> rows.length.toString,
        "batch_secs_1x" -> batchSecs(b1),
        "batch_secs_2x" -> batchSecs(b2),
        "tail_mean_1x" -> f(tailMean(b1)),
        "tail_mean_2x" -> f(tailMean(b2)),
        "growth_ratio" -> f(tailMean(b2) / tailMean(b1)))
      // --- vector twin (same ingest-twice shape over VecIndexView)
      val evs = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val eoff = evs.iterator.map(_._1).max + 1
      val (cells, cbs, _) = graft.operators.Similarity.pqResArtifacts(
        graft.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding")))
      val vdir = s"$work/vecgrowth"
      val vin = MemoryStream[(Long, Seq[Float])](spark)
      val vq = vin.toDF().toDF("vec_id", "embedding")
        .writeStream.option("checkpointLocation", s"$vdir/ckpt")
        .foreachBatch(
          graft.streaming.VecIndexView.writer(s"$vdir/index", cells, cbs))
        .start()
      def ingestV(idOff: Long): Seq[Double] = evs.grouped(10000).map { c =>
        vin.addData(c.map { case (id, e) => (id + idOff, e) }.toIndexedSeq)
        timeIt(vq.processAllAvailable())._2
      }.toSeq
      val (v1, v2) = try (ingestV(0), ingestV(eoff)) finally vq.stop()
      section("vec_index_growth",
        "vecs_per_pass" -> evs.length.toString,
        "batch_secs_1x" -> batchSecs(v1),
        "batch_secs_2x" -> batchSecs(v2),
        "tail_mean_1x" -> f(tailMean(v1)),
        "tail_mean_2x" -> f(tailMean(v2)),
        "growth_ratio" -> f(tailMean(v2) / tailMean(v1)))
    }

    // ------------------------------------- s_hybrid_search (r11)
    // hybrid serving at 10x: both legs per arriving query — the
    // lexical served index + the residual compressed ADC index
    if (sectionOn("hybrid")) locally {
      val docs = graft.Tables.documents(spark, sfDir)
      val e = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      // materialize the static sides ONCE — a streaming serve re-reads
      // them per micro-batch (production passes the maintained view's
      // parquet artifacts; localCheckpoint is the in-process stand-in)
      val lexIndex = graft.operators.TextOps.bm25ServedIndex(docs)
        .localCheckpoint(eager = true)
      val (n, t) = graft.operators.TextOps.bm25Stats(docs)
      val ((cells, cbs, idx), artifactSecs) =
        timeIt(graft.operators.Similarity.pqResArtifacts(e))
      val qrows = docs.where(col("doc_id") < 64)
        .select(col("doc_id").cast("long"), col("text"))
        .join(e.select(col("vec_id").cast("long").as("doc_id"),
          col("embedding")), "doc_id")
        .as[(Long, String, Seq[Float])].collect()
      val dir = s"$work/hybrid"
      val in = MemoryStream[(Long, String, Seq[Float])](spark)
      val nOut = new java.util.concurrent.atomic.AtomicLong
      val gotSmall = new scala.collection.mutable.HashSet[(Long, Long, Long)]
      val q = graft.streaming.StreamOps.hybridSearchStream(
          in.toDF().toDF("doc_id", "text", "embedding"),
          lexIndex, n, t, idx, cells, cbs, k = 5, fuseDepth = 20,
          checkpointLocation = graft.streaming.StreamOps.EphemeralState)
        .writeStream.option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          nOut.addAndGet(b.count())
          gotSmall.synchronized {
            gotSmall ++= b.select(col("query_id"),
                col("rank").cast("long"), col("neighbor_id"))
              .as[(Long, Long, Long)].collect()
          }
          ()
        }
        .start()
      val perBatch = try qrows.grouped(16).map { chunk =>
        in.addData(chunk.toIndexedSeq)
        timeIt(q.processAllAvailable())._2
      }.toSeq finally q.stop()
      section("hybrid_search",
        "queries" -> qrows.length.toString,
        "queries_per_sec" -> "%.1f".format(qrows.length / perBatch.sum),
        "batch_secs" -> batchSecs(perBatch),
        "index_build_secs" -> f(artifactSecs),
        "fused_rows" -> nOut.get().toString)

      // PRODUCTION QUERY VOLUME (VERDICT r12 item 7): one 1024-query
      // batch — fixed per-trigger plan overhead amortizes, and the
      // leaderboards must be IDENTICAL per query regardless of batch
      // composition (fusion is batch-local per query): the overlap
      // with the small soak's query set is compared exactly.
      val qrows1k = docs.where(col("doc_id") < 1024)
        .select(col("doc_id").cast("long"), col("text"))
        .join(e.select(col("vec_id").cast("long").as("doc_id"),
          col("embedding")), "doc_id")
        .as[(Long, String, Seq[Float])].collect()
      val in1k = MemoryStream[(Long, String, Seq[Float])](spark)
      val buf1k = new java.util.concurrent.atomic.AtomicLong
      val got1k = new scala.collection.mutable.HashSet[(Long, Long, Long)]
      val q1k = graft.streaming.StreamOps.hybridSearchStream(
          in1k.toDF().toDF("doc_id", "text", "embedding"),
          lexIndex, n, t, idx, cells, cbs, k = 5, fuseDepth = 20,
          checkpointLocation = graft.streaming.StreamOps.EphemeralState)
        .writeStream.option("checkpointLocation", s"$dir/ckpt1k")
        .foreachBatch { (b: DataFrame, _: Long) =>
          buf1k.addAndGet(b.count())
          got1k.synchronized {
            got1k ++= b.where(col("query_id") < 64)
              .select(col("query_id"), col("rank").cast("long"),
                col("neighbor_id"))
              .as[(Long, Long, Long)].collect()
          }
          ()
        }
        .start()
      val serve1k = try {
        in1k.addData(qrows1k.toIndexedSeq)
        timeIt(q1k.processAllAvailable())._2
      } finally q1k.stop()
      section("hybrid_search_1k",
        "queries" -> qrows1k.length.toString,
        "queries_per_sec" -> "%.1f".format(qrows1k.length / serve1k),
        "batch_secs" -> f(serve1k),
        "fused_rows" -> buf1k.get().toString,
        "fused_rows_expected" -> (qrows1k.length * 5).toString,
        // fusion is batch-local per query, so the 1024-query batch must
        // reproduce the small soak's leaderboards for the shared 64
        // queries EXACTLY — batching may never change results
        "overlap_identical" ->
          (got1k.toSet == gotSmall.toSet).toString)

      // ---------------------------------------- s_mmr_serve (r13 soak)
      // diversified serving off the same residual artifacts: small
      // batches for the per-trigger shape, then the 1024-query batch
      val corpus = e.localCheckpoint(eager = true)
      val mmrDir = s"$work/mmr"
      val qv = e.where(col("vec_id") < 1024)
        .as[(Long, Seq[Float])].collect()
      val mmrIn = MemoryStream[(Long, Seq[Float])](spark)
      val mmrWriter = graft.streaming.MmrServeView.writer(
        mmrDir, corpus, idx, cells, cbs, k = 5)
      val mq = mmrIn.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch(mmrWriter)
        .option("checkpointLocation", s"$mmrDir/ckpt")
        .start()
      val (mmrSmall, mmr1k) = try {
        val small = qv.take(64).grouped(16).map { chunk =>
          mmrIn.addData(chunk.toIndexedSeq)
          timeIt(mq.processAllAvailable())._2
        }.toSeq
        mmrIn.addData(qv.drop(64).toIndexedSeq)
        (small, timeIt(mq.processAllAvailable())._2)
      } finally mq.stop()
      section("mmr_serve",
        "queries" -> "64",
        "queries_per_sec" -> "%.1f".format(64 / mmrSmall.sum),
        "batch_secs" -> batchSecs(mmrSmall))
      section("mmr_serve_1k",
        "queries" -> (qv.length - 64).toString,
        "queries_per_sec" -> "%.1f".format((qv.length - 64) / mmr1k),
        "batch_secs" -> f(mmr1k),
        "served_rows" -> graft.streaming.MmrServeView
          .results(spark, mmrDir).count().toString,
        "served_rows_expected" -> (qv.length * 5).toString)
    }

    // ------------------------------------- s_rerank_monitor + s_index_health (r11)
    // the index-ops sidecars: online agreement metrology over the served
    // compressed index, and the ingest-maintained health monoids
    if (sectionOn("rerank")) locally {
      val e = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val ((cells, cbs, idx), artifactSecs) =
        timeIt(graft.operators.Similarity.pqResArtifacts(e))

      // monitor: 64 shadow-checked queries in 4 batches
      val qrows = e.where(col("vec_id") < 64)
        .as[(Long, Seq[Float])].collect()
      val mdir = s"$work/rerank-monitor"
      val min0 = MemoryStream[(Long, Seq[Float])](spark)
      val mq = min0.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch(graft.streaming.RerankMonitorView.writer(
          mdir, e, idx, cells, cbs))
        .option("checkpointLocation", s"$mdir/ckpt")
        .start()
      val monPerBatch = try qrows.grouped(16).map { chunk =>
        min0.addData(chunk.toIndexedSeq)
        timeIt(mq.processAllAvailable())._2
      }.toSeq finally mq.stop()
      val monRows = graft.streaming.RerankMonitorView.monitorRows(spark, mdir)
      section("rerank_monitor",
        "queries" -> qrows.length.toString,
        "queries_per_sec" -> "%.1f".format(qrows.length / monPerBatch.sum),
        "batch_secs" -> batchSecs(monPerBatch),
        "index_build_secs" -> f(artifactSecs),
        "macro_agree_fx" -> {
          val r = monRows.agg(sum("hits"), count(lit(1))).head()
          (r.getLong(0) * 1048576L / (r.getLong(1) * 5L)).toString
        })

      // ingest-side health: a 20k-vector slice in 4 batches (per-batch
      // cost must stay flat — the monoid merge rewrites only the tiny
      // per-cell table)
      val hrows = e.where(col("vec_id") >= 64 && col("vec_id") < 20064)
        .as[(Long, Seq[Float])].collect()
      val hdir = s"$work/index-health"
      val hin = MemoryStream[(Long, Seq[Float])](spark)
      val hq = hin.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch(graft.streaming.IndexHealthView.writer(hdir, cells, cbs))
        .option("checkpointLocation", s"$hdir/ckpt")
        .start()
      val healthPerBatch = try hrows.grouped(5000).map { chunk =>
        hin.addData(chunk.toIndexedSeq)
        timeIt(hq.processAllAvailable())._2
      }.toSeq finally hq.stop()
      section("index_health",
        "vecs" -> hrows.length.toString,
        "vecs_per_sec" -> "%.0f".format(hrows.length / healthPerBatch.sum),
        "batch_secs" -> batchSecs(healthPerBatch),
        "health_cells" -> (graft.streaming.IndexHealthView
          .health(spark, hdir).count() - 1).toString)
    }

    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val json = s"""{"metric":"stream_soak","sf":"$sfDir","cpus":$cpus,""" +
      out.toString +
      s""""loadavg":${f(os.getSystemLoadAverage)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_stream_out.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
