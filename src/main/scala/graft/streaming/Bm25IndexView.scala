package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained BM25 index from a document INGEST stream —
  * the lexical counterpart of `s_ivf_maintain` (which maintains the
  * vector index's cell statistics), completing the lexical lifecycle:
  * ingest (this view) → serve ([[StreamOps.bm25SearchStream]] /
  * [[StreamOps.hybridSearchStream]] read the maintained artifacts).
  *
  * Layout under `baseDir`:
  *  - `postings/` — `(doc_id, dl, h, tf)`, APPEND-ONLY per-batch
  *    partitions: a batch's postings are a pure function of its own
  *    docs ([[graft.operators.TextOps.bm25Postings]] is doc-local), so
  *    ingest never touches existing rows — the property that makes a
  *    100 TB postings log maintainable at all. A long-lived log folds
  *    into the hash-bucketed `postings_compacted/` base via
  *    [[compact]] (touched-buckets-only rewrite); readers see the
  *    union of both zones;
  *  - `terms/` — the merged `(h, df)` dictionary: per batch, the
  *    batch's term→doc-count aggregation full-outer-merges into the
  *    stored table (df is a count MONOID — increments only, since the
  *    corpus feed is append-only). The merge reads |dict| + |batch
  *    terms| rows and rewrites the dictionary; at real scale the
  *    rewrite drops to O(touched buckets) under a hash-bucketed layout
  *    with dynamic partition overwrite (the
  *    `CdcSink.applyChangelogBucketed` discipline — same upgrade, not
  *    re-derived here);
  *  - `stats/` — one row `(n, t)`: corpus doc count and total shingle
  *    count, the BM25 score parameters (monoid adds).
  *
  * Exactly-once: the postings log is per-batch IDEMPOTENT — each batch
  * writes its own `postings/batch=<id>/` partition with Overwrite, so
  * a retry that crashed after the write but before the marker replaces
  * the partition instead of appending duplicates (the marker file is a
  * fast-skip only). The merged tables (`terms/`, `stats/`) commit by
  * the two-rename swap with the `_applied_batch` marker INSIDE the new
  * directory — the CdcAggView discipline. A foreachBatch retry re-runs
  * only the steps whose marker lags, and every step derives from the
  * batch alone plus its own current state, so partial-crash recovery
  * is per-step idempotent.
  *
  * The declared ingest contract is APPEND-ONLY unique doc_ids (the
  * standard corpus-ingest shape); a doc UPDATE/DELETE needs the
  * re-index discipline (stop → rebuild → fresh serve checkpoints —
  * the served (n, t, dfCap) era is geometry-bound downstream anyway).
  *
  * The SERVED index derives at read time: the scale-aware df-cap
  * (`bm25DfCap(n)`) is applied against the MAINTAINED df table — so a
  * term that outgrows the cap as the corpus grows leaves the served
  * index automatically, without ever rewriting postings.
  */
object Bm25IndexView {

  /** foreachBatch adapter:
    * `docs.writeStream.foreachBatch(Bm25IndexView.writer(dir)).start()` */
  def writer(baseDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => applyBatch(batch, batchId, baseDir)

  def applyBatch(docs: DataFrame, batchId: Long, baseDir: String): Unit = {
    val spark = docs.sparkSession
    new java.io.File(baseDir).mkdirs()
    val batchPostings = graft.operators.TextOps.bm25Postings(docs)
      .localCheckpoint(eager = true) // evaluated once, reused three times

    // 1. postings append — idempotent PER BATCH: each batch owns its
    //    `batch=<id>` partition directory and writes it with Overwrite,
    //    so a foreachBatch retry that crashed between the write and the
    //    marker REPLACES the partition instead of re-appending duplicate
    //    postings rows (which would silently double-count tf in served
    //    scores). The marker is now only a fast-skip; correctness no
    //    longer depends on its atomicity with the write.
    val pMarker = java.nio.file.Paths.get(s"$baseDir/_postings-batch-$batchId")
    if (!java.nio.file.Files.exists(pMarker)) {
      if (!batchPostings.isEmpty)
        batchPostings.write.mode(SaveMode.Overwrite)
          .parquet(s"$baseDir/postings/batch=$batchId")
      java.nio.file.Files.createFile(pMarker)
    }

    // 2. term-dictionary merge (df count monoid)
    val termsDir = s"$baseDir/terms"
    if (lastApplied(termsDir) < batchId) {
      val batchDf = batchPostings.groupBy("h")
        .agg(count(lit(1)).as("df"))
      val current =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(termsDir)))
          spark.read.parquet(termsDir).where(col("h").isNotNull)
        else batchDf.limit(0)
      val merged = current.select(col("h"), col("df").as("df_cur"))
        .join(batchDf.select(col("h"), col("df").as("df_new")), Seq("h"), "full_outer")
        .select(col("h"),
          (coalesce(col("df_cur"), lit(0L)) + coalesce(col("df_new"), lit(0L)))
            .as("df"))
      swapInWithMarker(merged, termsDir, batchId)
    }

    // 3. stats merge ((n, t) monoid)
    val statsDir = s"$baseDir/stats"
    if (lastApplied(statsDir) < batchId) {
      val b = docs.select(split(col("text"), " ").as("l"))
        .agg(count(lit(1)).as("n"),
          coalesce(sum(greatest(size(col("l")) - 2, lit(0))), lit(0L))
            .cast("long").as("t"))
        .head()
      val (cn, ct) =
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(statsDir))) {
          val r = spark.read.parquet(statsDir).head()
          (r.getLong(0), r.getLong(1))
        } else (0L, 0L)
      import spark.implicits._
      swapInWithMarker(
        Seq((cn + b.getLong(0), ct + b.getLong(1))).toDF("n", "t"),
        statsDir, batchId)
    }
  }

  /** The maintained corpus stats `(n, t)`. */
  def stats(spark: SparkSession, baseDir: String): (Long, Long) = {
    val r = spark.read.parquet(s"$baseDir/stats").head()
    (r.getLong(0), r.getLong(1))
  }

  /** How many hash buckets the compacted postings base uses. */
  val CompactBuckets = 16

  /** COMPACTION: fold the per-batch postings log into a hash-bucketed
    * base (`postings_compacted/bucket=<h mod CompactBuckets>/`), so a
    * long-lived index's read amplification stays bounded by the bucket
    * count instead of growing one directory per ingested batch — the
    * `CdcSink.applyChangelogBucketed` discipline applied to the lexical
    * index. Only buckets that received new rows are rewritten (dynamic
    * partition overwrite); untouched buckets stay byte-identical, so
    * compaction cost is O(touched buckets), not O(index).
    *
    * Crash-safe: the fold dedupes on (doc_id, h) — globally unique
    * under the append-only-unique-doc contract — so a crash between
    * the bucket rewrite and the log cleanup re-folds idempotently; the
    * per-batch `_postings-batch-<id>` markers survive compaction, so a
    * late foreachBatch replay of a folded batch is still skipped. */
  def compact(spark: SparkSession, baseDir: String): Unit = {
    val logRoot = java.nio.file.Paths.get(s"$baseDir/postings")
    val batchDirs = listBatchDirs(logRoot)
    if (batchDirs.isEmpty) return
    val baseRoot = s"$baseDir/postings_compacted"
    val fresh = spark.read.parquet(batchDirs.map(_.toString): _*)
      .select(col("doc_id"), col("dl"), col("h"), col("tf"))
      .withColumn("bucket", pmod(col("h"), lit(CompactBuckets.toLong)))
      .localCheckpoint(eager = true) // evaluated once: bucket probe + fold
    val touched = fresh.select("bucket").distinct()
      .collect().map(_.getLong(0)).toSeq
    val existing =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(baseRoot)))
        spark.read.parquet(baseRoot)
          .withColumn("bucket", col("bucket").cast("long"))
          .where(col("bucket").isin(touched: _*)) // partition-pruned read
          .select("doc_id", "dl", "h", "tf", "bucket")
      else fresh.limit(0)
    val merged = existing.unionByName(fresh)
      .dropDuplicates("doc_id", "h") // re-fold idempotency (values equal)
      // co-locate each bucket's rows: ONE file per rewritten bucket, so
      // the compacted base's file count stays = bucket count (the read-
      // amplification bound compaction exists to provide)
      .repartition(CompactBuckets, col("bucket"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(baseRoot)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // folded: clear the log (idempotent-by-dedup if we crash mid-way)
    batchDirs.foreach(deleteTree)
  }

  private def listBatchDirs(logRoot: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.exists(logRoot)) Nil
    else java.nio.file.Files.list(logRoot).iterator().asScala.toSeq
      .filter(p => java.nio.file.Files.isDirectory(p)
        && p.getFileName.toString.startsWith("batch="))
      .sortBy(_.getFileName.toString)
  }

  /** The full postings frame `(doc_id, dl, h, tf)` across BOTH zones:
    * the compacted bucketed base plus any not-yet-folded batch log. */
  private def postingsFrame(spark: SparkSession, baseDir: String): DataFrame = {
    val zones = Seq(s"$baseDir/postings_compacted", s"$baseDir/postings")
      .filter { p =>
        val path = java.nio.file.Paths.get(p)
        java.nio.file.Files.exists(path) && (p.endsWith("postings_compacted")
          || listBatchDirs(path).nonEmpty)
      }
    require(zones.nonEmpty, s"no postings under $baseDir")
    zones.map(z => spark.read.parquet(z)
        .select(col("doc_id"), col("dl"), col("h"), col("tf")))
      .reduce(_ unionByName _)
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
  }

  /** The SERVED index over the maintained artifacts — row-identical to
    * `TextOps.bm25ServedIndex` over the ingested corpus (spec-pinned):
    * postings join the pre-merged df table under the scale-aware cap,
    * never re-aggregating postings. */
  def served(spark: SparkSession, baseDir: String): DataFrame = {
    val (n, _) = stats(spark, baseDir)
    graft.operators.TextOps.bm25ServedFrom(
      postingsFrame(spark, baseDir),
      spark.read.parquet(s"$baseDir/terms").where(col("h").isNotNull),
      n)
  }

  /** Health metrics over the MAINTAINED artifacts, in the batch
    * `q_lexical_health` shape `(metric, value)` — derived at read time
    * from the postings log, the merged df dictionary, and the (n, t)
    * stats, so the ingest path never computes anything extra for
    * health (the postings/df merges already happened). The kept/total
    * collapse is the query-terms-going-dark alarm; `postings_kept` is
    * the served-index volume. */
  def health(spark: SparkSession, baseDir: String): DataFrame = {
    import spark.implicits._
    val (n, t) = stats(spark, baseDir)
    val cap = graft.operators.TextOps.bm25DfCap(n)
    val postings = postingsFrame(spark, baseDir)
    val dfx = spark.read.parquet(s"$baseDir/terms")
      .where(col("h").isNotNull)
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("value"))
        .select(lit(name).as("metric"), col("value"))
    Seq(("df_cap", cap), ("n_docs", n), ("t_shingles", t))
      .toDF("metric", "value")
      .unionByName(counted("terms_total", dfx))
      .unionByName(counted("terms_kept", dfx.where(col("df") <= cap)))
      .unionByName(counted("postings_total", postings))
      .unionByName(counted("postings_kept",
        graft.operators.TextOps.bm25ServedFrom(postings, dfx, n)))
      .orderBy("metric")
  }

  private def lastApplied(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir, "_applied_batch")
    if (java.nio.file.Files.exists(p))
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong
    else -1L
  }

  private def swapInWithMarker(
      df: DataFrame, dir: String, batchId: Long): Unit = {
    val target = java.nio.file.Paths.get(dir)
    val next = java.nio.file.Paths.get(dir + ".next-" + System.nanoTime())
    val old  = java.nio.file.Paths.get(dir + ".old-" + System.nanoTime())
    df.write.mode(SaveMode.Overwrite).parquet(next.toString)
    java.nio.file.Files.write(next.resolve("_applied_batch"),
      batchId.toString.getBytes("UTF-8"))
    if (java.nio.file.Files.exists(target))
      java.nio.file.Files.move(target, old)
    java.nio.file.Files.move(next, target)
    if (java.nio.file.Files.exists(old)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(old).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
