package graft

import org.apache.spark.sql.functions._

import scala.util.Random

import graft.operators.Corpus

/** Generative checks for the corpus-hygiene ops on random corpora — the
  * alignment and duplication shapes a fixed fixture misses. Ground truth
  * is a plain in-memory Scala recompute, so any divergence in the
  * distributed plan (chunking, df counting, reassembly, span coverage)
  * fails loudly. */
class CorpusPropSpec extends SparkSpec {
  import spark.implicits._

  private def randomCorpus(rnd: Random, nDocs: Int, vocab: Int): Seq[(Long, String)] = {
    // small vocab forces chunk/window collisions; occasional copied spans
    // create real cross-doc duplication
    val base = (0 until nDocs).map { i =>
      val len = 8 + rnd.nextInt(40)
      i.toLong -> (0 until len).map(_ => s"w${rnd.nextInt(vocab)}").mkString(" ")
    }
    base.map { case (id, text) =>
      // doc 1 ALWAYS splices from doc 0 — a planted witness so every trial
      // contains at least one cross-doc repeat of >= SpanTokens tokens and
      // the vacuity guards below can never fail on an unlucky seed
      if ((rnd.nextInt(4) == 0 || id == 1) && id > 0) {
        // splice a span (>= SpanTokens, so span-level ops can see it) from
        // an earlier doc at the front
        val (_, src) = base(rnd.nextInt(id.toInt))
        val toks = src.split(" ")
        val span = toks.slice(0, math.min(toks.length, Corpus.SpanTokens + rnd.nextInt(4)))
        id -> (span ++ text.split(" ")).mkString(" ")
      } else id -> text
    }
  }

  test("q_chunk_dedup == in-memory recompute on random corpora") {
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      val corpus = randomCorpus(rnd, 30 + rnd.nextInt(40), 12)
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toFile
      try {
        corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
          .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val got = Corpus.qChunkDedup.build(spark, dir.getAbsolutePath)
          .as[(Long, Long, Long, String)].collect()
          .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
        // ground truth: plain Scala
        val chunksOf = corpus.map { case (id, text) =>
          id -> text.split(" ").grouped(Corpus.ChunkTokens).map(_.mkString(" ")).toSeq
        }.toMap
        val df = chunksOf.values.flatten
          .groupBy(identity).view.mapValues(_.size).toMap
        corpus.foreach { case (id, _) =>
          val chunks = chunksOf(id)
          val kept = chunks.filter(c => df(c) < Corpus.ChunkMinDf)
          val expect = (chunks.size.toLong,
            chunks.count(c => df(c) >= Corpus.ChunkMinDf).toLong,
            kept.mkString(" "))
          assert(got(id) == expect, s"trial $trial doc $id: ${got(id)} vs $expect")
        }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("q_span_maxrep == brute-force all-pairs suffix LCP on random corpora") {
    val rnd = new Random(37)
    for (trial <- 1 to 3) {
      val corpus = randomCorpus(rnd, 25 + rnd.nextInt(25), 8)
      val got = Corpus.spanMaxrep(corpus.toDF("doc_id", "text"))
        .as[(Long, Long)].collect().toMap
      // ground truth: every suffix against every other suffix occurrence
      val suffixes = corpus.flatMap { case (id, text) =>
        val t = text.split(" ")
        (0 to t.length - Corpus.SpanTokens).map(i =>
          (id, t.slice(i, math.min(i + Corpus.MaxRepCap, t.length))))
      }
      def lcp(a: Array[String], b: Array[String]): Int = {
        val n = math.min(a.length, b.length)
        var j = 0
        while (j < n && a(j) == b(j)) j += 1
        j
      }
      val best = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
      for (x <- suffixes.indices; y <- suffixes.indices if x != y) {
        val l = lcp(suffixes(x)._2, suffixes(y)._2)
        if (l > best(suffixes(x)._1)) best(suffixes(x)._1) = l
      }
      corpus.foreach { case (id, _) =>
        val expect = if (best(id) >= Corpus.SpanTokens) best(id).toLong else 0L
        assert(got(id) == expect,
          s"trial $trial doc $id: engine ${got(id)} vs brute $expect")
      }
      assert(corpus.exists { case (id, _) => got(id) > 0 },
        s"trial $trial produced no repeats — vacuous")
    }
  }

  test("q_span_dedup == in-memory recompute on random corpora") {
    val rnd = new Random(23)
    for (trial <- 1 to 3) {
      val corpus = randomCorpus(rnd, 30 + rnd.nextInt(30), 10)
      val dir = java.nio.file.Files.createTempDirectory("graft-prop2").toFile
      try {
        corpus.toDF("doc_id", "text").withColumn("lang", lit("en"))
          .withColumn("source", lit("s")).withColumn("n_chars", length(col("text")))
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val got = Corpus.qSpanDedup.build(spark, dir.getAbsolutePath)
          .as[(Long, Long, Long, Long, Long, Double)].collect()
          .map(t => t._1 -> ((t._3, t._4, t._5))).toMap
        val w = Corpus.SpanTokens
        val winsOf = corpus.map { case (id, text) =>
          val t = text.split(" ")
          id -> (if (t.length < w) Seq.empty
                 else (0 to t.length - w).map(i => (i + 1, t.slice(i, i + w).mkString(" "))))
        }.toMap
        val df = winsOf.values.flatten.map(_._2)
          .groupBy(identity).view.mapValues(_.size).toMap
        corpus.foreach { case (id, _) =>
          val wins = winsOf(id)
          val hot = wins.filter { case (_, s) => df(s) >= 2 }
          val covered = hot.flatMap { case (i, _) => i until i + w }.toSet
          val expect = (wins.size.toLong, hot.size.toLong, covered.size.toLong)
          assert(got(id) == expect, s"trial $trial doc $id: ${got(id)} vs $expect")
        }
      } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }
}
