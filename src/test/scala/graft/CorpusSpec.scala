package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Invariants for the corpus-hygiene pack (exact values are pinned by the
  * DuckDB oracle at sf0.01; these assert the semantics and the plan shape
  * that make the operators scale). */
class CorpusSpec extends SparkSpec {

  test("q_chunk_dedup drops exactly the df>=2 chunks and preserves token mass") {
    val out = Corpus.qChunkDedup.build(spark, sf).cache()
    // the cap must bite on the fixture, else the query proves nothing
    val dropped = out.agg(sum("n_dropped")).head.getLong(0)
    assert(dropped > 0, "no boilerplate chunk was dropped on the fixture")
    // clean_text token count == (n_chunks - n_dropped) chunks' tokens:
    // every kept chunk is ChunkTokens long except possibly the doc's last
    val bad = out
      .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
        when(col("clean_text") === "", lit(0))
          .otherwise(size(split(col("clean_text"), " "))).as("clean_tokens"))
      .filter(col("clean_tokens") > (col("n_chunks") - col("n_dropped")) * Corpus.ChunkTokens
        || col("clean_tokens") < (col("n_chunks") - col("n_dropped") - 1) * Corpus.ChunkTokens + 1
          && col("n_chunks") - col("n_dropped") > 0)
    assert(bad.count() == 0, "kept-chunk token mass out of bounds")
    // untouched docs round-trip verbatim
    val docs = Tables.documents(spark, sf)
    val untouched = out.filter(col("n_dropped") === 0)
      .join(docs, "doc_id")
      .filter(col("clean_text") =!= col("text"))
    assert(untouched.count() == 0, "docs with nothing dropped must round-trip")
    out.unpersist()
  }

  test("q_chunk_dedup removes every occurrence of a repeated chunk (no survivors)") {
    val out = Corpus.qChunkDedup.build(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    // recompute the df>=MinDf chunk set independently
    val chunks = docs.select(col("doc_id"),
      explode(transform(
        sequence(lit(1),
          ceil(size(col("t")) / lit(Corpus.ChunkTokens.toDouble)).cast("int")),
        i => array_join(
          slice(col("t"), (i - 1) * Corpus.ChunkTokens + 1,
            lit(Corpus.ChunkTokens)), " "))).as("chunk"))
    val hot = chunks.groupBy("chunk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= Corpus.ChunkMinDf).select("chunk")
    // no hot chunk may appear as a contiguous chunk-aligned span of clean_text
    val cleanChunks = out.select(col("doc_id"),
      split(col("clean_text"), " ").as("t"))
      .filter(size(col("t")) >= Corpus.ChunkTokens)
      .select(explode(transform(
        sequence(lit(1),
          ceil(size(col("t")) / lit(Corpus.ChunkTokens.toDouble)).cast("int")),
        i => array_join(
          slice(col("t"), (i - 1) * Corpus.ChunkTokens + 1,
            lit(Corpus.ChunkTokens)), " "))).as("chunk"))
    val survivors = cleanChunks.join(hot, "chunk").count()
    // reassembly shifts chunk boundaries where drops occurred, so only
    // fully-kept prefixes stay aligned — but a *fully intact* hot chunk
    // in an untouched doc would be a correctness bug:
    val untouchedSurvivors = out.filter(col("n_dropped") === 0)
      .select(col("doc_id"), split(col("clean_text"), " ").as("t"))
      .select(explode(transform(
        sequence(lit(1),
          ceil(size(col("t")) / lit(Corpus.ChunkTokens.toDouble)).cast("int")),
        i => array_join(
          slice(col("t"), (i - 1) * Corpus.ChunkTokens + 1,
            lit(Corpus.ChunkTokens)), " "))).as("chunk"))
      .join(hot, "chunk").count()
    assert(untouchedSurvivors == 0,
      s"untouched docs still contain $untouchedSurvivors hot chunks")
    assert(survivors >= 0) // bound check only; exact values pinned by oracle
  }

  test("q_contam_ngram flags only non-benchmark docs that truly share an n-gram") {
    val out = Corpus.qContamNgram.build(spark, sf).cache()
    assert(out.count() > 0, "decontamination found nothing on the fixture")
    assert(out.filter(col("doc_id") % Corpus.ContamBenchMod === 0).count() == 0,
      "benchmark docs must not flag themselves")
    assert(out.filter(col("n_hit") > col("n_ngrams")).count() == 0)
    assert(out.filter(col("contam_rate") <= 0 || col("contam_rate") > 1).count() == 0)
    // spot-verify one flagged doc by brute force
    val row = out.orderBy(desc("n_hit")).head
    val docId = row.getLong(0)
    val docs = Tables.documents(spark, sf)
    def grams(pred: org.apache.spark.sql.Column) = docs.filter(pred)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= Corpus.ContamNgram)
      .select(explode(transform(
        sequence(lit(1), size(col("t")) - (Corpus.ContamNgram - 1)),
        i => array_join(slice(col("t"), i, lit(Corpus.ContamNgram)), " ")))
        .as("ng")).distinct()
    val expect = grams(col("doc_id") === docId)
      .join(grams(col("doc_id") % Corpus.ContamBenchMod === 0), "ng").count()
    assert(row.getLong(2) == expect,
      s"doc $docId n_hit=${row.getLong(2)} but brute force says $expect")
    out.unpersist()
  }

  test("q_contam_ngram broadcasts the benchmark side") {
    val plan = Corpus.qContamNgram.build(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set must broadcast, got:\n$plan")
  }

  test("q_span_dedup: coverage bounded, hot windows real, and alignment-robust") {
    val out = Corpus.qSpanDedup.build(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.agg(sum("n_hot")).head.getLong(0) > 0,
      "duplicated spans must exist on the fixture")
    // coverage can never exceed the doc or undershoot its hot windows
    assert(out.filter(col("dup_tokens") > col("n_tokens")).count() == 0)
    assert(out.filter(col("n_hot") > 0 &&
      col("dup_tokens") < Corpus.SpanTokens).count() == 0,
      "one hot window must cover at least SpanTokens positions")
    assert(out.filter(col("dup_mass") < 0 || col("dup_mass") > 1).count() == 0)
    out.unpersist()

    // alignment robustness — the reason this operator exists: a one-token
    // prefix shift defeats fixed-chunk dedup but not overlapping windows
    import spark.implicits._
    val span = (1 to Corpus.SpanTokens).map(i => s"tok$i").mkString(" ")
    val synthetic = Seq(
      (1L, s"$span tail1 tail2"),
      (2L, s"shift $span other3 other4")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toFile
    try {
      synthetic.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = Corpus.qSpanDedup.build(spark, dir.getAbsolutePath)
        .as[(Long, Long, Long, Long, Long, Double)].collect()
        .map(t => t._1 -> t._4).toMap
      assert(r(1L) >= 1 && r(2L) >= 1,
        s"shifted duplicate span not detected: $r")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("q_lexical_diversity ratios are exact and bounded") {
    val out = Corpus.qLexicalDiversity.build(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("n_types") > col("n_tokens")).count() == 0)
    assert(out.filter(col("ttr") <= 0 || col("ttr") > 1).count() == 0)
    assert(out.filter(col("simpson") < 0 || col("simpson") >= 1).count() == 0)
    assert(out.filter(col("top_share") <= 0 || col("top_share") > 1).count() == 0)
    // all-distinct doc: simpson = 1 - 1/n exactly, ttr = 1
    val allDistinct = out.filter(col("n_types") === col("n_tokens"))
    assert(allDistinct.filter(col("ttr") =!= 1.0).count() == 0)
    val badSimpson = allDistinct.filter(
      col("simpson") =!=
        (col("n_tokens") * col("n_tokens") - col("n_tokens")).cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double"))
    assert(badSimpson.count() == 0)
    out.unpersist()
  }

  test("corpus plans stay equi-join: no cartesian or nested-loop anywhere") {
    Seq(Corpus.qChunkDedup, Corpus.qContamNgram, Corpus.qLexicalDiversity)
      .foreach { q =>
        val plan = q.build(spark, sf).queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plan degenerated:\n$plan")
      }
  }

  test("span_maxrep equals the brute-force all-pairs suffix LCP on a subset") {
    // independent ground truth for the bucket+sorted-neighbor algorithm:
    // capped suffix LCP against EVERY other suffix occurrence, O(n²),
    // driver-side, on a 60-doc slice of the fixture
    import spark.implicits._
    val docs = Tables.documents(spark, sf).where(col("doc_id") < 60)
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    val suffixes = texts.flatMap { case (id, text) =>
      val t = text.split(" ")
      (0 to t.length - Corpus.SpanTokens).map(i =>
        (id, t.slice(i, math.min(i + Corpus.MaxRepCap, t.length))))
    }
    def lcp(a: Array[String], b: Array[String]): Int = {
      val n = math.min(a.length, b.length)
      var k = 0
      while (k < n && a(k) == b(k)) k += 1
      k
    }
    val brute = suffixes.indices.map { x =>
      val (id, sx) = suffixes(x)
      var best = 0
      var y = 0
      while (y < suffixes.length) {
        if (y != x) best = math.max(best, lcp(sx, suffixes(y)._2))
        y += 1
      }
      (id, best)
    }.groupBy(_._1).view
      .mapValues(v => { val m = v.map(_._2).max; if (m >= Corpus.SpanTokens) m else 0 })
      .toMap
    val engine = Corpus.spanMaxrep(docs)
      .as[(Long, Long)].collect().toMap
    texts.foreach { case (id, _) =>
      assert(engine(id) == brute.getOrElse(id, 0).toLong,
        s"doc $id: engine ${engine(id)} vs brute ${brute.getOrElse(id, 0)}")
    }
    assert(brute.values.exists(_ > 0), "subset has no repeats — vacuous audit")
  }
}
