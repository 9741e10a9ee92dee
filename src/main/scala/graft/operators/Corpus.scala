package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a pretraining-data pipeline runs between raw
  * ingestion and tokenization: cross-document boilerplate removal at
  * sub-document granularity, benchmark decontamination by n-gram overlap,
  * and per-document lexical-diversity scoring. (The reference connector —
  * `examples/main.cpp:29-43` — hands rows to the application untouched;
  * these are the first transforms such an application applies to text.)
  *
  * `documents.text` is single-space-separated tokens (FIXTURES.md), so
  * `split(text, ' ')` / DuckDB `string_split` tokenize identically; every
  * derived quantity below is integer or string arithmetic plus at most one
  * final IEEE division, so both engines emit bit-identical values.
  */
object Corpus extends QueryPack {

  /** Sub-document dedup granularity, in tokens. Fixture texts are 10-99
    * tokens, so 4-token chunks both repeat across near-duplicate docs
    * (the cap provably bites: df reaches 10 at sf0.01) and leave most
    * text intact. */
  val ChunkTokens = 4

  /** A chunk is boilerplate when its corpus-wide occurrence count reaches
    * this df. */
  val ChunkMinDf = 2

  /** Cross-document boilerplate scrub (the CCNet/RefinedWeb "remove
    * duplicated lines across the corpus" pass, at token-chunk granularity
    * since the fixture text has no newlines): split every document into
    * consecutive [[ChunkTokens]]-token chunks, count each chunk's exact
    * occurrences corpus-wide, drop every occurrence of chunks seen
    * [[ChunkMinDf]]+ times, and reassemble the survivors in order.
    *
    * Scale: one explode to ~tokens/[[ChunkTokens]] rows, one hash agg for
    * the df table (map-side combined), one shuffle-on-chunk join back,
    * one per-doc agg — no self-join, no window over few keys. At 100 TB
    * the df table is df-counted and joined on a 128-bit chunk hash
    * instead of the string (collision odds ~n²/2¹²⁸); the string key
    * here keeps the oracle exact. A mega-hot boilerplate chunk (df in
    * the millions) stays LINEAR — the join back emits df rows, never
    * df² — but lands those rows in one shuffle partition; AQE's
    * skew-join split handles that, and the work is join-only (the df
    * agg itself is map-side combined). Reassembly concatenates per-doc
    * kept chunks — bounded by document size, never corpus size.
    */
  val qChunkDedup: Q = Q(
    "q_chunk_dedup",
    Some(s"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      c AS (
        SELECT doc_id, i AS ord,
               array_to_string(t[(i-1)*$ChunkTokens+1 :
                                 least(i*$ChunkTokens, len(t))], ' ') AS chunk
        FROM w, unnest(generate_series(
               1, CAST(ceil(len(t) / $ChunkTokens.0) AS BIGINT))) AS u(i)),
      df AS (SELECT chunk, COUNT(*) AS df FROM c GROUP BY chunk)
      SELECT c.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_chunks,
             CAST(COUNT(*) FILTER (WHERE df.df >= $ChunkMinDf) AS BIGINT)
               AS n_dropped,
             COALESCE(string_agg(c.chunk, ' ' ORDER BY c.ord)
                        FILTER (WHERE df.df < $ChunkMinDf), '') AS clean_text
      FROM c JOIN df ON c.chunk = df.chunk
      GROUP BY c.doc_id
      ORDER BY c.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val c = w
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), ceil(size(col("t")) / lit(ChunkTokens.toDouble)).cast("int")),
          i => array_join(
            slice(col("t"), (i - 1) * ChunkTokens + 1, lit(ChunkTokens)), " "))))
      .select(col("doc_id"), (col("pos") + 1).as("ord"), col("col").as("chunk"))
    val df = c.groupBy("chunk").agg(count(lit(1)).as("df"))
    c.join(df, "chunk")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("df") >= ChunkMinDf, 1)).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("df") < ChunkMinDf, struct(col("ord"), col("chunk"))))),
            x => x.getField("chunk")),
          " ").as("clean_text"))
      .orderBy("doc_id")
  }

  /** Word n-gram width for decontamination. */
  val ContamNgram = 5

  /** Benchmark membership predicate: every 29th doc plays the held-out
    * eval set (at scale: the real benchmark corpus). */
  val ContamBenchMod = 29

  /** Benchmark decontamination by n-gram overlap — the standard check
    * before a corpus ships as training data: any document sharing enough
    * [[ContamNgram]]-gram spans with the benchmark set is flagged, with
    * its overlap fraction. Emits only contaminated docs (overlap > 0).
    *
    * Scale: the benchmark n-gram set is tiny relative to the corpus and
    * is broadcast; the corpus makes one pass (explode → per-doc distinct),
    * then one broadcast semi-ish join + two per-doc aggs. The distinct
    * and join run on `xxhash64(ngram)` — 8 bytes through the shuffle
    * instead of the ~40-byte span text, the standard n-gram-hashing
    * trade (collision odds ~n²/2⁶⁴; the oracle counting the strings
    * themselves hash-matching proves none occurred). The contam_rate
    * division is the single IEEE op, identical in both engines.
    */
  val qContamNgram: Q = Q(
    "q_contam_ngram",
    Some(s"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      g AS (
        SELECT DISTINCT doc_id,
               array_to_string(t[i : i + ${ContamNgram - 1}], ' ') AS ng
        FROM w, unnest(generate_series(1, len(t) - ${ContamNgram - 1})) AS u(i)
        WHERE len(t) >= $ContamNgram),
      bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % $ContamBenchMod = 0),
      tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM g
              WHERE doc_id % $ContamBenchMod <> 0 GROUP BY doc_id),
      hit AS (SELECT g.doc_id, COUNT(*) AS n_hit
              FROM g JOIN bench ON g.ng = bench.ng
              WHERE g.doc_id % $ContamBenchMod <> 0 GROUP BY g.doc_id)
      SELECT hit.doc_id AS doc_id, tot.n_ngrams, hit.n_hit,
             CAST(hit.n_hit AS DOUBLE) / CAST(tot.n_ngrams AS DOUBLE)
               AS contam_rate
      FROM hit JOIN tot ON hit.doc_id = tot.doc_id
      ORDER BY hit.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= ContamNgram)
    val g = w
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), size(col("t")) - (ContamNgram - 1)),
          i => array_join(slice(col("t"), i, lit(ContamNgram)), " "))).as("ngs"))
      .select(col("doc_id"), xxhash64(col("ngs")).as("ng"))
      .distinct()
    val bench = g.where(col("doc_id") % ContamBenchMod === 0)
      .select(col("ng")).distinct()
    val corpus = g.where(col("doc_id") % ContamBenchMod =!= 0)
    val tot = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_ngrams"))
    val hit = corpus.join(broadcast(bench), "ng")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    hit.join(tot, "doc_id")
      .select(col("doc_id"), col("n_ngrams"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_ngrams").cast("double"))
          .as("contam_rate"))
      .orderBy("doc_id")
  }

  /** Overlapping-window width for duplicated-span measurement. */
  val SpanTokens = 8

  /** Alignment-robust duplicated-span measurement — the ExactSubstr-style
    * pass ([[qChunkDedup]]'s complement): every OVERLAPPING
    * [[SpanTokens]]-token window (stride 1) is df-counted corpus-wide,
    * windows occurring twice+ are "hot", and each document reports how
    * many of its token positions are covered by some hot window — the
    * duplicated mass an exact-substring dedup would cut, found at ANY
    * alignment (a one-token insertion defeats fixed chunks; it only
    * shifts these windows).
    *
    * Scale: stride 1 costs len windows per doc — the price ExactSubstr
    * pays for alignment independence (stride s divides cost and recall).
    * Window identity is `xxhash64(span)` through the shuffle (8-byte
    * keys; the string-counting oracle hash-matching proves zero
    * collisions). Coverage explodes only HOT windows × [[SpanTokens]]
    * positions — bounded by the duplication actually present, not the
    * corpus. One df agg + one join back + two small aggs; no self-join.
    */
  val qSpanDedup: Q = Q(
    "q_span_dedup",
    Some(s"""
      WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      base AS (SELECT doc_id, len(t) AS n FROM w),
      win AS (
        SELECT doc_id, i,
               array_to_string(t[i : i + ${SpanTokens - 1}], ' ') AS s
        FROM w, unnest(generate_series(1, len(t) - ${SpanTokens - 1})) AS u(i)
        WHERE len(t) >= $SpanTokens),
      df AS (SELECT s, COUNT(*) AS df FROM win GROUP BY s),
      nw AS (SELECT doc_id, COUNT(*) AS n_windows FROM win GROUP BY doc_id),
      hot AS (SELECT win.doc_id, win.i FROM win
              JOIN df ON win.s = df.s WHERE df.df >= 2),
      nh AS (SELECT doc_id, COUNT(*) AS n_hot FROM hot GROUP BY doc_id),
      cov AS (SELECT DISTINCT doc_id, i + j AS p
              FROM hot, unnest(generate_series(0, ${SpanTokens - 1})) AS v(j)),
      cv AS (SELECT doc_id, COUNT(*) AS dup_tokens FROM cov GROUP BY doc_id)
      SELECT b.doc_id,
             CAST(b.n AS BIGINT) AS n_tokens,
             CAST(COALESCE(nw.n_windows, 0) AS BIGINT) AS n_windows,
             CAST(COALESCE(nh.n_hot, 0) AS BIGINT) AS n_hot,
             CAST(COALESCE(cv.dup_tokens, 0) AS BIGINT) AS dup_tokens,
             CAST(COALESCE(cv.dup_tokens, 0) AS DOUBLE) / CAST(b.n AS DOUBLE)
               AS dup_mass
      FROM base b
      LEFT JOIN nw ON b.doc_id = nw.doc_id
      LEFT JOIN nh ON b.doc_id = nh.doc_id
      LEFT JOIN cv ON b.doc_id = cv.doc_id
      ORDER BY b.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val w = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val base = w.select(col("doc_id"), size(col("t")).cast("long").as("n"))
    val win = w.where(size(col("t")) >= SpanTokens)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("t")) - (SpanTokens - 1)),
          i => xxhash64(array_join(slice(col("t"), i, lit(SpanTokens)), " ")))))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("s"))
    val df = win.groupBy("s").agg(count(lit(1)).as("df"))
    val nw = win.groupBy("doc_id").agg(count(lit(1)).as("n_windows"))
    val hot = win.join(df.where(col("df") >= 2), "s")
      .select(col("doc_id"), col("i"))
    val nh = hot.groupBy("doc_id").agg(count(lit(1)).as("n_hot"))
    val cv = hot
      .select(col("doc_id"),
        explode(sequence(col("i"), col("i") + (SpanTokens - 1))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("dup_tokens"))
    base
      .join(nw, Seq("doc_id"), "left")
      .join(nh, Seq("doc_id"), "left")
      .join(cv, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n").as("n_tokens"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_hot"), lit(0L)).as("n_hot"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast("double")
          / col("n").cast("double")).as("dup_mass"))
      .orderBy("doc_id")
  }

  /** Per-document lexical-diversity profile — the vocabulary-richness
    * quality signals (type-token ratio, Simpson diversity, top-token
    * dominance) a filtering pipeline thresholds on, computed EXACTLY:
    * all counts are integers; each output ratio is a single IEEE
    * division of exact integers, so Spark and DuckDB agree bitwise
    * (no logs — entropy's ln is not correctly-rounded-guaranteed across
    * libms, Simpson diversity is, and ranks documents the same way).
    *
    * Scale: explode → (doc, token) hash agg → per-doc hash agg; both
    * aggs map-side combine, nothing is quadratic, no windows.
    */
  val qLexicalDiversity: Q = Q(
    "q_lexical_diversity",
    Some("""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      tc AS (
        SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
      d AS (
        SELECT doc_id,
               SUM(c) AS n_tokens,
               COUNT(*) AS n_types,
               SUM(c * c) AS sum_c2,
               MAX(c) AS max_c
        FROM tc GROUP BY doc_id)
      SELECT doc_id,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(n_types AS BIGINT) AS n_types,
             CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
             CAST(n_tokens * n_tokens - sum_c2 AS DOUBLE)
               / CAST(n_tokens * n_tokens AS DOUBLE) AS simpson,
             CAST(max_c AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_share
      FROM d
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val tc = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
    tc.groupBy("doc_id")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("sum_c2"), max("c").as("max_c"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        ((col("n_tokens") * col("n_tokens") - col("sum_c2")).cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double")).as("simpson"),
        (col("max_c").cast("double") / col("n_tokens").cast("double"))
          .as("top_share"))
      .orderBy("doc_id")
  }

  override def all: Seq[Q] =
    Seq(qChunkDedup, qContamNgram, qLexicalDiversity, qSpanDedup)
}
