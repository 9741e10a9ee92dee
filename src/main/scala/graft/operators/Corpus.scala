package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame}
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
    * df² — and the join is SALTED so those rows spread over 8 reducers
    * deterministically (r6: AqeSkewSpec proved AQE's skew-split cannot
    * engage here — the df-side aggregate pipelines between its shuffle
    * stage and the join, a shape OptimizeSkewedJoin cannot re-read; the
    * df agg itself is map-side combined and immune). Reassembly
    * concatenates per-doc kept chunks — bounded by document size, never
    * corpus size.
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
  ) { (s, dir) => chunkDedup(Tables.documents(s, dir)) }

  /** The boilerplate scrub behind [[qChunkDedup]], reusable over any
    * (doc_id, text) frame (the AQE skew spec plants a mega-hot chunk). */
  def chunkDedup(docs: DataFrame): DataFrame = {
    // Par.boost: the chunk explosion (len/ChunkTokens rows per doc)
    // runs on the scan's partitioning — one core on single-file fixtures
    val w = Par.boost(docs)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    // codegen'd strided window pass ([[graft.functions.WordNgrams]],
    // keepPartial — the trailing short chunk, exactly the old
    // slice-truncation); same chunks in the same positions
    val c = w
      .select(col("doc_id"),
        posexplode(graft.functions.WordNgrams.wordNgrams(col("t"),
          ChunkTokens, ChunkTokens, keepPartial = true)))
      .select(col("doc_id"), (col("pos") + 1).as("ord"), col("col").as("chunk"))
    // SALTED join back (r6, after AqeSkewSpec proved the alternative
    // impossible): AQE's skew-split cannot re-read a join side whose
    // final aggregate pipelines between the shuffle stage and the join —
    // exactly the df-table side here — so a mega-hot boilerplate chunk's
    // partition would be an unsplittable straggler at 100 TB. Salting
    // spreads each chunk's occurrences over 8 reducers for the price of
    // replicating the distinct-chunk table (one narrow row per chunk,
    // ≪ corpus) 8×; results are join-identical (oracle unchanged, and
    // the planted-mega-hot-chunk spec pins both result and plan shape).
    val df = c.groupBy("chunk").agg(count(lit(1)).as("df"))
      .withColumnRenamed("chunk", "chunk_r")
    Skew.saltedJoin(c, df, "chunk", "chunk_r", salts = 8)
      .drop("chunk_r")
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
    // The distinct per-doc n-gram-hash table is a build-once ON-DISK
    // artifact (r16): it is referenced THREE times below (benchmark
    // side, totals, hits), so the inline shape re-exploded and
    // re-distinct'ed the corpus per reference — 36M shuffle records at
    // sf10 for a table that is a pure function of the corpus. In
    // production the decontamination index is persisted once and
    // re-joined against every moving benchmark set.
    val art = graft.IndexStore.artifact(dir, "contamng-v1",
      Seq("documents")) { out =>
      // Par.boost: ~40 n-grams exploded + hashed per doc, pre-shuffle
      graft.IndexStore.stage("g") {
        // codegen'd window pass ([[graft.functions.WordNgrams]] — the
        // old transform/slice/array_join lambda was interpreted per
        // window and dominated this build's one stage)
        Par.boost(Tables.documents(s, dir))
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .where(size(col("t")) >= ContamNgram)
          .select(col("doc_id"),
            explode(graft.functions.WordNgrams.wordNgrams(col("t"),
              ContamNgram)).as("ngs"))
          .select(col("doc_id"), xxhash64(col("ngs")).as("ng"))
          .distinct()
          .write.parquet(s"$out/g")
      }
      // footer metadata — free; the distinct (doc, ngram-hash) volume is
      // the build's whole cost driver
      graft.IndexStore.note("g_rows", s.read.parquet(s"$out/g").count())
    }
    val g = s.read.parquet(s"$art/g")
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
    // codegen'd window pass ([[graft.functions.WordNgrams]]); xxhash64
    // moves outside the old interpreted lambda — same hash per window
    val win = w.where(size(col("t")) >= SpanTokens)
      .select(col("doc_id"),
        posexplode(graft.functions.WordNgrams.wordNgrams(col("t"),
          SpanTokens)))
      .select(col("doc_id"), (col("pos") + 1).as("i"),
        xxhash64(col("col")).as("s"))
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

  /** Suffix cap for [[qSpanMaxrep]], in tokens: repeats longer than this
    * report the cap (fixture docs are 10-99 tokens, so 64 never bites
    * there; at 100 TB the cap bounds per-row comparison cost). */
  val MaxRepCap = 64

  /** EXACT maximal-repeat length per document (the suffix-array-grade
    * ExactSubstr measurement — VERDICT r5 item 4): `max_rep(d)` is the
    * token length of the longest span of `d` that also occurs at some
    * OTHER position in the corpus (any document, or `d` itself at a
    * different offset), exact for lengths in [[[SpanTokens]], [[MaxRepCap]]],
    * 0 when no span of ≥ [[SpanTokens]] tokens repeats.
    *
    * Partitioned suffix-sort formulation, no suffix array needed:
    *  - any repeat of length m ≥ 8 starts at a position whose 8-token
    *    window is corpus-hot (df ≥ 2), so only hot positions matter;
    *  - bucket = the window's 8 tokens themselves: every pair with
    *    token-LCP ≥ 8 shares a bucket, so per-bucket work is exhaustive
    *    for the ≥8 regime;
    *  - within a bucket, suffixes (capped at [[MaxRepCap]] tokens) sort
    *    lexicographically and each row's max token-LCP against ANY other
    *    suffix is attained at an immediate sorted neighbor (the suffix-
    *    array LCP property: slcp(a,c) = min over the path, and token-LCP
    *    is monotone in string-LCP), so lag/lead suffice — O(bucket log
    *    bucket), never bucket².
    *
    * Scale: explode to ~len windows/doc (the ExactSubstr price, same as
    * [[qSpanDedup]]); one df agg; identical capped suffixes collapse
    * FIRST through a hash agg + equi-join (both AQE-splittable — a
    * window sort alone would be an unsplittable straggler on a
    * boilerplate-hot bucket, since AQE cannot split a skewed window
    * partition), so the per-bucket suffix sort runs over DISTINCT
    * suffixes only; comparisons bounded by the 64-token cap. The oracle
    * computes the same values through the plain sorted-neighbor
    * formulation. */
  val qSpanMaxrep: Q = Q(
    "q_span_maxrep",
    Some {
      // NULLIF: DuckDB list_position yields 0 (not NULL) when no element
      // matches, i.e. when the two capped suffixes agree end-to-end
      def tlcp(a: String, b: String) =
        s"""CASE WHEN $b IS NULL THEN 0 ELSE COALESCE(
           |  NULLIF(list_position(list_transform(
           |    range(1, least(len($a), len($b)) + 1),
           |    k -> $a[k] = $b[k]), false), 0) - 1,
           |  least(len($a), len($b))) END""".stripMargin
      s"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      sfx AS (
        SELECT doc_id, i, t[i : i + ${MaxRepCap - 1}] AS st,
               array_to_string(t[i : i + ${SpanTokens - 1}], ' ') AS w8
        FROM w, unnest(generate_series(1, len(t) - ${SpanTokens - 1})) AS u(i)
        WHERE len(t) >= $SpanTokens),
      df AS (SELECT w8, COUNT(*) AS df FROM sfx GROUP BY w8),
      hot AS (SELECT sfx.doc_id, sfx.i, sfx.w8, sfx.st,
                     array_to_string(sfx.st, ' ') AS ss
              FROM sfx JOIN df ON sfx.w8 = df.w8 WHERE df.df >= 2),
      nb AS (
        SELECT doc_id, i, st,
               lag(st)  OVER (PARTITION BY w8 ORDER BY ss, doc_id, i) AS pst,
               lead(st) OVER (PARTITION BY w8 ORDER BY ss, doc_id, i) AS nst
        FROM hot),
      ml AS (
        SELECT doc_id,
               GREATEST(${tlcp("st", "pst")}, ${tlcp("st", "nst")}) AS l
        FROM nb),
      mx AS (SELECT doc_id, MAX(l) AS max_rep FROM ml GROUP BY doc_id)
      SELECT w.doc_id, CAST(COALESCE(mx.max_rep, 0) AS BIGINT) AS max_rep
      FROM w LEFT JOIN mx ON w.doc_id = mx.doc_id
      ORDER BY w.doc_id
      """.stripMargin.trim
    }
  ) { (s, dir) => spanMaxrep(Tables.documents(s, dir)) }

  /** The exact maximal-repeat pipeline behind [[qSpanMaxrep]], reusable
    * over any (doc_id, text) frame (brute-force-audited in CorpusSpec). */
  def spanMaxrep(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def tlcp(a: Column, b: Column): Column = when(b.isNull, 0).otherwise {
      val pos = array_position(zip_with(a, b, (x, y) => x <=> y), false)
      when(pos === 0, least(size(a), size(b))).otherwise(pos - 1)
    }
    val w = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val sfx = w.where(size(col("t")) >= SpanTokens)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("t")) - (SpanTokens - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"),
        slice(col("t"), col("i"), lit(MaxRepCap)).as("st"),
        array_join(slice(col("t"), col("i"), lit(SpanTokens)), " ").as("w8"))
    val df = sfx.groupBy("w8").agg(count(lit(1)).as("df"))
    val hot = sfx.join(df.where(col("df") >= 2), "w8")
      .withColumn("ss", array_join(col("st"), " "))
    // Collapse identical capped suffixes before the sort (tokens carry no
    // spaces, so ss ↔ st is 1:1): a group of g ≥ 2 hands every member its
    // own capped length — tlcp(a,a) = len(a), the maximum any comparison
    // can reach — via a hash agg + equi-join that AQE splits under skew.
    // The window then sorts only DISTINCT suffixes per bucket, so a
    // 100k-occurrence boilerplate suffix costs one row in the sort
    // instead of an unsplittable 100k-row window partition. Exact: for
    // unique suffixes the distinct-neighbor LCP equals the full-order
    // neighbor LCP (duplicates of a neighbor never change a prefix).
    val grp = hot.groupBy("w8", "ss")
      .agg(count(lit(1)).as("g"), first("st").as("st"))
    val win = Window.partitionBy("w8").orderBy("ss")
    val nbDistinct = grp.select(col("w8"), col("ss"),
      greatest(
        tlcp(col("st"), lag(col("st"), 1).over(win)),
        tlcp(col("st"), lead(col("st"), 1).over(win)),
        when(col("g") >= 2, size(col("st"))).otherwise(lit(0))).as("l"))
    val nb = hot.join(nbDistinct, Seq("w8", "ss"))
      .select(col("doc_id"), col("l"))
    val mx = nb.groupBy("doc_id").agg(max("l").as("max_rep"))
    w.select("doc_id").join(mx, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("max_rep"), lit(0)).cast("long").as("max_rep"))
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
    Seq(qChunkDedup, qContamNgram, qLexicalDiversity, qSpanDedup, qSpanMaxrep)
}
