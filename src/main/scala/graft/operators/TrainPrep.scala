package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data preparation operators — the curation stages an LLM data
  * pipeline runs between raw corpus and tokenizer, beyond dedup/similarity
  * (TextOps/Similarity): deterministic sampling, split assignment,
  * length bucketing, PII masking, benchmark decontamination, hash
  * sharding, and domain mixture weights.
  *
  * Determinism discipline: every stochastic-looking choice (sample, split,
  * shard) is a pure function of a content-stable md5 key, so reruns —
  * and the DuckDB oracle — reproduce it bit-for-bit. That is also the
  * 100 TB shape: hash-gated membership is a narrow projection + filter
  * with NO shuffle and no RNG state to coordinate across 1000 executors,
  * unlike `sample()`/`rand()` whose seeds are per-partition-dependent.
  */
object TrainPrep extends QueryPack {

  /** Content-stable uniform [0,1)-ish key: lowercase md5 hex of the id.
    * Lexicographic comparison against a hex prefix is a uniform threshold
    * test in both engines (identical md5, identical collation for
    * [0-9a-f]). */
  private def hkey(c: org.apache.spark.sql.Column) = md5(c.cast("string"))
  private val hkeySql = "md5(CAST(doc_id AS VARCHAR))"

  // ------------------------------------------------------------ sampling

  /** Deterministic corpus sampling: md5(doc_id) < '2' keeps 2/16 = 12.5%.
    * Scale shape: a codegen'd filter directly over the scan — no shuffle,
    * no seed coordination, stable across reruns and engines. */
  val qSampleHash: Q = Q(
    "q_sample_hash",
    Some(s"""
      SELECT doc_id, lang, n_chars
      FROM documents
      WHERE $hkeySql < '2'
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .where(hkey(col("doc_id")) < "2")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** Train/val/test assignment from the same stable key: '0d' ≈ 5.1%,
    * '1a' ≈ 10.2% cumulative — so ≈5% test, ≈5% val, ≈90% train, with a
    * doc's split immutable under corpus growth (the property shuffled
    * splits lose). Aggregated per split for the oracle. */
  val qSplitAssign: Q = Q(
    "q_split_assign",
    Some(s"""
      WITH h AS (SELECT n_chars, $hkeySql AS h FROM documents),
      s AS (SELECT CASE WHEN h < '0d' THEN 'test'
                        WHEN h < '1a' THEN 'val'
                        ELSE 'train' END AS split, n_chars FROM h)
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM s GROUP BY split
      ORDER BY split
      """.stripMargin.trim)
  ) { (s, dir) =>
    val h = Tables.documents(s, dir)
      .select(col("n_chars"), hkey(col("doc_id")).as("h"))
    h.select(
        when(col("h") < "0d", "test")
          .when(col("h") < "1a", "val")
          .otherwise("train").as("split"),
        col("n_chars"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("split")
  }

  // ----------------------------------------------------------- bucketing

  /** Sequence-length bucketing (64-char buckets): the histogram a packing/
    * batching stage sizes its token budgets from. One hash-agg over a
    * narrow projection; whitespace token counts ride along. */
  val qLengthBuckets: Q = Q(
    "q_length_buckets",
    Some("""
      WITH b AS (SELECT CAST(floor(n_chars / 64.0) AS BIGINT) AS bucket,
                        n_chars, len(string_split(text, ' ')) AS toks
                 FROM documents)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(toks) AS BIGINT) AS total_tokens
      FROM b GROUP BY bucket
      ORDER BY bucket
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(floor(col("n_chars") / 64.0).cast("long").as("bucket"),
        col("n_chars"), size(split(col("text"), " ")).as("toks"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum("toks").cast("long").as("total_tokens"))
      .orderBy("bucket")
  }

  // ----------------------------------------------------------- PII scrub

  /** PII masking over customer identifiers: digit runs → '#', with a
    * per-row redaction count. Pure codegen'd regexp projection — the
    * flat-map shape of every scrubbing pass (emails, phones, SSNs, keys);
    * the pattern is the variable, the plan is not. */
  val qPiiScrub: Q = Q(
    "q_pii_scrub",
    Some("""
      SELECT c_custkey,
             regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
             CAST(length(c_name)
                  - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INT) AS n_digits
      FROM customer
      ORDER BY c_custkey
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        (length(col("c_name"))
          - length(regexp_replace(col("c_name"), "[0-9]", ""))).cast("int")
          .as("n_digits"))
      .orderBy("c_custkey")
  }

  // ----------------------------------------- benchmark decontamination

  /** Decontamination: which training docs share a 7-word shingle with the
    * held-out benchmark set (doc_id % 50 = 0)? The standard n-gram-overlap
    * contamination check run before training. Scale shape: shingles are
    * 60-bit hashes (narrow keys), the benchmark side is tiny and
    * broadcast — one pass over the corpus, no all-pairs, no wide-string
    * shuffle. */
  val qContamination: Q = Q(
    "q_contamination",
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      sh AS (SELECT doc_id, unnest(list_distinct(
               list_transform(range(1, greatest(len(l)-5, 1)),
                 i -> substr(md5(concat_ws(' ', l[i], l[i+1], l[i+2], l[i+3],
                                           l[i+4], l[i+5], l[i+6])), 1, 15)))) AS h
             FROM toks WHERE len(l) >= 7),
      bench AS (SELECT doc_id, h FROM sh WHERE doc_id % 50 = 0),
      train AS (SELECT doc_id, h FROM sh WHERE doc_id % 50 <> 0)
      SELECT t.doc_id, CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_hits
      FROM train t JOIN bench b ON t.h = b.h
      GROUP BY t.doc_id
      ORDER BY t.doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    // The 7-gram hash table is a build-once ON-DISK artifact (r16): one
    // md5 per 7-gram per doc is the corpus's heaviest text hashing
    // pass, and the inline shape computed it TWICE per run (benchmark
    // side + train side read the same subtree). Pure function of the
    // corpus; the decontamination index a real pipeline persists.
    val art = graft.IndexStore.artifact(dir, "contam7-v1",
      Seq("documents")) { out =>
      // Par.boost: pre-shuffle hashing (graft.operators.Par's rationale)
      graft.IndexStore.stage("sh") {
      Par.boost(Tables.documents(s, dir))
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .where(size(col("l")) >= 7)
        // codegen'd window pass ([[graft.functions.WordNgrams]]); md5
        // moves outside the old interpreted lambda. The per-doc
        // distinct now runs over the 7-gram STRINGS instead of their
        // md5-hex images — identical row set unless two distinct
        // 7-grams of one doc collide in the 60-bit md5 prefix, and even
        // then the query output (COUNT(DISTINCT bench doc_id) per train
        // doc over an equi-join on h) is invariant to per-doc h
        // duplicates, so the declared result is unconditionally
        // unchanged.
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.WordNgrams.wordNgrams(col("l"), 7))).as("ngs"))
        .select(col("doc_id"), substring(md5(col("ngs")), 1, 15).as("hx"))
        // store the 60-bit hash as an 8-byte LONG, not the 15-char hex
        // string: hex→decimal is injective at this width, so joins and
        // distincts are equivalence-preserving, and the artifact + the
        // join's shuffle carry half the bytes
        .select(col("doc_id"), conv(col("hx"), 16, 10).cast("long").as("h"))
        .write.parquet(s"$out/sh")
      }
      graft.IndexStore.note("sh_rows", s.read.parquet(s"$out/sh").count())
    }
    val sh = s.read.parquet(s"$art/sh")
    val bench = sh.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"), col("h"))
    val train = sh.where(col("doc_id") % 50 =!= 0)
    train.join(broadcast(bench), "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("bench_id")).as("n_bench_hits"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ sharding

  /** Deterministic output sharding: first md5 hex char → 16 shards. The
    * write-side layout op for a training corpus (stable shard membership,
    * uniform sizes); min/max hash per shard double as split points. */
  val qShuffleShard: Q = Q(
    "q_shuffle_shard",
    Some(s"""
      WITH h AS (SELECT substr($hkeySql, 1, 1) AS shard, $hkeySql AS h
                 FROM documents)
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             min(h) AS first_hash, max(h) AS last_hash
      FROM h GROUP BY shard
      ORDER BY shard
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(substring(hkey(col("doc_id")), 1, 1).as("shard"),
        hkey(col("doc_id")).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        min("h").as("first_hash"), max("h").as("last_hash"))
      .orderBy("shard")
  }

  // ------------------------------------------------------- domain mixing

  /** Domain (language) mixture weights for a uniform target mix: weight =
    * (total/k)/n_lang — the multiplier a sampler applies per domain.
    * Exact decimal arithmetic end-to-end (same discipline as the jaccard
    * oracle); the totals row is broadcast, the per-domain agg is one
    * shuffle on lang. */
  val qDomainMix: Q = Q(
    "q_domain_mix",
    Some("""
      WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS k FROM c)
      SELECT c.lang, c.n AS n_docs,
             CAST(round(CAST(t.total AS DECIMAL(18,9)) / (t.k * c.n), 6) AS DOUBLE) AS weight
      FROM c, t
      ORDER BY lang
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c = Tables.documents(s, dir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    val t = c.agg(sum("n").as("total"), count(lit(1)).as("k"))
    c.crossJoin(broadcast(t))
      .select(col("lang"), col("n").as("n_docs"),
        round(col("total").cast("decimal(18,9)") / (col("k") * col("n")), 6)
          .cast("double").as("weight"))
      .orderBy("lang")
  }

  // -------------------------------------------------- curation pipeline

  /** The composed curation pipeline — the stages above chained the way a
    * real corpus build runs them: English docs, in a length band, not an
    * exact duplicate (keep the smallest doc_id of each content group),
    * then hash-sampled at 50%. Output: per-source survivor counts and
    * volume. Every stage is a filter/agg over the previous one — Catalyst
    * collapses the chain into one scan + one dedup shuffle + one agg. */
  val qCuratePipeline: Q = Q(
    "q_curate_pipeline",
    Some(s"""
      WITH survivors AS (
        SELECT min(doc_id) AS doc_id, min(source) AS source,
               min(n_chars) AS n_chars
        FROM documents
        WHERE lang = 'en' AND n_chars BETWEEN 64 AND 4096
        GROUP BY md5(text)),
      sampled AS (
        SELECT * FROM survivors
        WHERE md5(CAST(doc_id AS VARCHAR)) < '8')
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM sampled GROUP BY source
      ORDER BY source
      """.stripMargin.trim)
  ) { (s, dir) =>
    val survivors = Tables.documents(s, dir)
      .where(col("lang") === "en" && col("n_chars").between(64, 4096))
      .groupBy(md5(col("text")))
      .agg(min("doc_id").as("doc_id"), min("source").as("source"),
        min("n_chars").as("n_chars"))
    survivors
      .where(hkey(col("doc_id")) < "8")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("source")
  }

  // ------------------------------------------------------------- tf-idf

  /** TF-IDF-style salient terms: top-3 tokens per doc by tf * (N/df),
    * computed in EXACT decimal arithmetic (no log, no float sums — the
    * rank order under N/df equals the order under log-idf for equal tf).
    * Scale shape: one token explode, df by token (shuffle on token), then
    * a broadcast of nothing — the doc-side window is partitioned by
    * doc_id, the natural key. Deterministic tiebreak on token. */
  val qTfidfTopterms: Q = Q(
    "q_tfidf_topterms",
    Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, tok),
      df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY tok),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.tok,
               CAST(round(CAST(tf.tf * n.n AS DECIMAL(18,9)) / df.df, 6) AS DOUBLE) AS score
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n),
      ranked AS (
        SELECT doc_id, tok, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk
        FROM scored)
      SELECT doc_id, tok, score, CAST(rnk AS BIGINT) AS rnk
      FROM ranked WHERE rnk <= 3
      ORDER BY doc_id, rnk
      """.stripMargin.trim)
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "tok").crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"),
        round((col("tf") * col("n")).cast("decimal(18,9)") / col("df"), 6)
          .cast("double").as("score"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .select(col("doc_id"), col("tok"), col("score"), col("rnk").cast("long").as("rnk"))
      .orderBy("doc_id", "rnk")
  }

  /** Stratified downsampling: per-language keep rates from the same
    * content-stable md5 key — the "downweight the over-represented
    * language" rebalancing every multilingual corpus runs ('en' keeps
    * 2/16 = 12.5%, everything else 8/16 = 50%).
    *
    * Scale: still a pure codegen'd filter over the scan — the stratum
    * only picks the threshold constant, so there is no per-stratum
    * shuffle, no count-then-sample second pass, and no RNG state; the
    * final per-lang agg is a map-side-combined hash agg over the
    * surviving rows. */
  val qSampleStratified: Q = Q(
    "q_sample_stratified",
    Some(s"""
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      FROM documents
      WHERE CASE WHEN lang = 'en' THEN $hkeySql < '2'
                 ELSE $hkeySql < '8' END
      GROUP BY lang
      ORDER BY lang
      """.stripMargin.trim)
  ) { (s, dir) =>
    val h = hkey(col("doc_id"))
    Tables.documents(s, dir)
      .where(when(col("lang") === "en", h < "2").otherwise(h < "8"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("kept_chars"))
      .orderBy("lang")
  }

  /** Importance (quality-weighted) sampling: each doc keeps with
    * probability proportional to its quality proxy (here min(1,
    * n_chars/1500)) — longer docs kept more often, the standard
    * upweight-good-data move. The uniform draw is a multiplicative hash
    * of doc_id expressed in plain integer arithmetic (identical in both
    * engines; md5-hex can't be compared against a per-row numeric
    * threshold lexicographically), so membership is still deterministic,
    * shuffle-free, and stable under corpus growth. */
  val qSampleWeighted: Q = Q(
    "q_sample_weighted",
    Some("""
      WITH k AS (SELECT lang, n_chars,
                   CAST((doc_id * 2654435761) % 1048576 AS DOUBLE) / 1048576
                     AS u,
                   LEAST(CAST(1 AS DOUBLE),
                         CAST(n_chars AS DOUBLE) / 1500) AS w
                 FROM documents)
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_kept,
             CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      FROM k WHERE u < w
      GROUP BY lang
      ORDER BY lang
      """.stripMargin.trim)
  ) { (s, dir) =>
    val u = pmod(col("doc_id") * 2654435761L, lit(1048576L)).cast("double") /
      1048576d
    val w = least(lit(1).cast("double"), col("n_chars").cast("double") / 1500d)
    Tables.documents(s, dir)
      .where(u < w)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("kept_chars"))
      .orderBy("lang")
  }

  // ---------------------------------------------------- sequence packing

  /** Sequence PACKING: the GPT-pretraining step that concatenates the
    * token stream per shard and cuts it into fixed-budget training
    * sequences. Each doc's start offset is the exclusive running token
    * sum within its shard (here: lang, the shard key), its first
    * sequence is `offset DIV budget`, and a doc "straddles" when its
    * last token falls in a later sequence. Per-sequence output: docs
    * started, tokens contributed by those docs, straddle count.
    *
    * Scale shape: the running sum is a window per SHARD — packing is
    * embarrassingly parallel across shards (exactly how a 1000-executor
    * tokenizer job runs it); nothing is global. All-integer arithmetic
    * ⇒ engine-exact. */
  val qSeqPack: Q = Q(
    "q_seq_pack",
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        FROM documents),
      offs AS (
        SELECT doc_id, lang, n_tok,
               COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM toks),
      placed AS (
        SELECT lang, n_tok,
               off // 512 AS seq_id,
               CASE WHEN (off + n_tok - 1) // 512 > off // 512
                    THEN 1 ELSE 0 END AS straddle
        FROM offs)
      SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM(straddle) AS BIGINT) AS n_straddle
      FROM placed
      GROUP BY lang, seq_id
      ORDER BY lang, seq_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val budget = 512
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = toks
      .withColumn("off", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("lang"), col("n_tok"),
        expr(s"off DIV $budget").as("seq_id"),
        when(expr(s"(off + n_tok - 1) DIV $budget") > expr(s"off DIV $budget"),
          1L).otherwise(0L).as("straddle"))
    placed.groupBy("lang", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum("straddle").as("n_straddle"))
      .orderBy("lang", "seq_id")
  }

  /** Packing EFFICIENCY audit: per shard, how well the fixed 512-token
    * budget is used — sequences needed (contiguous packing ⇒ exactly
    * ceil(total/512)), utilization of the allocated budget, and the
    * straddle rate (docs cut across a sequence boundary, the fraction a
    * boundary-respecting packer would instead pad). The number a
    * pretraining-data owner actually watches; all-integer inputs, one
    * fixed division rounded at the end. */
  val qPackEfficiency: Q = Q(
    "q_pack_efficiency",
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok
        FROM documents),
      offs AS (
        SELECT doc_id, lang, n_tok,
               COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM toks),
      placed AS (
        SELECT lang, n_tok,
               CASE WHEN (off + n_tok - 1) // 512 > off // 512
                    THEN 1 ELSE 0 END AS straddle
        FROM offs),
      agg AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST((SUM(n_tok) + 511) // 512 AS BIGINT) AS n_seqs,
               CAST(SUM(straddle) AS BIGINT) AS n_straddle
        FROM placed GROUP BY lang)
      SELECT lang, n_docs, n_tokens, n_seqs, n_straddle,
             CAST(round(CAST(n_tokens AS DECIMAL(18,9)) / (n_seqs * 512), 6)
               AS DOUBLE) AS util
      FROM agg ORDER BY lang
      """.stripMargin.trim)
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val budget = 512
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = toks
      .withColumn("off", coalesce(sum("n_tok").over(w), lit(0L)))
      .select(col("lang"), col("n_tok"),
        when(expr(s"(off + n_tok - 1) DIV $budget") > expr(s"off DIV $budget"),
          1L).otherwise(0L).as("straddle"))
    placed.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        sum("straddle").as("n_straddle"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr(s"(n_tokens + ${budget - 1}) DIV $budget").as("n_seqs"),
        col("n_straddle"),
        round(col("n_tokens").cast("decimal(18,9)") / (col("n_seqs") * budget), 6)
          .cast("double").as("util"))
      .orderBy("lang")
  }

  /** Exact-N deterministic sample: the 64 docs with the smallest content
    * hash — reservoir-sampling semantics (every doc equally likely under
    * the hash's uniformity) with none of reservoir state's coordination.
    * Plan shape is the one that matters at 100 TB: ORDER BY + LIMIT plans
    * as TakeOrderedAndProject — a bounded per-partition heap and a
    * driver-side merge of N rows, never a global sort. Stable under
    * re-runs AND under partitioning (the hash is content-derived). */
  val qSampleTopn: Q = Q(
    "q_sample_topn",
    Some("""
      SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS sk
      FROM documents
      ORDER BY sk, doc_id
      LIMIT 64
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("sk"))
      .orderBy(col("sk"), col("doc_id"))
      .limit(64)
  }

  /** TEMPERATURE-rebalanced domain mix: the standard pretraining move of
    * sampling domain i with probability ∝ n_i^α (α = 0.5 here) so
    * low-resource domains are upweighted relative to their natural
    * share without dominating. Emits natural share, temperature share,
    * and the boost factor per domain — the table a data-mix owner reads
    * before launching a run. One tiny aggregate + a broadcast of the
    * global totals; sqrt is correctly-rounded IEEE in both engines and
    * shares are rounded to 6 places, so the oracle hash-matches. */
  val qDomainTemperature: Q = Q(
    "q_domain_temperature",
    Some("""
      WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
                 FROM documents GROUP BY lang),
      t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                   SUM(sqrt(CAST(n_docs AS DOUBLE))) AS wsum
            FROM c)
      SELECT lang, n_docs,
             CAST(round(CAST(n_docs AS DOUBLE) / total, 6) AS DOUBLE) AS nat_share,
             CAST(round(sqrt(CAST(n_docs AS DOUBLE)) / wsum, 6) AS DOUBLE) AS temp_share,
             CAST(round((sqrt(CAST(n_docs AS DOUBLE)) / wsum) /
                        (CAST(n_docs AS DOUBLE) / total), 6) AS DOUBLE) AS boost
      FROM c, t
      ORDER BY lang
      """.stripMargin.trim)
  ) { (s, dir) =>
    val c = Tables.documents(s, dir)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val t = c.agg(sum("n_docs").as("total"),
      sum(sqrt(col("n_docs").cast("double"))).as("wsum"))
    val nat = col("n_docs").cast("double") / col("total")
    val temp = sqrt(col("n_docs").cast("double")) / col("wsum")
    c.crossJoin(broadcast(t))
      .select(col("lang"), col("n_docs"),
        round(nat, 6).as("nat_share"),
        round(temp, 6).as("temp_share"),
        round(temp / nat, 6).as("boost"))
      .orderBy("lang")
  }

  /** Shard-export manifest, verified THROUGH the filesystem: the corpus
    * is written as [[ExportShards]] single-file shards
    * ([[graft.operators.ShardWriter]], memoized per dir like the
    * bucketed layouts), read BACK from the exported files, and
    * summarized per shard — while the oracle predicts the same manifest
    * straight from the documents table (the h60 shard arithmetic is
    * SQL-reproducible). A hash-match therefore proves the export lost
    * nothing, routed every doc to its deterministic shard, and kept the
    * in-shard sort keys intact — the "did my training data survive the
    * writer" audit, as a declared query. */
  val ExportShards = 8
  private val exported =
    scala.collection.concurrent.TrieMap.empty[(org.apache.spark.sql.SparkSession, String), String]
  val qExportManifest: Q = Q(
    "q_export_manifest",
    Some(s"""
      WITH h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                 % $ExportShards AS shard,
               md5(CAST(doc_id AS VARCHAR)) AS sort_key,
               n_chars
        FROM documents)
      SELECT CAST(shard AS INT) AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             min(sort_key) AS first_key,
             max(sort_key) AS last_key
      FROM h GROUP BY shard
      ORDER BY shard
      """.stripMargin.trim)
  ) { (s, dir) =>
    val out = exported.getOrElseUpdate((s, dir), {
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft-export/${Integer.toHexString(dir.hashCode)}").getAbsolutePath
      graft.operators.ShardWriter.write(
        Tables.documents(s, dir).select("doc_id", "n_chars"),
        path, ExportShards)
      path
    })
    s.read.parquet(out)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        min("sort_key").as("first_key"),
        max("sort_key").as("last_key"))
      .orderBy("shard")
  }

  override def all: Seq[Q] = Seq(
    qSampleHash, qSplitAssign, qLengthBuckets, qPiiScrub,
    qContamination, qShuffleShard, qDomainMix, qCuratePipeline,
    qTfidfTopterms, qSampleStratified, qSampleWeighted, qSeqPack,
    qPackEfficiency, qSampleTopn, qDomainTemperature, qExportManifest)
}
