package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text operators: deduplication (exact, MinHash+LSH,
  * SimHash, n-gram Jaccard) and text analysis (stats, token counting,
  * language-ID heuristic, quality scoring, fingerprinting).
  *
  * Everything here is oracle-checked: all hashing is built on md5 (identical
  * in Spark and DuckDB), reduced to 60-bit ints via hex → decimal
  * conversion, so even the MinHash signatures hash-match across engines.
  *
  * Scale notes (the whole point of these ops is 100 TB corpora):
  *  - Dedup families never materialize all-pairs: MinHash/SimHash go
  *    shingle→signature→band→bucket-join, so the shuffle is bounded by
  *    (docs x bands) and candidate pairs, not docs².
  *  - n-gram Jaccard uses the inverted-index join (pairs sharing ≥1
  *    shingle), the standard linear-ish approach; hot shingles are the
  *    skew point, so the DECLARED query drops shingles with document
  *    frequency > [[TextOps.NgramStopDf]] (the stop-shingle trade) — and
  *    [[TextOps.ppJoinJaccard]] is the lossless prefix-filter alternative
  *    when exact results are required.
  *  - All per-doc work (tokenize, shingle, hash) is narrow projections over
  *    codegen'd built-ins — no UDFs, no driver collection.
  */
object TextOps extends QueryPack {

  private val P = graft.functions.MinHashSig.P

  /** Portable 60-bit hash: md5 hex prefix → bigint, mod P.
    * Spark `conv(hex,16,10)` == DuckDB `CAST('0x'||hex AS BIGINT)`. */
  private[graft] def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long") % P
  private def h60Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT) % $P"

  /** Word 3-shingles of the space-split tokens (guarded for <3 tokens).
    * Windows come from the codegen'd [[graft.functions.WordNgrams]] —
    * the old `transform(sequence(…))` HOF built every window through an
    * interpreted lambda (CodegenFallback), the dominant per-row cost of
    * the shingle artifact build. */
  private def shingled(docs: DataFrame): DataFrame = {
    import graft.functions.WordNgrams.wordNgrams
    // Par.boost: shingling explodes ~40 rows/doc from a per-doc
    // window pass — on a single-file fixture the whole explosion runs
    // on one core before the downstream aggregation's shuffle
    Par.boost(docs).select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        when(size(col("toks")) >= 3, wordNgrams(col("toks"), 3))
          .otherwise(array(lit(""))))).as("sh"))
      .where(col("sh") =!= "")
  }
  private val shingleSqlCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |         list_transform(range(1, greatest(len(l)-1, 1)),
      |                        i -> concat_ws(' ', l[i], l[i+1], l[i+2])))) AS sh
      |       FROM toks WHERE len(l) >= 3)""".stripMargin

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group by content hash, keep the smallest doc_id. */
  val qDedupExact: Q = Q(
    "q_dedup_exact",
    Some("""
      SELECT min(doc_id) AS keep_id, COUNT(*) AS n_copies
      FROM documents
      GROUP BY md5(text)
      ORDER BY keep_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .orderBy("keep_id")
  }

  // -------------------------------------------------------------- minhash

  // Fixed hash-family coefficients (a*h + b) mod P, all < P — the single
  // source of truth lives in graft.functions.MinHashSig (the one-pass
  // expression must match the SQL oracle hash-for-hash).
  private val A = graft.functions.MinHashSig.A.toSeq
  private val B = graft.functions.MinHashSig.B.toSeq
  private val Bands = 4
  private val Rows  = 4 // 4 bands x 4 rows = 16 minhashes

  /** MinHash signatures (doc_id, m0..m15) — shared by dedup + tests.
    * One codegen'd expression pass ([[graft.functions.MinHashSig]]):
    * shingle + hash + 16 permutation-mins per document in a narrow
    * projection, NO explode/shuffle before the banding join. Hash-for-hash
    * equal to the SQL formulation (and to [[minhashSignaturesAgg]], the
    * exploded twin the equivalence spec checks against). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    // Served from a build-once ON-DISK artifact (r16): the signature
    // pass is the corpus's heaviest text map-side compute (shingle +
    // hash + 16 permutation mins per document), and SIX declared
    // queries consume the same table (q_minhash_dedup/_est,
    // q_neardup_capped/_prune, the dedup-cluster labels build,
    // q_dedup_verdict) — each was re-hashing the corpus per run. In
    // production the signature table is the first thing a dedup
    // pipeline persists; 500k docs × 17 longs ≈ 68 MB parquet at sf10.
    val art = graft.IndexStore.artifact(dir, "minhashsig-v1",
      Seq("documents")) { out =>
      graft.IndexStore.stage("sig") {
        minhashSignaturesFrom(Tables.documents(s, dir))
          .write.parquet(s"$out/sig")
      }
      graft.IndexStore.note("sig_rows", s.read.parquet(s"$out/sig").count())
    }
    s.read.parquet(s"$art/sig")
  }

  /** The signature pass over an EXPLICIT documents frame (streaming
    * twins, specs; the dir-based entry point above stages it). One
    * codegen'd expression — NO explode/shuffle before the banding
    * join. */
  def minhashSignaturesFrom(docs: DataFrame): DataFrame = {
    import graft.functions.MinHashSig.minhashSig
    // Par.boost: heaviest text map-side compute (Par's rationale)
    val sig = Par.boost(docs)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), minhashSig(col("toks")).as("sig"))
    sig.select(col("doc_id") +:
      (0 until 16).map(j => element_at(col("sig"), j + 1).as(s"m$j")): _*)
  }

  /** The explode + groupBy(16 mins) formulation of [[minhashSignatures]] —
    * shuffles docs x shingles rows; kept as the independently-derived twin
    * for the equivalence spec. */
  def minhashSignaturesAgg(s: SparkSession, dir: String): DataFrame = {
    val hashed = shingled(Tables.documents(s, dir))
      .select(col("doc_id"), h60(col("sh")).as("h"))
    hashed.groupBy("doc_id").agg(
      min((col("h") * A(0) + B(0)) % P).as("m0"),
      (1 until 16).map(j => min((col("h") * A(j) + B(j)) % P).as(s"m$j")): _*)
  }

  /** The MinHash band-key CTE chain (shingles → 60-bit hashes →
    * 16 minhashes → 4-band keys), shared by every pair-producing oracle. */
  private val minhashBandsSqlWith: String = {
    val mins = (0 until 16).map(j =>
      s"min((h*${A(j)} + ${B(j)}) % $P) AS m$j").mkString(", ")
    val bandSelects = (0 until Bands).map { b =>
      val cols = (0 until Rows).map(r => s"m${b * Rows + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $cols)) AS key FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH $shingleSqlCte,
       |hashed AS (SELECT doc_id, ${h60Sql("sh")} AS h FROM sh),
       |sig AS (SELECT doc_id, $mins FROM hashed GROUP BY doc_id),
       |bands AS ($bandSelects)""".stripMargin
  }

  /** [[minhashBandsSqlWith]] + distinct same-band pairs — the oracle
    * prefix for q_minhash_dedup and the pruning/clustering stages. */
  private val minhashPairsSqlWith: String =
    s"""$minhashBandsSqlWith,
       |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |          FROM bands x JOIN bands y
       |            ON x.band = y.band AND x.key = y.key
       |           AND x.doc_id < y.doc_id)""".stripMargin

  /** (doc_id, band, key) LSH band rows, Spark side of
    * [[minhashBandsSqlWith]]. */
  private def minhashBands(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(s, dir)
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until Rows).map(r => col(s"m${b * Rows + r}"))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate near-duplicate pairs (doc_a < doc_b), Spark side of
    * [[minhashPairsSqlWith]]. */
  def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    // Bands self-join with a shuffle-hash hint: both sides are the same
    // subplan, so forcing a shuffle join (instead of broadcast) lets
    // ReusedExchange compute the shingle+signature pipeline ONCE and
    // shuffle it once — broadcast would plan it twice. (An intra-bucket
    // pair-expansion variant was measured slower: Spark's higher-order
    // lambdas evaluate interpreted, pairs via join stay in codegen.)
    val bands = minhashBands(s, dir)
    bands.as("x").join(bands.as("y").hint("shuffle_hash"), Seq("band", "key"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** [[minhashPairs]] with the hot-bucket guard a 100 TB corpus needs:
    * buckets holding more than `maxBucket` docs (boilerplate text — every
    * member of an n-doc bucket joins n-1 others, so one degenerate bucket
    * is O(n²) pairs and a skewed shuffle partition) are dropped WHOLE
    * before the self-join. The bucket-size pass shuffles on the same
    * (band, key) the join itself uses. Batch twin of the streaming cap in
    * `StreamOps.neardupStream` (batch drops the bucket, streaming admits
    * the first `maxBucket` arrivals — both bound the quadratic term). */
  def minhashPairsCapped(s: SparkSession, dir: String, maxBucket: Int): DataFrame = {
    val sized = minhashBands(s, dir).withColumn("bsz",
      count(lit(1)).over(Window.partitionBy("band", "key")))
    val kept = sized.where(col("bsz") <= maxBucket)
      .select("doc_id", "band", "key")
    kept.as("x").join(kept.as("y").hint("shuffle_hash"), Seq("band", "key"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Capped candidate detection as a declared, oracle-checked query: the
    * cap (2) BITES on the fixture — its largest buckets hold 3 docs, so a
    * wrong cap comparison or a truncate-instead-of-drop implementation
    * hash-mismatches, not just idles. */
  val qNeardupCapped: Q = Q(
    "q_neardup_capped",
    Some(
      s"""$minhashBandsSqlWith,
         |sized AS (SELECT doc_id, band, key,
         |                 COUNT(*) OVER (PARTITION BY band, key) AS bsz
         |          FROM bands),
         |kept AS (SELECT doc_id, band, key FROM sized WHERE bsz <= 2),
         |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |          FROM kept x JOIN kept y
         |            ON x.band = y.band AND x.key = y.key
         |           AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin)
  ) { (s, dir) =>
    minhashPairsCapped(s, dir, maxBucket = 2).orderBy("doc_a", "doc_b")
  }

  /** MinHash + LSH banding: near-duplicate candidate pairs.
    * 16 minhashes, 4 bands x 4 rows — P(candidate) ≈ 1-(1-j^4)^4, so the
    * planted j≈0.99 pairs are found with probability ≈ 1. */
  val qMinhashDedup: Q = Q(
    "q_minhash_dedup",
    Some(
      s"""$minhashPairsSqlWith
         |SELECT doc_a, doc_b FROM pairs
         |ORDER BY doc_a, doc_b""".stripMargin)
  ) { (s, dir) =>
    minhashPairs(s, dir).orderBy("doc_a", "doc_b")
  }

  /** Near-dup PRUNING: turn detected candidate pairs into a keep/drop
    * decision — per pair the shorter doc loses (tie: the larger doc_id),
    * and a doc that loses any pair is dropped. This greedy dominance
    * rule is deterministic and one join deep; it approximates
    * connected-component dedup without the iterative closure (which
    * needs an iterative framework at scale — documented trade).
    *
    * Scale: pairs are bounded by the banding (docs x bands, not n²);
    * loser derivation is two equi-joins against a narrow (doc_id,
    * n_chars) projection; survivors via LEFT ANTI join; final hash agg.
    */
  val qNeardupPrune: Q = Q(
    "q_neardup_prune",
    Some(
      s"""$minhashPairsSqlWith,
         |losers AS (
         |  SELECT DISTINCT CASE WHEN da.n_chars >= db.n_chars THEN p.doc_b
         |                       ELSE p.doc_a END AS doc_id
         |  FROM pairs p
         |  JOIN documents da ON p.doc_a = da.doc_id
         |  JOIN documents db ON p.doc_b = db.doc_id)
         |SELECT d.lang,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
         |FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
         |GROUP BY d.lang
         |ORDER BY d.lang""".stripMargin)
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
    val losers = minhashPairs(s, dir)
      .join(docs.select(col("doc_id").as("doc_a"), col("n_chars").as("ca")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("n_chars").as("cb")), "doc_b")
      .select(when(col("ca") >= col("cb"), col("doc_b"))
        .otherwise(col("doc_a")).as("doc_id"))
      .distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("kept_chars"))
      .orderBy("lang")
  }

  // -------------------------------------------------------------- simhash

  /** SimHash LSH geometry: 60-bit fingerprint cut into 4 bands of 15 bits
    * (32,768 keys per band). The old 32-bit / 8-bit-band layout saturated
    * at 256 keys per band, so bucket population — and candidate pairs —
    * grew ~n²/256 with corpus size; 15-bit keys keep buckets proportional
    * to genuine fingerprint collisions. [[SimhashMaxBucket]] is the
    * hot-bucket guard (same drop-the-bucket-whole semantics as
    * [[minhashPairsCapped]]): boilerplate corpora concentrate identical
    * fingerprints into one bucket, and an n-doc bucket is O(n²) pairs. */
  private val ShBands = 4
  private val ShBandBits = 15
  private val ShKeyMask = (1 << ShBandBits) - 1
  val SimhashHamming = 11 // ≈ the old 6/32 fraction, over 60 bits
  val SimhashMaxBucket = 16

  /** SimHash near-dup: 60-bit fingerprint, 4×15-bit LSH bands with the
    * hot-bucket cap, pairs within hamming distance [[SimhashHamming]]. */
  val qSimhashDedup: Q = Q(
    "q_simhash_dedup",
    Some(s"""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      th AS (SELECT doc_id, CAST(('0x' || substr(md5(tok),1,15)) AS BIGINT) AS h FROM toks),
      bits AS (SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS bal
               FROM th, range(0, 60) t(b) GROUP BY doc_id, b),
      fp AS (SELECT doc_id, CAST(SUM(CASE WHEN bal > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS fp
             FROM bits GROUP BY doc_id),
      bands AS (SELECT doc_id, fp, b AS band, (fp >> ($ShBandBits*b)) & $ShKeyMask AS key
                FROM fp, range(0, $ShBands) t(b)),
      sized AS (SELECT doc_id, fp, band, key,
                       COUNT(*) OVER (PARTITION BY band, key) AS bsz
                FROM bands),
      kept AS (SELECT doc_id, fp, band, key FROM sized WHERE bsz <= $SimhashMaxBucket)
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
      FROM kept x JOIN kept y
        ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.fp, y.fp)) <= $SimhashHamming
      ORDER BY doc_a, doc_b
      """.stripMargin.trim)
  ) { (s, dir) =>
    simhashPairs(simhashFingerprints(s, dir), SimhashMaxBucket, SimhashHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** (band, key) LSH rows for 60-bit fingerprints: 4 bands × 15 bits. */
  def simhashBands(fp: DataFrame): DataFrame =
    fp.select(col("doc_id"), col("fp"),
        explode(expr(s"transform(sequence(0,${ShBands - 1}), b -> " +
          s"named_struct('band', b, 'key', shiftright(fp, $ShBandBits*b) & $ShKeyMask))")).as("bk"))
      .select(col("doc_id"), col("fp"), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Same-band pairs within `hamming`, with buckets larger than
    * `maxBucket` dropped WHOLE before the self-join (the cap a 100 TB
    * boilerplate corpus needs — an uncapped n-doc bucket is O(n²) pairs
    * and one skewed shuffle partition). Self-join carries a shuffle-hash
    * hint so ReusedExchange computes the fingerprint+banding pass once
    * (see q_minhash_dedup note); the bucket-size window shuffles on the
    * same (band, key) the join itself uses. */
  def simhashPairs(fp: DataFrame, maxBucket: Int, hamming: Int): DataFrame = {
    val sized = simhashBands(fp).withColumn("bsz",
      count(lit(1)).over(Window.partitionBy("band", "key")))
    val kept = sized.where(col("bsz") <= maxBucket)
      .select("doc_id", "fp", "band", "key")
    kept.as("x").join(kept.as("y").hint("shuffle_hash"), Seq("band", "key"))
      .where(col("x.doc_id") < col("y.doc_id") &&
             bit_count(col("x.fp").bitwiseXOR(col("y.fp"))) <= hamming)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).cast("long").as("hamming"))
      .distinct()
  }

  /** 60-bit SimHash fingerprints (doc_id, fp): per bit, the balance of
    * token-hash bits (duplicates weighted by frequency), sign → bit.
    *
    * One codegen'd expression pass ([[graft.functions.SimHash60]]) — a
    * narrow map-only projection, NO explode and NO shuffle before the
    * banding join. Bit-identical to the balance formulation the DuckDB
    * oracle uses (md5-hex-prefix token hash, bal_b > 0 ⇔ 2*popcount_b >
    * n_tokens); [[simhashFingerprintsAgg]] keeps the aggregate twin for
    * the equivalence spec. */
  def simhashFingerprints(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SimHash60.simhash60
    Par.boost(Tables.documents(s, dir))
      .select(col("doc_id"), simhash60(split(col("text"), " ")).as("fp"))
  }

  /** The explode + 60-conditional-sum aggregate formulation of
    * [[simhashFingerprints]] — shuffles docs x tokens rows, kept as the
    * independently-derived twin the equivalence spec checks the
    * expression against. */
  def simhashFingerprintsAgg(s: SparkSession, dir: String): DataFrame = {
    val th = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("h"))
    val bitCounts = (0 until 60).map(b =>
      sum(expr(s"shiftright(h, $b) & 1")).as(s"c$b"))
    val fpBits = (0 until 60).map(b =>
      when(col(s"c$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
    th.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), bitCounts: _*)
      .select(col("doc_id"), fpBits.reduce(_ + _).as("fp"))
  }

  // ----------------------------------------------------------- ngram jaccard

  /** Stop-shingle document-frequency cap for the DECLARED n-gram Jaccard:
    * shingles appearing in more than this many documents are dropped from
    * the index AND from the per-doc counts (the documented stop-shingle
    * trade production similarity pipelines make — one boilerplate shingle
    * with document frequency f is f² candidate rows in the inverted-index
    * self-join, a guaranteed quadratic blowup at corpus scale). 5 bites
    * on the sf fixtures (max df there is 7), so the correctness gate
    * exercises the cap, not just its bypass. */
  val NgramStopDf = 5

  /** n-gram (3-shingle) Jaccard over the stop-shingle-capped inverted
    * index: shingles with df > [[NgramStopDf]] are dropped whole, then
    * only pairs sharing ≥1 surviving shingle are scored; report ≥ 0.5
    * (Jaccard computed over surviving shingles — the declared semantics,
    * mirrored exactly by the oracle). */
  val qNgramJaccard: Q = Q(
    "q_ngram_jaccard",
    Some(s"""
      WITH $shingleSqlCte,
      hs AS (SELECT doc_id, ${h60Sql("sh")} AS h FROM sh),
      sized AS (SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM hs),
      kept AS (SELECT doc_id, h FROM sized WHERE df <= $NgramStopDf),
      ds AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
                FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT da AS doc_a, db AS doc_b,
             CAST(round(CAST(i AS DECIMAL(18,9)) / (x.n + y.n - i), 6) AS DOUBLE) AS jaccard
      FROM inter JOIN ds x ON da = x.doc_id JOIN ds y ON db = y.doc_id
      WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
      ORDER BY doc_a, doc_b
      """.stripMargin.trim)
  ) { (s, dir) =>
    ngramJaccardCapped(s, dir, NgramStopDf).orderBy("doc_a", "doc_b")
  }

  /** ON-DISK shingle-signature artifact per corpus path: the hashed
    * distinct word-3-shingle projection `(doc_id, h)` — the standard
    * "materialize the signature table" step of production similarity
    * pipelines (docs × shingles × 16 B, ~1/50th of the corpus), built
    * ONCE per corpus fingerprint and read as plain parquet by every
    * inverted-index consumer (Jaccard, containment, the PPJoin
    * equivalence twin). Replaces the r15 per-query lazy localCheckpoint
    * (VERDICT r15 #4): checkpointed blocks are non-evictable — they
    * release only via GC + ContextCleaner, and in a many-query JVM the
    * pins made LATER shuffle-heavy queries measure 2-3× slower (run 2
    * of the ngram self-join measured 2.7× run 1 behind run 1's pinned
    * blocks). The parquet read re-splits by maxPartitionBytes, pins
    * nothing, and the explode now runs once per CORPUS, not once per
    * query. At 100 TB this is a table on shared storage, the same
    * architecture as the BM25 postings and PQ code artifacts. */
  private def shingleArtifactDir(s: SparkSession, dir: String): String =
    graft.IndexStore.artifact(dir, "shingle-v1", Seq("documents")) { out =>
      graft.IndexStore.stage("sh") {
        shingled(Tables.documents(s, dir))
          .select(col("doc_id"), h60(col("sh")).as("h"))
          .write.parquet(s"$out/sh")
      }
      graft.IndexStore.note("sh_rows", s.read.parquet(s"$out/sh").count())
    }

  /** The staged shingle table `(doc_id, h)` for a corpus path. */
  private[graft] def shingleTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"${shingleArtifactDir(s, dir)}/sh")

  /** The df-cap prune over a shingle table: shingles of document
    * frequency > maxDf dropped whole. The df pass is a window over
    * partitionBy(h) — the SAME key the self-join shuffles on, so the
    * exchange is planned once and reused. */
  private def keptUnderDf(sh: DataFrame, maxDf: Int): DataFrame =
    if (maxDf == Int.MaxValue) sh
    else sh.withColumn("df", count(lit(1)).over(Window.partitionBy("h")))
      .where(col("df") <= maxDf)
      .select("doc_id", "h")

  /** The stop-shingle-capped inverted index over an EXPLICIT documents
    * frame (streaming twins, ad-hoc corpora; the dir-based entry points
    * below stage through the [[shingleTable]] artifact instead).
    *
    * `reliable = false` (default) leaves the projection as a pure plan —
    * consumers that reference it more than once recompute it (the two
    * self-join sides share one exchange, so in practice the explode runs
    * ~twice). `reliable = true` persists MEMORY_AND_DISK with lineage
    * kept, so lost blocks recompute — the cluster-grade setting, same
    * contract as [[ConnectedComponents.stars]]'s flag. (The r15 lazy
    * localCheckpoint variant is gone: its non-evictable blocks out-lived
    * the query and taxed every later one — VERDICT r15 #4.) */
  def ngramKeptShinglesFrom(docs: DataFrame, maxDf: Int,
      reliable: Boolean = false): DataFrame = {
    val proj = shingled(docs).select(col("doc_id"), h60(col("sh")).as("h"))
    val sh =
      if (reliable) proj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else proj
    keptUnderDf(sh, maxDf)
  }

  def ngramKeptShingles(s: SparkSession, dir: String, maxDf: Int): DataFrame =
    keptUnderDf(shingleTable(s, dir), maxDf)

  /** Distinct candidate pairs of the capped inverted-index join — the
    * quantity the stop-shingle cap exists to bound (one shingle with
    * document frequency f contributes f² candidate rows). */
  def ngramCandidatesFrom(docs: DataFrame, maxDf: Int): DataFrame = {
    val kept = ngramKeptShinglesFrom(docs, maxDf)
    kept.as("a").join(kept.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** Inverted-index Jaccard with the stop-shingle guard. Self-join is on
    * the 60-bit shingle hash (8-byte key; both engines hash identically
    * so even a collision is mirrored). `maxDf = Int.MaxValue` degenerates
    * to the uncapped join (kept for the equivalence spec vs
    * [[ppJoinJaccard]], the lossless prefix-filter alternative for
    * exact-result pipelines). */
  def ngramJaccardFrom(docs: DataFrame, maxDf: Int): DataFrame =
    ngramJaccardOver(ngramKeptShinglesFrom(docs, maxDf))

  /** The Jaccard join over an already-derived kept-shingle table. */
  private def ngramJaccardOver(kept: DataFrame): DataFrame = {
    val ds = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = kept.as("a").join(kept.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(ds.as("x"), col("da") === col("x.doc_id"))
      .join(ds.as("y"), col("db") === col("y.doc_id"))
      .where(col("i").cast("double") / (col("x.n") + col("y.n") - col("i")) >= 0.5)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("i").cast("decimal(18,9)") / (col("x.n") + col("y.n") - col("i")), 6)
          .cast("double").as("jaccard"))
  }

  def ngramJaccardCapped(s: SparkSession, dir: String, maxDf: Int): DataFrame =
    ngramJaccardOver(ngramKeptShingles(s, dir, maxDf))

  /** n-gram CONTAINMENT ≥ 0.8 pairs: `|A∩B| / min(|A|,|B|)` over the same
    * stop-shingle-capped inverted index as [[qNgramJaccard]]. Jaccard
    * misses the asymmetric duplication a corpus actually has — a short
    * doc quoted whole inside a long one scores low Jaccard but
    * containment ≈ 1 — so dedup pipelines run both. Same join shape and
    * cap; only the denominator differs. */
  val qNgramContainment: Q = Q(
    "q_ngram_containment",
    Some(s"""
      WITH $shingleSqlCte,
      hs AS (SELECT doc_id, ${h60Sql("sh")} AS h FROM sh),
      sized AS (SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS df FROM hs),
      kept AS (SELECT doc_id, h FROM sized WHERE df <= $NgramStopDf),
      ds AS (SELECT doc_id, COUNT(*) AS n FROM kept GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
                FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT da AS doc_a, db AS doc_b,
             CAST(round(CAST(i AS DECIMAL(18,9)) / least(x.n, y.n), 6) AS DOUBLE)
               AS containment
      FROM inter JOIN ds x ON da = x.doc_id JOIN ds y ON db = y.doc_id
      WHERE CAST(i AS DOUBLE) / least(x.n, y.n) >= 0.8
      ORDER BY doc_a, doc_b
      """.stripMargin.trim)
  ) { (s, dir) =>
    val kept = ngramKeptShingles(s, dir, NgramStopDf)
    val ds = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = kept.as("a").join(kept.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(ds.as("x"), col("da") === col("x.doc_id"))
      .join(ds.as("y"), col("db") === col("y.doc_id"))
      .where(col("i").cast("double") / least(col("x.n"), col("y.n")) >= 0.8)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("i").cast("decimal(18,9)") / least(col("x.n"), col("y.n")), 6)
          .cast("double").as("containment"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash Jaccard ESTIMATION: for each LSH candidate pair, estimate
    * similarity as the fraction of agreeing minhash coordinates —
    * E[agree/16] = J(A,B), the classical estimator. This is the
    * verify-free path a 100 TB dedup pipeline takes when exact shingle
    * re-intersection is too expensive: the estimate reads ONLY the two
    * 16-value signatures already computed for banding (narrow join on
    * the signature table), never the documents. Accuracy vs exact
    * Jaccard is spec-asserted; the estimator itself is exact integer
    * arithmetic, fully oracle-matched. */
  val qMinhashEst: Q = Q(
    "q_minhash_est",
    Some {
      val agree = (0 until 16).map(j =>
        s"CASE WHEN x.m$j = y.m$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""$minhashPairsSqlWith
         |SELECT p.doc_a, p.doc_b,
         |       CAST(($agree) AS BIGINT) AS n_agree,
         |       CAST(round(CAST(($agree) AS DECIMAL(18,9)) / 16, 6) AS DOUBLE)
         |         AS est_jaccard
         |FROM pairs p
         |JOIN sig x ON p.doc_a = x.doc_id
         |JOIN sig y ON p.doc_b = y.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin
    }
  ) { (s, dir) =>
    val sig = minhashSignatures(s, dir)
    val agree = (0 until 16).map(j =>
      when(col(s"x.m$j") === col(s"y.m$j"), 1).otherwise(0))
      .reduce(_ + _)
    minhashPairs(s, dir).as("p")
      .join(sig.as("x"), col("p.doc_a") === col("x.doc_id"))
      .join(sig.as("y"), col("p.doc_b") === col("y.doc_id"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        agree.cast("long").as("n_agree"),
        round(agree.cast("decimal(18,9)") / 16, 6).cast("double").as("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** AllPairs/PPJoin-style exact Jaccard join (Bayardo et al., WWW'07
    * "Scaling Up All Pairs Similarity Search"): order each doc's shingle
    * hashes rare-first by global document frequency, index only the
    * prefix (n - ceil(t*n) + 1 shingles) — any pair with J >= t must
    * collide inside both prefixes, so the filter is lossless — then
    * verify candidates exactly by sorted-array intersection.
    *
    * This is the shape for corpora with heavy-hitter shingles (boilerplate,
    * templates), where the naive inverted-index join's candidate count
    * explodes quadratically in each posting list. On THIS synthetic corpus
    * shingle df ≈ 1, so the naive join wins (measured); both are exact and
    * NgramJaccardSpec pins their equivalence.
    */
  def ppJoinJaccard(s: SparkSession, dir: String, t: Double = 0.5): DataFrame = {
    val sh = shingleTable(s, dir)
    val docsh = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("n"))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val pref = sh.join(dfreq, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("h").asc)))
      .join(docsh.select("doc_id", "n"), "doc_id")
      .where(col("rk") <= col("n") - ceil(col("n") * t) + 1)
      .select("doc_id", "h")
    val cand = pref.as("a").join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    cand
      .join(docsh.as("x"), col("da") === col("x.doc_id"))
      .join(docsh.as("y"), col("db") === col("y.doc_id"))
      .withColumn("i", size(array_intersect(col("x.hs"), col("y.hs"))).cast("long"))
      .where(col("i").cast("double") / (col("x.n") + col("y.n") - col("i")) >= t)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        round(col("i").cast("decimal(18,9)") / (col("x.n") + col("y.n") - col("i")), 6)
          .cast("double").as("jaccard"))
  }

  // ------------------------------------------------------ heavy hitters

  private val CmsDepth = 4
  private val CmsWidth = 256

  /** Heavy hitters via COUNT-MIN SKETCH: one fixed-size mergeable grid
    * ([[graft.functions.CmsSketch]], depth 4 × width 256) aggregated over
    * every token occurrence, point-queried for the exact top-20 tokens.
    * The sketch estimate is deterministic integer arithmetic over the
    * shared (A, B, P) hash family, so the oracle reproduces it EXACTLY by
    * reformulating the grid as a GROUP BY — est ≥ exact always (CMS only
    * overestimates), and the query emits both so the bias is visible.
    * At 100 TB the sketch side is one constant-size buffer per partition
    * merged map-side — the exact top-20 here is the audit twin, not the
    * scale path. */
  val qHeavyHitters: Q = Q(
    "q_heavy_hitters",
    Some {
      def cellSql(i: Int, h: String) =
        s"(($h * ${A(i)} + ${B(i)}) % $P) % $CmsWidth"
      val caseCell = (0 until CmsDepth).map(i =>
        s"WHEN ${i} THEN ${cellSql(i, "h")}").mkString("CASE t.i ", " ", " END")
      s"""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      th AS (SELECT tok, ${h60Sql("tok")} AS h FROM toks),
      cnt AS (
        SELECT i, cell, COUNT(*) AS c FROM (
          SELECT t.i, $caseCell AS cell
          FROM th, range(0, $CmsDepth) t(i))
        GROUP BY i, cell),
      top AS (SELECT tok, COUNT(*) AS n_exact FROM toks
              GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 20),
      pc AS (SELECT top.tok, top.n_exact, t.i, $caseCell AS cell
             FROM (SELECT tok, n_exact, ${h60Sql("tok")} AS h FROM top) top,
                  range(0, $CmsDepth) t(i))
      SELECT p.tok, CAST(p.n_exact AS BIGINT) AS n_exact,
             CAST(MIN(c.c) AS BIGINT) AS cms_est
      FROM pc p JOIN cnt c ON p.i = c.i AND p.cell = c.cell
      GROUP BY p.tok, p.n_exact
      ORDER BY n_exact DESC, tok
      """.stripMargin.trim
    }
  ) { (s, dir) =>
    val cms = udaf(new graft.functions.CmsSketch(CmsDepth, CmsWidth))
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = toks.select(h60(col("tok")).as("h")).agg(cms(col("h")).as("sk"))
    val probes = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok")).limit(20)
      .withColumn("h", h60(col("tok")))
    val cells = (0 until CmsDepth).map { i =>
      element_at(col("sk"),
        (lit(i * CmsWidth) +
          ((col("h") * A(i) + B(i)) % P) % CmsWidth).cast("int") + 1)
    }
    probes.crossJoin(broadcast(sketch))
      .select(col("tok"), col("n_exact"),
        least(cells: _*).cast("long").as("cms_est"))
      .orderBy(col("n_exact").desc, col("tok"))
  }

  // ------------------------------------------------------------ text analysis

  val qTextStats: Q = Q(
    "q_text_stats",
    Some("""
      SELECT lang,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             CAST(SUM(n_chars) AS BIGINT) / COUNT(*) AS avg_chars,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      FROM documents
      GROUP BY lang
      ORDER BY lang
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")) / count(lit(1))).as("avg_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
      .orderBy("lang")
  }

  /** Whitespace + BPE-ish regex token counting. */
  val qTokenCount: Q = Q(
    "q_token_count",
    Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS re_tokens,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace_chars
      FROM documents
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("re_tokens"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_nonspace_chars"))
      .orderBy("doc_id")
  }

  // Small fixed lexicons for the n-gram/stopword language heuristic. The
  // synthetic corpus shares one vocabulary across langs, so this checks the
  // computation (deterministically), not real-world accuracy.
  private val lexicons = Seq(
    "de" -> Seq("table", "key", "value"),
    "en" -> Seq("the", "a", "and"),
    "es" -> Seq("data", "query", "row"),
    "fr" -> Seq("order", "group", "sort"),
    "zh" -> Seq("join", "merge", "window"))

  /** Heuristic language-ID: argmax of lexicon-hit counts, alphabetical
    * tiebreak; reported as a (actual, predicted) confusion matrix. */
  val qLangId: Q = Q(
    "q_lang_id",
    Some {
      val scores = lexicons.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter(string_split(text,' '), t -> t IN ($set))) AS s_$l"
      }.mkString(", ")
      val m = s"greatest(${lexicons.map("s_" + _._1).mkString(", ")})"
      val pred = lexicons.map { case (l, _) => s"WHEN s_$l = $m THEN '$l'" }
        .mkString("CASE ", " ", " END")
      s"""WITH scored AS (SELECT doc_id, lang, $scores FROM documents)
         |SELECT lang, $pred AS pred_lang, COUNT(*) AS n
         |FROM scored
         |GROUP BY 1, 2
         |ORDER BY lang, pred_lang""".stripMargin
    }
  ) { (s, dir) =>
    import graft.functions.LexiconCounts.lexCounts
    val toks = split(col("text"), " ")
    // Par.boost: five lexicon scores over every token of every doc,
    // all ahead of the tiny confusion-matrix aggregation. The scores
    // come from ONE codegen'd token pass ([[LexiconCounts]]) — the old
    // five `filter` HOFs were interpreted CodegenFallbacks and were
    // the family's per-row wall (VERDICT r17 #2).
    val scored = lexicons.zipWithIndex.foldLeft(
      Par.boost(Tables.documents(s, dir))
        .select(col("doc_id"), col("lang"),
          lexCounts(toks, lexicons.map(_._2)).as("lc"))) {
      case (df, ((l, _), i)) =>
        df.withColumn(s"s_$l", col("lc").getItem(i))
    }
    val m = greatest(lexicons.map(l => col(s"s_${l._1}")): _*)
    val pred = lexicons.foldLeft(when(lit(false), "")) { case (c, (l, _)) =>
      c.when(col(s"s_$l") === m, l)
    }
    scored.withColumn("pred_lang", pred)
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")
  }

  /** Quality scoring: token stats, type-token ratio, stopword ratio,
    * banded composite. */
  val qQualityScore: Q = Q(
    "q_quality_score",
    Some("""
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks, n_chars FROM documents),
      m AS (
        SELECT doc_id, n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
               CAST(len(list_filter(toks, x -> x IN ('the','a','and','of','to'))) AS BIGINT) AS n_stop
        FROM t)
      SELECT doc_id, n_tokens,
             CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
             CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
             CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_span,
             CASE WHEN len_band = 0 THEN 'short' WHEN len_band = 1 THEN 'medium' ELSE 'long' END AS length_band,
             CASE WHEN CAST(n_distinct AS DOUBLE)/n_tokens >= 0.7 AND n_tokens >= 20 THEN 'high'
                  WHEN CAST(n_distinct AS DOUBLE)/n_tokens >= 0.4 THEN 'mid'
                  ELSE 'low' END AS quality
      FROM (SELECT *, CASE WHEN n_tokens < 20 THEN 0 WHEN n_tokens < 60 THEN 1 ELSE 2 END AS len_band FROM m)
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"), col("n_chars"))
    val m = t.select(
      col("doc_id"), col("n_chars"),
      size(col("toks")).cast("long").as("n_tokens"),
      size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
      // one codegen'd token pass (the q_lang_id interpreted-HOF fix)
      graft.functions.LexiconCounts.lexCounts(col("toks"),
          Seq(Seq("the", "a", "and", "of", "to"))).getItem(0)
        .cast("long").as("n_stop"))
    m.select(
        col("doc_id"), col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("ttr"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("n_chars").cast("double") / col("n_tokens")).as("avg_token_span"),
        when(col("n_tokens") < 20, "short")
          .when(col("n_tokens") < 60, "medium")
          .otherwise("long").as("length_band"),
        when(col("n_distinct").cast("double") / col("n_tokens") >= 0.7 &&
             col("n_tokens") >= 20, "high")
          .when(col("n_distinct").cast("double") / col("n_tokens") >= 0.4, "mid")
          .otherwise("low").as("quality"))
      .orderBy("doc_id")
  }

  /** Canonical text NORMALIZATION: lowercase, strip non-alphanumerics,
    * collapse whitespace runs, trim — the preprocessing pass every
    * dedup/tokenize stage assumes, emitted as a verifiable record
    * (normalized hash + length delta) rather than a side effect. Pure
    * codegen'd projection, no shuffle; both engines md5 the identical
    * normalized string, so a divergent regex or collapse order
    * hash-mismatches. */
  val qTextNormalize: Q = Q(
    "q_text_normalize",
    Some("""
      WITH n AS (
        SELECT doc_id, n_chars,
               trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                   ' +', ' ', 'g')) AS norm
        FROM documents)
      SELECT doc_id,
             md5(norm) AS norm_hash,
             CAST(length(norm) AS BIGINT) AS n_chars_norm,
             CAST(n_chars - length(norm) AS BIGINT) AS n_removed
      FROM n ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), norm.as("norm"))
      .select(col("doc_id"), md5(col("norm")).as("norm_hash"),
        length(col("norm")).cast("long").as("n_chars_norm"),
        (col("n_chars") - length(col("norm"))).cast("long").as("n_removed"))
      .orderBy("doc_id")
  }

  /** Order-sensitive rolling fingerprint + content hash per document. */
  val qDocFingerprint: Q = Q(
    "q_doc_fingerprint",
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      pt AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos FROM t)
      SELECT doc_id,
             CAST(SUM(pos * (CAST(('0x' || substr(md5(tok),1,15)) AS BIGINT) % 1000003)) % $P AS BIGINT) AS rolling_fp
      FROM pt
      GROUP BY doc_id
      ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    // The rolling sum is PER-DOC arithmetic, so it is computed inside
    // one aggregate HOF over the token array (the q_repetition /
    // q_rare_bigram pattern): a pure projection over the scan — no
    // posexplode (the r13 sf10 audit measured the exploded-token
    // shape at 26×/decade from spill on the token frame), no shuffle,
    // identical sum and modulus.
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr(s"""aggregate(
            transform(split(text, ' '),
              (t, i) -> (cast(i as bigint) + 1) *
                (cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)
                  % 1000003)),
            cast(0 as bigint),
            (acc, x) -> acc + x) % cast($P as bigint)""").as("rolling_fp"))
      .orderBy("doc_id")
  }

  /** The canonical corpus op: global token frequencies, top 50 with a
    * total tiebreak — explode + hash agg + TakeOrderedAndProject. */
  val qWordcount: Q = Q(
    "q_wordcount",
    Some("""
      SELECT tok, COUNT(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
      ORDER BY n DESC, tok
      LIMIT 50
      """.stripMargin.trim)
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(50)
  }

  /** Intra-document repetition (the Gopher-family quality rule the
    * length/TTR/stopword bands of q_quality_score don't cover): fraction
    * of duplicate word 3-grams per doc — boilerplate and looping text
    * score high and get flagged. Both engines build the same 3-gram list
    * (Spark 0-indexed transform, DuckDB 1-indexed list_transform, same
    * windows); the only float op is one fixed division, rounded like the
    * other ratio outputs.
    *
    * Scale: a pure per-row projection over the scan — no explode (the
    * shingle list lives inside one array expression), no shuffle, no
    * join; the flag is a codegen'd comparison. */
  val qRepetition: Q = Q(
    "q_repetition",
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      sh AS (SELECT doc_id,
               len(l) - 2 AS n_sh,
               len(list_distinct(list_transform(range(1, greatest(len(l)-1, 1)),
                     i -> concat_ws(' ', l[i], l[i+1], l[i+2])))) AS n_uniq
             FROM toks WHERE len(l) >= 3)
      SELECT doc_id,
             CAST(n_sh AS BIGINT) AS n_shingles,
             CAST(n_uniq AS BIGINT) AS n_unique,
             ROUND(CAST(1 AS DOUBLE) - CAST(n_uniq AS DOUBLE) / n_sh, 6)
               AS rep_ratio,
             CASE WHEN CAST(1 AS DOUBLE) - CAST(n_uniq AS DOUBLE) / n_sh > 0.2
                  THEN 1 ELSE 0 END AS flag_repetitive
      FROM sh ORDER BY doc_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("l"))
      .where(size(col("l")) >= 3)
      .select(col("doc_id"),
        (size(col("l")) - 2).cast("long").as("n_shingles"),
        // codegen'd window pass (the [[graft.functions.WordNgrams]]
        // interpreted-HOF replacement; same windows, same distinct)
        size(array_distinct(graft.functions.WordNgrams.wordNgrams(col("l"), 3)))
          .cast("long").as("n_unique"))
    val ratio = lit(1).cast("double") -
      col("n_unique").cast("double") / col("n_shingles")
    sh.select(col("doc_id"), col("n_shingles"), col("n_unique"),
        round(ratio, 6).as("rep_ratio"),
        when(ratio > 0.2, 1).otherwise(0).as("flag_repetitive"))
      .orderBy("doc_id")
  }

  // ------------------------------------------- connected-component dedup

  /** The recursive-CTE oracle prefix shared by the clustering queries:
    * candidate pairs → symmetric edges → min-label transitive closure →
    * per-doc component minimum. DuckDB's UNION-deduped recursion
    * terminates because the reachable (node, label) set is finite; the
    * Spark side computes the identical labels with star-contraction
    * ([[ConnectedComponents]]) — O(log n) rounds vs the CTE's
    * O(diameter), same fixpoint. */
  private val ccLabelsSqlWith: String =
    s"""${minhashPairsSqlWith.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |cc AS (SELECT doc_id AS node, doc_id AS label FROM documents
       |       UNION
       |       SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
       |labels AS (SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
       |           FROM cc GROUP BY node)""".stripMargin

  /** Spark-side component labels over the MinHash candidate pairs:
    * (doc_id, cluster_id = component-minimum doc_id), served from a
    * build-once ON-DISK artifact (r16). The r15 shape memoized the
    * star-contraction result frame in-JVM — a handle whose plan ends in
    * lineage-truncated checkpoint blocks, i.e. state that something
    * else's unpersist can silently destroy (the r16 bench sweep did
    * exactly that: CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on the second
    * dedup-cluster query). The artifact is the production story anyway:
    * the maintained labels table ([[graft.streaming.DedupClusterView]])
    * IS a table on shared storage, and every consumer (q_dedup_cluster,
    * q_cluster_rep, q_dedup_verdict, any session or JVM) reads plain
    * parquet; the CC loop's checkpoint round state becomes garbage the
    * moment the build returns. */
  def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val art = graft.IndexStore.artifact(dir, "dedupcluster-v1",
      Seq("documents")) { out =>
      graft.IndexStore.stage("labels") {
        ConnectedComponents.labels(
          Tables.documents(s, dir).select(col("doc_id").as("id")),
          minhashPairs(s, dir))
          .select(col("id").as("doc_id"), col("cluster_id"))
          .write.parquet(s"$out/labels")
      }
      graft.IndexStore.note("labels", s.read.parquet(s"$out/labels").count())
    }
    s.read.parquet(s"$art/labels")
  }

  /** Duplicate CLUSTERING: the transitive closure q_neardup_prune
    * deliberately skips — every doc labeled with its connected
    * component's minimum doc_id over the near-dup candidate graph.
    * Unlike pairwise pruning, chained duplicates (A~B, B~C, A̸~C) land in
    * ONE cluster, which is what corpus dedup actually requires. */
  val qDedupCluster: Q = Q(
    "q_dedup_cluster",
    Some(
      s"""$ccLabelsSqlWith
         |SELECT doc_id, cluster_id FROM labels
         |ORDER BY doc_id""".stripMargin)
  ) { (s, dir) =>
    clusterLabels(s, dir).orderBy("doc_id")
  }

  /** Cluster REPRESENTATIVE selection: per duplicate cluster keep the
    * longest doc (tie: smallest doc_id), then summarize what survives by
    * language — the canonical "dedup then keep best" corpus pass. One
    * window over the (bounded) labeled set; everything else is hash aggs. */
  val qClusterRep: Q = Q(
    "q_cluster_rep",
    Some(
      s"""$ccLabelsSqlWith,
         |ranked AS (
         |  SELECT d.lang, d.n_chars,
         |         ROW_NUMBER() OVER (PARTITION BY lb.cluster_id
         |                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |  FROM documents d JOIN labels lb ON d.doc_id = lb.doc_id)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
         |FROM ranked WHERE rn = 1
         |GROUP BY lang
         |ORDER BY lang""".stripMargin)
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
    val ranked = docs.join(clusterLabels(s, dir), "doc_id")
      .withColumn("rn", row_number().over(Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id"))))
    ranked.where(col("rn") === 1)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("kept_chars"))
      .orderBy("lang")
  }

  /** Mixed-language (code-switch) detection: language-ID each document's
    * first and second token half INDEPENDENTLY with the same lexicon
    * scoring as q_lang_id, and flag docs whose halves disagree — the
    * screen that catches concatenation artifacts and template/content
    * language splits that a whole-doc classifier averages away. Argmax
    * ties break to lexicon order (identical CASE chain both engines), so
    * the verdict is deterministic even on hit-free halves.
    *
    * Scale: one codegen'd projection per doc (two slices × K membership
    * counts) + a tiny aggregate — no explode, no shuffle beyond the
    * final 2-column agg. */
  val qLangMix: Q = Q(
    "q_lang_mix",
    Some {
      def scoresSql(half: String) = lexicons.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString(", ")
        s"len(list_filter($half, t -> t IN ($set))) AS ${half.take(1)}_$l"
      }.mkString(", ")
      def predSql(p: String) = {
        val m = s"greatest(${lexicons.map(l => s"${p}_" + l._1).mkString(", ")})"
        lexicons.map { case (l, _) => s"WHEN ${p}_$l = $m THEN '$l'" }
          .mkString("CASE ", " ", " END")
      }
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |halves AS (
         |  SELECT doc_id,
         |         toks[1 : len(toks) // 2] AS f,
         |         toks[len(toks) // 2 + 1 : len(toks)] AS s
         |  FROM t WHERE len(toks) >= 2),
         |scored AS (
         |  SELECT doc_id, ${scoresSql("f")}, ${scoresSql("s")} FROM halves),
         |pred AS (
         |  SELECT doc_id, ${predSql("f")} AS lang_first,
         |         ${predSql("s")} AS lang_second
         |  FROM scored)
         |SELECT lang_first, lang_second,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       (lang_first <> lang_second) AS mixed
         |FROM pred
         |GROUP BY lang_first, lang_second
         |ORDER BY lang_first, lang_second""".stripMargin
    }
  ) { (s, dir) =>
    val halves = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"),
        slice(col("toks"), lit(1), (size(col("toks")) / 2).cast("int")).as("f"),
        expr("slice(toks, CAST(size(toks) DIV 2 AS INT) + 1, " +
          "size(toks) - CAST(size(toks) DIV 2 AS INT))").as("s"))
    // one codegen'd token pass per half ([[LexiconCounts]] — same
    // interpreted-HOF replacement as q_lang_id)
    def scored(df: DataFrame, half: String): DataFrame =
      lexicons.zipWithIndex.foldLeft(
        df.withColumn(s"${half}_lc",
          graft.functions.LexiconCounts.lexCounts(col(half),
            lexicons.map(_._2)))) {
        case (d, ((l, _), i)) =>
          d.withColumn(s"${half}_$l", col(s"${half}_lc").getItem(i))
      }
    def pred(p: String) = {
      val m = greatest(lexicons.map(l => col(s"${p}_${l._1}")): _*)
      lexicons.foldLeft(when(lit(false), "")) { case (c, (l, _)) =>
        c.when(col(s"${p}_$l") === m, l)
      }
    }
    scored(scored(halves, "f"), "s")
      .select(col("doc_id"), pred("f").as("lang_first"), pred("s").as("lang_second"))
      .groupBy("lang_first", "lang_second")
      .agg(count(lit(1)).as("n_docs"))
      .select(col("lang_first"), col("lang_second"), col("n_docs"),
        (col("lang_first") =!= col("lang_second")).as("mixed"))
      .orderBy("lang_first", "lang_second")
  }

  /** CAPSTONE curation verdict — the per-document keep/drop decision a
    * corpus pipeline actually ships, composing three exactly-matched
    * stages in drop-priority order: exact duplicate (not its text-hash
    * group's min doc_id) > near-duplicate non-representative (not its
    * MinHash-cluster's longest doc — same labels/ranking as
    * q_dedup_cluster / q_cluster_rep, shared `clusterLabels` view) >
    * benchmark-contaminated (shares a 5-gram with the q_contam_ngram
    * benchmark set). Each reason column is emitted separately so
    * downstream can audit why mass was dropped.
    *
    * Scale: reuses the memoized cluster-labels view (the CC loop runs
    * once per dir); the exact stage is one window over text-hash groups;
    * contamination is the broadcast gate. Nothing quadratic is added on
    * top of the already-bounded stages. */
  val qDedupVerdict: Q = Q(
    "q_dedup_verdict",
    Some(
      s"""$ccLabelsSqlWith,
         |ex AS (
         |  SELECT doc_id,
         |         (doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text)))
         |           AS is_exact_dup
         |  FROM documents),
         |rep AS (
         |  SELECT d.doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY lb.cluster_id
         |                            ORDER BY d.n_chars DESC, d.doc_id) AS rn
         |  FROM documents d JOIN labels lb ON d.doc_id = lb.doc_id),
         |wtok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |g AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i : i + 4], ' ') AS ng
         |  FROM wtok, unnest(generate_series(1, len(t) - 4)) AS u(i)
         |  WHERE len(t) >= 5),
         |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 29 = 0),
         |contam AS (
         |  SELECT DISTINCT g.doc_id FROM g JOIN bench ON g.ng = bench.ng
         |  WHERE g.doc_id % 29 <> 0)
         |SELECT ex.doc_id, ex.is_exact_dup,
         |       (rep.rn > 1) AS is_near_dup,
         |       (contam.doc_id IS NOT NULL) AS is_contaminated,
         |       CASE WHEN ex.is_exact_dup THEN 'drop_exact'
         |            WHEN rep.rn > 1 THEN 'drop_neardup'
         |            WHEN contam.doc_id IS NOT NULL THEN 'drop_contam'
         |            ELSE 'keep' END AS verdict
         |FROM ex
         |JOIN rep ON ex.doc_id = rep.doc_id
         |LEFT JOIN contam ON ex.doc_id = contam.doc_id
         |ORDER BY ex.doc_id""".stripMargin)
  ) { (s, dir) => dedupVerdict(s, Tables.documents(s, dir), dir) }

  /** Frame-parametric MinHash candidate pairs: the same 16-hash / 4×4
    * banding as [[minhashPairs]], but computed from an arbitrary
    * documents frame via the one-pass [[graft.functions.MinHashSig]]
    * expression (spec-pinned equal to the explode+aggregate pipeline the
    * dir-bound path and the DuckDB oracle use — so the pairs, and any
    * labels built on them, are identical). Used by the maintained
    * [[graft.streaming.CurationView]], whose corpus is an accumulating
    * log, not a fixture dir. */
  def minhashPairsFrom(docs: DataFrame): DataFrame = {
    import graft.functions.MinHashSig.minhashSig
    val sig = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), minhashSig(col("toks")).as("sig"))
    val bandStructs = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("key"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("x").join(bands.as("y").hint("shuffle_hash"), Seq("band", "key"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Cluster labels for an arbitrary documents frame (frame-parametric
    * twin of [[clusterLabels]]). */
  def labelsFrom(docs: DataFrame): DataFrame =
    ConnectedComponents.labels(
      docs.select(col("doc_id").as("id")),
      minhashPairsFrom(docs))
      .select(col("id").as("doc_id"), col("cluster_id"))

  /** The verdict behind q_dedup_verdict, reusable on any documents frame
    * (the `dir` routes to the shared cluster-labels view for that
    * fixture; pass a custom frame plus its dir for spec fixtures). */
  def dedupVerdict(s: SparkSession, docs: DataFrame, dir: String): DataFrame =
    dedupVerdictFrom(docs, clusterLabels(s, dir))

  /** Verdict core over explicit cluster labels — shared by the declared
    * query (cached per-dir labels) and the maintained CurationView
    * (labels recomputed from its accumulating doc log). */
  def dedupVerdictFrom(docs: DataFrame, labels: DataFrame): DataFrame = {
    import graft.operators.Corpus.{ContamBenchMod, ContamNgram}
    val ex = docs.select(col("doc_id"),
      (col("doc_id") =!= min("doc_id").over(
        Window.partitionBy(md5(col("text"))))).as("is_exact_dup"))
    val rep = docs.join(labels, "doc_id")
      .withColumn("rn", row_number().over(Window.partitionBy("cluster_id")
        .orderBy(col("n_chars").desc, col("doc_id"))))
      .select(col("doc_id"), col("rn"))
    val w = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .where(size(col("t")) >= ContamNgram)
    // codegen'd window pass ([[graft.functions.WordNgrams]]); the hash
    // moves OUTSIDE the old interpreted lambda — same values
    val g = w.select(col("doc_id"),
        explode(graft.functions.WordNgrams.wordNgrams(col("t"), ContamNgram))
          .as("ngs"))
      .select(col("doc_id"), xxhash64(col("ngs")).as("ng"))
      .distinct()
    val bench = g.where(col("doc_id") % ContamBenchMod === 0)
      .select("ng").distinct()
    val contam = g.where(col("doc_id") % ContamBenchMod =!= 0)
      .join(broadcast(bench), "ng")
      .select("doc_id").distinct()
      .withColumn("is_contaminated", lit(true))
    ex.join(rep, "doc_id")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_exact_dup"),
        (col("rn") > 1).as("is_near_dup"),
        coalesce(col("is_contaminated"), lit(false)).as("is_contaminated"),
        when(col("is_exact_dup"), "drop_exact")
          .when(col("rn") > 1, "drop_neardup")
          .when(coalesce(col("is_contaminated"), lit(false)), "drop_contam")
          .otherwise("keep").as("verdict"))
      .orderBy("doc_id")
  }

  /** A bigram is "rare" when it occurs at most this many times in the
    * whole corpus (including the occurrence being scored). */
  private val RareBigramMax = 2

  /** Bigram-rarity fluency filter — the hash-stable core of an n-gram
    * LM quality score (the CCNet recipe filters training data by
    * KenLM perplexity; the dominant signal at the filtering margin is
    * how many of a document's word transitions the corpus has never
    * or almost never seen — boilerplate and fluent prose reuse
    * transitions, gibberish/OCR noise/mis-segmented text invents
    * them). Emits per doc: bigram count, rare-bigram count, and the
    * rare ratio (decimal-exact division, round 6 — no transcendental
    * log whose libm could diverge between engines).
    *
    * Scale shape: bigram extraction is a pure projection
    * (`zip_with` over two slices of the token array — no explode
    * before the count, no window, no per-doc shuffle); corpus counts
    * are one hash aggregation; and the join back to documents touches
    * ONLY the rare keys — each by construction ≤ [[RareBigramMax]]
    * occurrences corpus-wide, so the join is provably skew-free (the
    * "the the"-grade hot bigrams never enter it; they are exactly the
    * ones the filter doesn't need). n_bigrams comes straight off the
    * array length, never from the exploded frame. */
  val qRareBigram: Q = Q(
    "q_rare_bigram",
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      base AS (SELECT doc_id,
                      CAST(greatest(len(toks) - 1, 0) AS BIGINT) AS n_bigrams
               FROM t),
      bgl AS (SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i + 1])) AS bg
              FROM t),
      counts AS (SELECT bg, COUNT(*) AS cnt FROM bgl GROUP BY bg),
      rare AS (SELECT bg FROM counts WHERE cnt <= $RareBigramMax),
      nr AS (SELECT doc_id, COUNT(*) AS n_rare
             FROM bgl JOIN rare USING (bg) GROUP BY doc_id)
      SELECT b.doc_id, b.n_bigrams,
             COALESCE(nr.n_rare, 0) AS n_rare,
             CASE WHEN b.n_bigrams > 0 THEN
               CAST(round(CAST(COALESCE(nr.n_rare, 0) AS DECIMAL(18,9))
                          / b.n_bigrams, 6) AS DOUBLE)
             END AS rare_ratio
      FROM base b LEFT JOIN nr ON b.doc_id = nr.doc_id
      ORDER BY b.doc_id
      """.stripMargin.trim)
  ) { (s, dir) => rareBigram(Tables.documents(s, dir)) }

  /** The [[qRareBigram]] plan against an explicit documents frame. */
  def rareBigram(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val base = t.select(col("doc_id"),
      greatest(size(col("toks")) - 1, lit(0)).cast("long").as("n_bigrams"))
    // adjacent-pair extraction as a projection: zip the token array
    // with itself shifted by one — no posexplode+self-join, no window
    val docBg = t.select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val rare = docBg.groupBy("bg").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") <= RareBigramMax).select("bg")
    val nRare = docBg.join(rare, "bg")
      .groupBy("doc_id").agg(count(lit(1)).as("n_rare"))
    base.join(nRare, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        when(col("n_bigrams") > 0,
          round(coalesce(col("n_rare"), lit(0L)).cast("decimal(18,9)")
            / col("n_bigrams"), 6).cast("double")).as("rare_ratio"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------- BM25

  /** Query-doc prefix for BM25 retrieval (mirrors Similarity.NQueries). */
  private val Bm25NQueries = 8
  /** Result depth per query (mirrors Similarity.TopK). */
  private val Bm25TopK = 5
  /** SCALE-AWARE df-cap denominator: BM25 terms with corpus df >
    * `max(NgramStopDf, N DIV Bm25DfFrac)` are pruned — a RELATIVE
    * rarity threshold (df/N ≤ 1%), floored at the ngram family's
    * absolute cap so the official small SFs keep their values
    * bit-for-bit (the NCells/ndBits migration pattern). The r11 sf1
    * audit caught why relative beats absolute here: with the fixed cap
    * the 10× corpus pushed EVERY query term over df=5 and the
    * retrieval surface silently emptied (0 rows, oracle agreeing) —
    * the ngram-jaccard queries keep their fixed cap because theirs is
    * a boilerplate prune (true near-dup shingles stay rare in absolute
    * terms), but a retrieval index must keep matching as the corpus
    * grows. Skew note: the postings join is BROADCAST on the tiny
    * query-term side, so postings never shuffle by term — the cap
    * bounds per-query candidate volume (Σ df ≤ terms·N/100, the
    * standard BM25 postings-scan cost), not shuffle skew. */
  private val Bm25DfFrac = 100
  private[graft] def bm25DfCap(n: Long): Long =
    math.max(NgramStopDf.toLong, n / Bm25DfFrac)
  /** Fixed-point scale (2^20) for the order-independent score sum. */
  private[graft] val Bm25Fx = 1048576L

  /** BM25 more-like-this retrieval over the 3-shingle inverted index —
    * the lexical-retrieval complement of the vector-ANN family
    * (`q_sim_*`): for each of the first [[Bm25NQueries]] docs, rank all
    * other docs by BM25 (k1 = 1.2, b = 0.75) over the query doc's
    * shingle terms, keeping the [[Bm25TopK]] best. Terms here are
    * OCCURRENCE-counted 3-shingles (no per-doc distinct — tf is the
    * real within-doc term frequency), hashed through the portable
    * 60-bit h60. The word-level variant is degenerate on any corpus
    * with heavy-tailed stopwords (and vacuous on the fixture's 31-token
    * vocabulary, df ≈ 0.8·N for every word); phrase-level terms are how
    * production more-like-this runs (Elasticsearch MLT with shingle
    * analyzers), and they make the df-cap a principled stopword prune.
    *
    * Determinism discipline: BM25's idf uses the raw odds ratio
    * (N − df + ½)/(df + ½) instead of its log — a per-term monotone
    * transform, so each term's contribution keeps BM25's tf-saturation
    * and length-normalization shape while avoiding the one
    * transcendental whose libm could diverge between engines. With
    * k1 = 6/5 and b = 3/4 every factor clears to integers:
    *   tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) = 22·tf·T / (10·tf·T + 3T + 9·dl·N)
    *   (N−df+½)/(df+½)                     = (2N−2df+1) / (2df+1)
    * (T = total corpus shingles, so avgdl = T/N never materializes as a
    * rounded value). Each factor is one correctly-rounded BIGINT→double
    * cast + division, the product is floored to [[Bm25Fx]] fixed-point,
    * and the per-pair score is an exact integer SUM — order-independent
    * across any partial-aggregation schedule, like the PQ training sums.
    *
    * Scale shape: tf is one explode + hash agg; df one more agg over tf
    * (both map-side combined); the query-term frame is tiny (≤ NQueries
    * docs' shingles) and BROADCAST, so neither join shuffles the corpus;
    * candidate volume is Σ df(kept terms) ≤ terms·[[NgramStopDf]] and
    * every join key carries ≤ NgramStopDf postings corpus-wide — the
    * same provably-skew-free argument as q_rare_bigram's rare keys (hot
    * shingles are exactly the ones the df-cap prunes, and BM25 is the
    * scoring function for which that prune is principled: their idf ≈ 0).
    * dl rides the tf grouping key (functionally dependent on doc_id), so
    * no doc-level side join; final rank through the bounded-heap
    * TopKPerGroup plan, never a bare corpus-wide window. */
  /** The full BM25 oracle CTE chain (shingles → tf/df/stats → capped
    * query terms → fixed-point contributions → per-pair sums → dense
    * rank), shared by [[qBm25]] and the hybrid-fusion oracle. Ends at
    * `ranked(query_id, neighbor_id, sfx, rnk)`; consumers filter to
    * their depth. */
  private[graft] def bm25OracleCtes: String =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      shq AS (SELECT doc_id, CAST(greatest(len(l) - 2, 0) AS BIGINT) AS dl,
                     unnest(list_transform(range(1, greatest(len(l)-1, 1)),
                       i -> concat_ws(' ', l[i], l[i+1], l[i+2]))) AS sh
              FROM toks WHERE len(l) >= 3),
      hs AS (SELECT doc_id, dl, ${h60Sql("sh")} AS h FROM shq),
      tf AS (SELECT doc_id, dl, h, CAST(COUNT(*) AS BIGINT) AS tf
             FROM hs GROUP BY doc_id, dl, h),
      dfx AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY h),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(greatest(len(l) - 2, 0)) AS BIGINT) AS t FROM toks),
      qt AS (SELECT tf.doc_id AS query_id, tf.h, dfx.df
             FROM tf JOIN dfx USING (h) CROSS JOIN st
             WHERE tf.doc_id < $Bm25NQueries
               AND dfx.df <= greatest($NgramStopDf, st.n // $Bm25DfFrac)),
      cand AS (SELECT qt.query_id, tf.doc_id AS neighbor_id, tf.tf, tf.dl, qt.df
               FROM tf JOIN qt ON tf.h = qt.h AND tf.doc_id <> qt.query_id),
      contrib AS (SELECT c.query_id, c.neighbor_id,
          CAST(floor((CAST(22 * c.tf * st.t AS DOUBLE)
                      / CAST(10 * c.tf * st.t + 3 * st.t + 9 * c.dl * st.n AS DOUBLE))
                     * (CAST(2 * st.n - 2 * c.df + 1 AS DOUBLE)
                        / CAST(2 * c.df + 1 AS DOUBLE)) * $Bm25Fx.0) AS BIGINT) AS fx
          FROM cand c CROSS JOIN st),
      sc AS (SELECT query_id, neighbor_id, CAST(SUM(fx) AS BIGINT) AS sfx
             FROM contrib GROUP BY 1, 2),
      ranked AS (SELECT query_id, neighbor_id, sfx,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY sfx DESC, neighbor_id ASC) AS rnk
                 FROM sc)""".stripMargin

  val qBm25: Q = Q(
    "q_bm25",
    Some(s"""
      WITH $bm25OracleCtes
      SELECT query_id, neighbor_id,
             CAST(sfx AS DOUBLE) / $Bm25Fx.0 AS score,
             CAST(rnk AS BIGINT) AS rank
      FROM ranked WHERE rnk <= $Bm25TopK
      ORDER BY query_id, rank
      """.stripMargin.trim)
  ) { (s, dir) => bm25Format(bm25RankedFor(s, dir, Bm25TopK)) }

  /** The per-(query, neighbor) BM25 fixed-point sums — [[qBm25]]'s plan
    * up to (but not including) the rank stage, reusable at any result
    * depth (the hybrid-fusion query ranks the same sums deeper). */
  def bm25Sums(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
    // occurrence shingles (NO array_distinct — tf is real), dl riding along
    val hs = t.where(size(col("l")) >= 3)
      .select(col("doc_id"),
        greatest(size(col("l")) - 2, lit(0)).cast("long").as("dl"),
        // codegen'd window pass ([[graft.functions.WordNgrams]])
        explode(graft.functions.WordNgrams.wordNgrams(col("l"), 3)).as("sh"))
      .select(col("doc_id"), col("dl"), h60(col("sh")).as("h"))
    // the postings table feeds THREE consumers (candidate side, df agg,
    // query-term side) whose differing pushed filters defeat exchange
    // reuse — materialize the explode+agg ONCE (the ngramKeptShingles
    // "materialize the signature table" discipline; the plan audit
    // showed a duplicate corpus explode without it, a flat 2× at scale)
    val tf = hs.groupBy("doc_id", "dl", "h").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val dfx = tf.groupBy("h").agg(count(lit(1)).as("df"))
    val st = t.agg(count(lit(1)).as("n"),
      sum(greatest(size(col("l")) - 2, lit(0))).cast("long").as("t"))
    // query-term frame: tiny, broadcast into both joins below; the
    // df-cap derives from the corpus count (scale-aware, see bm25DfCap)
    val qt = dfx.join(
        broadcast(tf.where(col("doc_id") < Bm25NQueries)
          .select(col("doc_id").as("query_id"), col("h"))), "h")
      .crossJoin(broadcast(st))
      .where(col("df") <= greatest(lit(NgramStopDf.toLong),
        expr(s"n DIV $Bm25DfFrac")))
      .select("query_id", "h", "df")
    val cand = tf.join(broadcast(qt), "h")
      .where(col("doc_id") =!= col("query_id"))
      .crossJoin(broadcast(st))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        floor(((lit(22) * col("tf") * col("t")).cast("double")
            / (lit(10) * col("tf") * col("t") + lit(3) * col("t")
               + lit(9) * col("dl") * col("n")).cast("double"))
          * ((lit(2) * col("n") - lit(2) * col("df") + lit(1)).cast("double")
             / (lit(2) * col("df") + lit(1)).cast("double"))
          * lit(Bm25Fx.toDouble)).cast("long").as("fx"))
    cand.groupBy("query_id", "neighbor_id")
      .agg(sum("fx").cast("long").as("sfx"))
  }

  /** ON-DISK lexical index artifact per corpus path — the
    * [[graft.streaming.Bm25IndexView]] layout (`postings/` `(doc_id,
    * dl, h, tf)`, `terms/` `(h, df)`, `stats/` `(n, t)`), built once by
    * the first query that needs it and read as plain parquet by every
    * consumer after: q_bm25, both hybrid fusions, q_lexical_health, and
    * any fresh session or JVM. This replaces the r11 in-JVM `.persist()`
    * memos — at 100 TB the postings log IS a table on shared storage,
    * not executor memory (and the resident memo copies were the
    * suspected memory-pressure mechanism behind the r11 q_winsorize
    * capture regression). Determinism: a pure function of the immutable
    * fixture, fingerprint-keyed ([[graft.IndexStore]]); the oracle
    * re-derives the full postings chain in SQL on every run. */
  private def bm25ArtifactDir(s: SparkSession, dir: String): String =
    graft.IndexStore.artifact(dir, "bm25", Seq("documents")) { out =>
      import graft.IndexStore.stage
      // Par.boost: the postings explode (trigram shingling + hashing,
      // ~dl rows out per doc) is heavy per-row compute BEFORE the
      // groupBy's exchange — a single-file fixture otherwise runs the
      // whole corpus's shingling on one core (r17 probe: 95.9 s of the
      // 97.7 s sf10 cold build was this stage, ~1 core busy)
      val docs = Par.boost(Tables.documents(s, dir))
      // one corpus explode+agg feeds both writes: stage through the
      // postings parquet and read it back for the df agg — NOT
      // localCheckpoint, whose non-evictable blocks stay pinned in the
      // JVM long after the build (VERDICT r15 #4)
      stage("postings")(bm25Postings(docs).write.parquet(s"$out/postings"))
      stage("terms") {
        s.read.parquet(s"$out/postings")
          .groupBy("h").agg(count(lit(1)).as("df"))
          .write.parquet(s"$out/terms")
      }
      val (n, t) = stage("stats")(bm25Stats(docs))
      graft.IndexStore.note("n_docs", n)
      graft.IndexStore.note("total_terms", t)
      import s.implicits._
      Seq((n, t)).toDF("n", "t").write.parquet(s"$out/stats")
    }

  /** The served lexical artifacts `(postings, terms, (n, t))` — lazy
    * parquet reads of [[bm25ArtifactDir]], memoized per (session,
    * RESOLVED artifact path) so plan handles reuse file listings
    * (frames are session-bound, so the session is part of the key — a
    * restarted session re-resolves from the same on-disk artifact).
    * The artifact path embeds the corpus fingerprint and is resolved
    * on EVERY lookup (metadata-only walk), so a fixture regenerated
    * within one session gets fresh frames, never a stale entry. */
  private val bm25IdxCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, DataFrame, (Long, Long))]
  private def bm25IndexFor(
      s: SparkSession, dir: String): (DataFrame, DataFrame, (Long, Long)) = {
    val a = bm25ArtifactDir(s, dir)
    bm25IdxCache.getOrElseUpdate((s, a), {
      val st = s.read.parquet(s"$a/stats").head()
      (s.read.parquet(s"$a/postings"), s.read.parquet(s"$a/terms"),
        (st.getLong(0), st.getLong(1)))
    })
  }

  /** The scored BM25 sums off the on-disk index — what every batch
    * retrieval query ranks. Each consumer action re-reads the (small,
    * df-capped-bounded) artifact: serving cost, not build cost. */
  private def bm25SumsFor(s: SparkSession, dir: String): DataFrame = {
    val (postings, terms, (n, t)) = bm25IndexFor(s, dir)
    bm25SumsFromServed(postings, terms, n, t)
  }

  /** [[bm25Sums]] against an explicit postings table + pre-merged df
    * dictionary + corpus stats — the artifact-serving plan: the same
    * candidate join and [[bm25FxCol]] arithmetic (n, t as literals
    * instead of the st cross join; bit-identical scores, the contract
    * the streaming-search spec already pins), with df read from the
    * stored dictionary instead of re-aggregated from postings. */
  private def bm25SumsFromServed(tf: DataFrame, dfx: DataFrame,
      n: Long, t: Long): DataFrame = {
    val qt = dfx.join(
        broadcast(tf.where(col("doc_id") < Bm25NQueries)
          .select(col("doc_id").as("query_id"), col("h"))), "h")
      .where(col("df") <= bm25DfCap(n))
      .select("query_id", "h", "df")
    tf.join(broadcast(qt), "h")
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        bm25FxCol(col("tf"), col("dl"), col("df"), n, t).as("fx"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum("fx").cast("long").as("sfx"))
  }

  /** Sums ranked to the top `k` per query through the bounded-heap
    * plan: `(query_id, neighbor_id, sfx, rank)`. */
  private def bm25RankSums(sc: DataFrame, k: Int): DataFrame = {
    val pruned = graft.plans.TopK.perGroup(sc, k, Seq("query_id"),
      Seq(col("sfx").desc, col("neighbor_id").asc))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sfx").desc, col("neighbor_id").asc)
    pruned.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sfx"),
        col("rank").cast("long").as("rank"))
  }

  /** [[bm25Sums]] ranked to the top `k` per query. */
  def bm25Ranked(docs: DataFrame, k: Int): DataFrame =
    bm25RankSums(bm25Sums(docs), k)

  /** [[bm25Ranked]] off the on-disk per-corpus index artifact — what
    * the declared queries use (one postings build serves them all). */
  def bm25RankedFor(s: SparkSession, dir: String, k: Int): DataFrame =
    bm25RankSums(bm25SumsFor(s, dir), k)

  private def bm25Format(ranked: DataFrame): DataFrame =
    ranked.select(col("query_id"), col("neighbor_id"),
        (col("sfx").cast("double") / Bm25Fx.toDouble).as("score"),
        col("rank"))
      .orderBy("query_id", "rank")

  /** The [[qBm25]] plan against an explicit documents frame. */
  def bm25MoreLikeThis(docs: DataFrame): DataFrame =
    bm25Format(bm25Ranked(docs, Bm25TopK))

  /** Lexical-index health metrology — the BM25 side of the index-ops
    * lifecycle's HEALTH leg (`q_index_health` is the vector side):
    * corpus stats, the scale-aware df-cap in force, and the kept/total
    * split of terms and postings under it, as `(metric, value)` rows.
    * This is what an operator of the maintained lexical index
    * ([[graft.streaming.Bm25IndexView]]) watches: `terms_kept /
    * terms_total` collapsing means the relative cap is pruning the
    * vocabulary (query terms going dark — the failure mode the r11 sf1
    * audit caught when a FIXED cap emptied q_bm25 at 10× corpus);
    * `postings_kept` is the actual served-index volume, the number
    * capacity planning reads.
    *
    * Scale shape: one postings build (the doc-local explode+agg the
    * index maintainer already runs), one df aggregation, and a handful
    * of global counts — the kept-postings count reuses the served-index
    * equi-join on `h`. Integer-exact; no floats anywhere. */
  val qLexicalHealth: Q = Q(
    "q_lexical_health",
    Some(s"""
      WITH $bm25OracleCtes,
      capv AS (SELECT greatest($NgramStopDf, n // $Bm25DfFrac) AS cap, n, t FROM st),
      m AS (
        SELECT 'n_docs' AS metric, n AS value FROM capv
        UNION ALL SELECT 't_shingles', t FROM capv
        UNION ALL SELECT 'df_cap', cap FROM capv
        UNION ALL SELECT 'terms_total', (SELECT COUNT(*) FROM dfx)
        UNION ALL SELECT 'terms_kept',
          (SELECT COUNT(*) FROM dfx, capv WHERE df <= cap)
        UNION ALL SELECT 'postings_total', (SELECT COUNT(*) FROM tf)
        UNION ALL SELECT 'postings_kept',
          (SELECT COUNT(*) FROM tf JOIN dfx USING (h), capv
           WHERE dfx.df <= cap))
      SELECT metric, CAST(value AS BIGINT) AS value FROM m
      ORDER BY metric
      """.stripMargin.trim)
  ) { (s, dir) =>
    import s.implicits._
    // all three legs read the ON-DISK artifact: postings and the
    // pre-merged df dictionary are never re-derived from text here
    val (postings, dfx, (n, t)) = bm25IndexFor(s, dir)
    val cap = bm25DfCap(n)
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("value"))
        .select(lit(name).as("metric"), col("value"))
    Seq(("df_cap", cap), ("n_docs", n), ("t_shingles", t))
      .toDF("metric", "value")
      .unionByName(counted("terms_total", dfx))
      .unionByName(counted("terms_kept", dfx.where(col("df") <= cap)))
      .unionByName(counted("postings_total", postings))
      .unionByName(counted("postings_kept", bm25ServedFrom(postings, dfx, n)))
      .orderBy("metric")
  }

  /** The SERVED BM25 index over a corpus: df-capped postings
    * `(h, df, neighbor_id, dl, tf)` — exactly the candidate rows the
    * batch [[qBm25]] join can produce (terms with df > [[NgramStopDf]]
    * never match, so the served index simply omits them: the df-cap
    * prune baked into the artifact). The streaming search twin
    * ([[graft.streaming.StreamOps.bm25SearchStream]]) scans this as its
    * stream-static side. */
  /** The raw postings frame `(doc_id, dl, h, tf)` of a documents frame
    * — the per-doc, per-term rows an incremental index maintainer
    * appends ([[graft.streaming.Bm25IndexView]]); doc-local, so a
    * batch's postings never depend on the rest of the corpus. */
  def bm25Postings(docs: DataFrame): DataFrame = {
    val t = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
    val hs = t.where(size(col("l")) >= 3)
      .select(col("doc_id"),
        greatest(size(col("l")) - 2, lit(0)).cast("long").as("dl"),
        // codegen'd window pass ([[graft.functions.WordNgrams]])
        explode(graft.functions.WordNgrams.wordNgrams(col("l"), 3)).as("sh"))
      .select(col("doc_id"), col("dl"), h60(col("sh")).as("h"))
    hs.groupBy("doc_id", "dl", "h").agg(count(lit(1)).as("tf"))
  }

  /** The served index assembled from postings + a term-df table + the
    * corpus size: scale-aware cap filter on df, join back — shared by
    * the batch build (fresh df aggregation) and the maintained view's
    * read path (pre-merged df table, no postings re-aggregation). */
  def bm25ServedFrom(postings: DataFrame, dfx: DataFrame, n: Long): DataFrame =
    postings.join(dfx.where(col("df") <= bm25DfCap(n)), "h")
      .select(col("h"), col("df"), col("doc_id").as("neighbor_id"),
        col("dl"), col("tf"))

  def bm25ServedIndex(docs: DataFrame): DataFrame = {
    val postings = bm25Postings(docs)
    bm25ServedFrom(postings,
      postings.groupBy("h").agg(count(lit(1)).as("df")), docs.count())
  }

  /** The corpus stats `(N docs, T total shingles)` the BM25 score is
    * parameterized by — index artifacts, collected once at index-build
    * time (two longs, not data). */
  def bm25Stats(docs: DataFrame): (Long, Long) = {
    val r = docs.select(split(col("text"), " ").as("l"))
      .agg(count(lit(1)).as("n"),
        sum(greatest(size(col("l")) - 2, lit(0))).cast("long").as("t"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Per-term BM25 contribution in 2^20 fixed point — the EXACT
    * arithmetic of [[qBm25]]'s `contrib` stage (two correctly-rounded
    * BIGINT→double divisions, product, floor), shared with the
    * streaming search twin so streamed scores are bit-identical. */
  private[graft] def bm25FxCol(tf: Column, dl: Column, df: Column,
      n: Long, t: Long): Column =
    floor(((lit(22) * tf * lit(t)).cast("double")
        / (lit(10) * tf * lit(t) + lit(3) * lit(t)
           + lit(9) * dl * lit(n)).cast("double"))
      * ((lit(2) * lit(n) - lit(2) * df + lit(1)).cast("double")
         / (lit(2) * df + lit(1)).cast("double"))
      * lit(Bm25Fx.toDouble)).cast("long")

  override def all: Seq[Q] = Seq(
    qDedupExact, qMinhashDedup, qSimhashDedup, qNgramJaccard,
    qNgramContainment, qMinhashEst, qHeavyHitters, qTextNormalize,
    qTextStats, qTokenCount, qLangId, qQualityScore, qDocFingerprint,
    qWordcount, qRepetition, qNeardupPrune, qNeardupCapped,
    qDedupCluster, qClusterRep, qDedupVerdict, qLangMix, qRareBigram,
    qBm25, qLexicalHealth)
}
