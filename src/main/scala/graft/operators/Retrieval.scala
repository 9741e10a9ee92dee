package graft.operators

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the fusion layer production search stacks run on
  * top of the two retrieval families this engine already ships: lexical
  * (BM25 over the shingle inverted index, [[TextOps.qBm25]]) and vector
  * (cosine over the embedding column, [[Similarity]]'s ANN family). The
  * `documents` and `embeddings` fixtures share one id space (doc_id ≡
  * vec_id), so a query doc has both a lexical and a vector
  * representation — exactly the hybrid-search setup.
  */
object Retrieval extends QueryPack {

  /** Leg depth fed into the fusion (both legs contribute their top 20). */
  private val FuseDepth = 20
  /** Reciprocal-rank-fusion smoothing constant (the k=60 of Cormack &
    * Clarke's original RRF — SIGIR'09). */
  private val RrfC = 60
  /** Fixed-point numerator: `RrfFx DIV (RrfC + rank)` is EXACT integer
    * arithmetic — 1/(60+r) never materializes as a float, so fused
    * scores are bit-identical in any engine and any sum order (the
    * quotients are distinct for every rank ≤ FuseDepth, preserving
    * RRF's strict rank discount). */
  private val RrfFx = 1048576L
  /** Fused results per query. */
  private val FuseTopK = 5

  /** Reciprocal-rank fusion of the lexical and vector top-[[FuseDepth]]
    * lists: score(d) = Σ_legs RrfFx DIV (RrfC + rank_leg(d)), missing
    * legs contribute 0 — the standard hybrid-search combiner (RRF beats
    * score-interpolation because it needs NO score calibration between
    * BM25's unbounded sums and cosine's [−1, 1]; only ranks cross the
    * leg boundary, which also makes the fusion integer-exact).
    *
    * Scale shape: both legs end in their own bounded-heap top-k plans,
    * so the fusion input is ≤ 2·NQueries·FuseDepth rows — the full
    * outer join and final heap are driver-trivial at ANY corpus size;
    * the heavy lifting stays inside the two legs' established plans
    * (df-capped skew-free postings join; corpus × fixed-query-set
    * cosine scan, the q_sim_topk exemption — at production scale the
    * vector leg swaps to q_sim_ivfpq_res's compressed index, same
    * (query_id, neighbor_id, rank) contract). */
  val qHybridRrf: Q = Q(
    "q_hybrid_rrf",
    Some(s"""
      WITH ${TextOps.bm25OracleCtes},
      ltop AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank_lex
               FROM ranked WHERE rnk <= $FuseDepth),
      e AS (SELECT vec_id, embedding FROM embeddings),
      q AS (SELECT vec_id AS query_id, embedding AS qv FROM e
            WHERE vec_id < ${Similarity.NQueries}),
      vscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                         ${Similarity.cosSql("qv", "e.embedding")} AS cos
                  FROM q, e WHERE e.vec_id <> query_id),
      vranked AS (SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
                  FROM vscored),
      vtop AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank_vec
               FROM vranked WHERE rnk <= $FuseDepth),
      fused AS (SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                       COALESCE(l.neighbor_id, v.neighbor_id) AS neighbor_id,
                       CAST(COALESCE($RrfFx // ($RrfC + l.rank_lex), 0)
                            + COALESCE($RrfFx // ($RrfC + v.rank_vec), 0) AS BIGINT) AS rrf_fx,
                       l.rank_lex, v.rank_vec
                FROM ltop l FULL OUTER JOIN vtop v
                  ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id),
      franked AS (SELECT query_id, neighbor_id, rrf_fx, rank_lex, rank_vec,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY rrf_fx DESC, neighbor_id ASC) AS rnk
                  FROM fused)
      SELECT query_id, neighbor_id, rrf_fx, rank_lex, rank_vec,
             CAST(rnk AS BIGINT) AS rank
      FROM franked WHERE rnk <= $FuseTopK
      ORDER BY query_id, rank
      """.stripMargin.trim)
  ) { (s, dir) =>
    hybridRrf(
      TextOps.bm25RankedFor(s, dir, FuseDepth)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_lex")),
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), FuseDepth)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_vec")))
  }

  /** The PRODUCTION-leg hybrid: the same RRF fusion with the residual
    * IVF-PQ compressed index as the vector leg instead of the exact
    * brute-force scan — the composition actually deployable at corpus
    * scale (the compressed leg probes cells and reads codes; nothing
    * scans raw vectors), and the batch twin the streaming
    * `s_hybrid_search` is spec-pinned against. Oracle: the factored
    * BM25 CTE chain composed with the full residual-ADC training/
    * scoring chain (both independently proven) plus the fusion CTEs —
    * one SQL statement re-deriving the entire hybrid stack. */
  val qHybridRrfAnn: Q = Q(
    "q_hybrid_rrf_ann",
    Some(s"""
      WITH ${TextOps.bm25OracleCtes},
      ltop AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank_lex
               FROM ranked WHERE rnk <= $FuseDepth),
      ${Similarity.ivfPqResScoreSqlCtes.stripPrefix("WITH ")},
      adcranked AS (SELECT query_id, neighbor_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY score DESC, neighbor_id ASC) AS rnk
                    FROM scores),
      vtop AS (SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank_vec
               FROM adcranked WHERE rnk <= $FuseDepth),
      fused AS (SELECT COALESCE(l.query_id, v.query_id) AS query_id,
                       COALESCE(l.neighbor_id, v.neighbor_id) AS neighbor_id,
                       CAST(COALESCE($RrfFx // ($RrfC + l.rank_lex), 0)
                            + COALESCE($RrfFx // ($RrfC + v.rank_vec), 0) AS BIGINT) AS rrf_fx,
                       l.rank_lex, v.rank_vec
                FROM ltop l FULL OUTER JOIN vtop v
                  ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id),
      franked AS (SELECT query_id, neighbor_id, rrf_fx, rank_lex, rank_vec,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY rrf_fx DESC, neighbor_id ASC) AS rnk
                  FROM fused)
      SELECT query_id, neighbor_id, rrf_fx, rank_lex, rank_vec,
             CAST(rnk AS BIGINT) AS rank
      FROM franked WHERE rnk <= $FuseTopK
      ORDER BY query_id, rank
      """.stripMargin.trim)
  ) { (s, dir) =>
    hybridRrf(
      TextOps.bm25RankedFor(s, dir, FuseDepth)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_lex")),
      Similarity.ivfPqResTopK(s, dir, FuseDepth)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_vec")))
  }

  /** Recall evaluation depth (matches the ANN family's TopK). */
  private val RecallK = 5
  /** Fixed-point scale for the exact recall ratio (`hits·Fx DIV k`). */
  private val RecallFx = 1048576L

  /** ANN-index recall metrology — recall@[[RecallK]] of the PRODUCTION
    * compressed index (residual IVF-PQ ADC, [[Similarity.ivfPqResTopK]])
    * against the exact brute-force cosine ground truth, per query plus a
    * `query_id = -1` macro row. This is the number an index operator
    * watches in production: it prices the compression + probe trade
    * directly, and a probe-count or codebook regression moves it
    * immediately.
    *
    * Scale shape: BOTH legs end in their bounded-heap top-k plans, so
    * the recall join sees ≤ NQueries·k rows per side — evaluation cost
    * is the two legs' own (already-priced) cost, and the ground-truth
    * brute-force pass runs over the FIXED eval query set only (the
    * standard recall-eval setup: exact scan for a handful of held-out
    * queries, never for live traffic). Integer-only output — the recall
    * ratio is exact fixed-point (`hits·2^20 DIV k`), no float division
    * to diverge between engines. */
  val qAnnRecall: Q = Q(
    "q_ann_recall",
    Some(s"""
      ${Similarity.ivfPqResScoreSqlCtes},
      adcranked AS (SELECT query_id, neighbor_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY score DESC, neighbor_id ASC) AS rnk
                    FROM scores),
      adctop AS (SELECT query_id, neighbor_id FROM adcranked WHERE rnk <= $RecallK),
      gscored AS (SELECT query_id, e.vec_id AS neighbor_id,
                         ${Similarity.cosSql("qv", "e.embedding")} AS cos
                  FROM q, e WHERE e.vec_id <> query_id),
      granked AS (SELECT query_id, neighbor_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
                  FROM gscored),
      gtop AS (SELECT query_id, neighbor_id FROM granked WHERE rnk <= $RecallK),
      hits AS (SELECT a.query_id, COUNT(*) AS h
               FROM adctop a JOIN gtop g
                 ON a.query_id = g.query_id AND a.neighbor_id = g.neighbor_id
               GROUP BY a.query_id),
      perq AS (SELECT q.query_id,
                      CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
                      CAST(COALESCE(h.h, 0) * $RecallFx // $RecallK AS BIGINT) AS recall_fx
               FROM q LEFT JOIN hits h ON q.query_id = h.query_id)
      SELECT query_id, hits, recall_fx FROM perq
      UNION ALL
      SELECT CAST(-1 AS BIGINT) AS query_id,
             CAST(SUM(hits) AS BIGINT) AS hits,
             CAST(SUM(hits) * $RecallFx // (${Similarity.NQueries} * $RecallK) AS BIGINT) AS recall_fx
      FROM perq
      ORDER BY query_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    overlapMetric(Tables.embeddings(s, dir),
      Similarity.ivfPqResTopK(s, dir, RecallK),
      Similarity.bruteForceTopK(Tables.embeddings(s, dir), RecallK),
      "recall_fx")
  }

  /** Per-query top-k overlap between two ranked legs, as exact
    * fixed-point ratios plus the `query_id = -1` macro row — the shared
    * frame behind both metrology queries ([[qAnnRecall]]: ADC vs exact
    * ground truth; [[qRerankAgreement]]: ADC vs its own deployed
    * re-rank). Legs arrive as bounded top-k frames, so everything here
    * is ≤ NQueries·k rows. */
  private def overlapMetric(e: DataFrame, legA: DataFrame, legB: DataFrame,
      ratioCol: String): DataFrame = {
    val hits = legA.select(col("query_id"), col("neighbor_id"))
      .join(legB.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"))
      .groupBy("query_id").agg(count(lit(1)).as("h"))
    val perq = e.where(col("vec_id") < Similarity.NQueries)
      .select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("h"), lit(0L)).as("hits"),
        expr(s"(coalesce(h, 0) * $RecallFx) DIV $RecallK").as(ratioCol))
    val macroRow = perq.agg(
      sum(col("hits")).as("hits"),
      expr(s"(sum(hits) * $RecallFx) DIV (${Similarity.NQueries} * $RecallK)")
        .as(ratioCol))
      .select(lit(-1L).as("query_id"), col("hits"), col(ratioCol))
    perq.unionByName(macroRow).orderBy("query_id")
  }

  /** Rerank-agreement metrology — the GROUND-TRUTH-FREE shadow metric:
    * overlap@[[RecallK]] between the direct ADC top-k and the deployed
    * two-stage rerank top-k ([[Similarity.ivfPqRerankTopK]]). Unlike
    * [[qAnnRecall]] this costs no brute-force pass at all — the rerank
    * leg IS the production serving path, so the metric is free to
    * compute on live traffic (the standard shadow-scoring setup: when
    * agreement drifts down, the compressed index's ordering has
    * degraded relative to exact scores and it's time to look at probes
    * or retrain — an alarm that needs no labeled ground truth).
    * Integer-exact fixed-point ratios, macro row at `query_id = -1`. */
  val qRerankAgreement: Q = Q(
    "q_rerank_agreement",
    Some(s"""
      ${Similarity.ivfPqResScoreSqlCtes},
      adcranked AS (SELECT query_id, neighbor_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY score DESC, neighbor_id ASC) AS rnk
                    FROM scores),
      adctop AS (SELECT query_id, neighbor_id FROM adcranked WHERE rnk <= $RecallK),
      short AS (SELECT query_id, neighbor_id FROM adcranked
                WHERE rnk <= ${Similarity.RerankK}),
      rr AS (SELECT sh.query_id, sh.neighbor_id,
                    ${Similarity.cosSql("q.qv", "e.embedding")} AS cos
             FROM short sh
             JOIN q ON sh.query_id = q.query_id
             JOIN e ON sh.neighbor_id = e.vec_id),
      rtop AS (SELECT query_id, neighbor_id FROM (
                 SELECT query_id, neighbor_id,
                        row_number() OVER (PARTITION BY query_id
                                           ORDER BY cos DESC, neighbor_id ASC) AS rnk
                 FROM rr) WHERE rnk <= $RecallK),
      hits AS (SELECT a.query_id, COUNT(*) AS h
               FROM adctop a JOIN rtop r
                 ON a.query_id = r.query_id AND a.neighbor_id = r.neighbor_id
               GROUP BY a.query_id),
      perq AS (SELECT q.query_id,
                      CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
                      CAST(COALESCE(h.h, 0) * $RecallFx // $RecallK AS BIGINT) AS agree_fx
               FROM q LEFT JOIN hits h ON q.query_id = h.query_id)
      SELECT query_id, hits, agree_fx FROM perq
      UNION ALL
      SELECT CAST(-1 AS BIGINT) AS query_id,
             CAST(SUM(hits) AS BIGINT) AS hits,
             CAST(SUM(hits) * $RecallFx // (${Similarity.NQueries} * $RecallK) AS BIGINT) AS agree_fx
      FROM perq
      ORDER BY query_id
      """.stripMargin.trim)
  ) { (s, dir) =>
    overlapMetric(Tables.embeddings(s, dir),
      Similarity.ivfPqResTopK(s, dir, RecallK),
      Similarity.ivfPqRerankTopK(s, dir, RecallK),
      "agree_fx")
  }

  /** MMR selection depth (the final diversified result size). */
  private val MmrK = 5

  /** One MMR greedy step as oracle CTEs: candidates = shortlist minus
    * the selected set; `mmr = rel/2 − max(sim to selected)/2` (λ = ½ —
    * exact halving in binary FP, no calibration constant to diverge);
    * pick rn = 1 by (mmr DESC, neighbor_id ASC); fold into the
    * cumulative `sel$i`. */
  private def mmrStepSql(i: Int): String =
    s"""mmr_c$i AS MATERIALIZED (
      |  SELECT r.query_id, r.neighbor_id, r.rel / 2 - MAX(s.sim) / 2 AS mmr
      |  FROM rel r
      |  JOIN sims s ON s.query_id = r.query_id AND s.na = r.neighbor_id
      |  JOIN mmr_sel${i - 1} p ON p.query_id = s.query_id AND p.neighbor_id = s.nb
      |  LEFT JOIN mmr_sel${i - 1} x
      |    ON x.query_id = r.query_id AND x.neighbor_id = r.neighbor_id
      |  WHERE x.neighbor_id IS NULL
      |  GROUP BY r.query_id, r.neighbor_id, r.rel),
      |mmr_s$i AS (SELECT query_id, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY mmr DESC, neighbor_id ASC) AS rn
      |  FROM mmr_c$i) WHERE rn = 1),
      |mmr_sel$i AS MATERIALIZED (SELECT * FROM mmr_sel${i - 1}
      |          UNION ALL SELECT query_id, neighbor_id, $i AS rank FROM mmr_s$i)"""
      .stripMargin

  /** MMR-diversified serving (Carbonell & Goldstein, SIGIR'98 — the
    * diversity re-rank production retrieval runs between the ANN
    * shortlist and the consumer): from the residual compressed index's
    * ADC shortlist of [[Similarity.RerankK]] candidates per query,
    * greedily select [[MmrK]] results maximizing
    * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` with λ = ½ —
    * relevance is the exact query-candidate cosine over the FETCHED
    * shortlist vectors (the two-stage rerank's own stage-2 economics:
    * never a corpus pass), redundancy the exact candidate-candidate
    * cosine within the shortlist. Training-data pipelines run exactly
    * this shape to de-duplicate retrieved context windows.
    *
    * Scale shape: everything downstream of the shortlist is bounded by
    * the legs — rel is NQueries·RerankK rows, the pairwise sims frame
    * NQueries·RerankK² (8·20² = 3200 here, query-count-bounded at any
    * corpus size), and each greedy step joins/aggregates only those.
    * The [[MmrK]] greedy iterations are FIXED-DEPTH plan composition
    * (k is a constant), not a data-dependent driver loop.
    *
    * Determinism: cosines through the shared [[Similarity.cosSql]]
    * arithmetic; λ = ½ halves exactly; MAX over identical double sets
    * and (mmr DESC, neighbor_id ASC) tie-breaks agree engine-to-engine
    * — the oracle mirrors the greedy chain as [[MmrK]] fixed CTE
    * steps. */
  val qMmrRerank: Q = Q(
    "q_mmr_rerank",
    Some(s"""
      ${Similarity.ivfPqResScoreSqlCtes},
      short AS MATERIALIZED (
        SELECT query_id, neighbor_id FROM (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id ASC) AS rn
          FROM scores) WHERE rn <= ${Similarity.RerankK}),
      rel AS MATERIALIZED (
        SELECT sh.query_id, sh.neighbor_id,
               ${Similarity.cosSql("q.qv", "e.embedding")} AS rel
        FROM short sh
        JOIN q ON sh.query_id = q.query_id
        JOIN e ON sh.neighbor_id = e.vec_id),
      sims AS MATERIALIZED (
        SELECT a.query_id, a.neighbor_id AS na, b.neighbor_id AS nb,
               ${Similarity.cosSql("ea.embedding", "eb.embedding")} AS sim
        FROM short a
        JOIN short b ON a.query_id = b.query_id
                    AND a.neighbor_id <> b.neighbor_id
        JOIN e ea ON a.neighbor_id = ea.vec_id
        JOIN e eb ON b.neighbor_id = eb.vec_id),
      mmr_s1 AS (SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, neighbor_id ASC) AS rn
        FROM rel) WHERE rn = 1),
      mmr_sel1 AS MATERIALIZED (SELECT query_id, neighbor_id, 1 AS rank FROM mmr_s1),
      ${(2 to MmrK).map(mmrStepSql).mkString(",\n")}
      SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank
      FROM mmr_sel$MmrK
      ORDER BY query_id, rank
      """.stripMargin.trim)
  ) { (s, dir) =>
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val short = Similarity.ivfPqResTopK(s, dir, Similarity.RerankK)
      .select("query_id", "neighbor_id")
    val q = e.where(col("vec_id") < Similarity.NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    mmrOver(e, q, short)
  }

  /** MMR selection over an explicit corpus / query / shortlist triple —
    * the shared engine behind [[qMmrRerank]] and the streaming serve
    * sidecar ([[graft.streaming.MmrServeView]]). `qs` is `(query_id,
    * qv)`, `short` `(query_id, neighbor_id)`; returns `(query_id,
    * neighbor_id, rank)` with rank = greedy selection order.
    *
    * Shape: the shortlisted vectors are fetched through a broadcast
    * equi-join against the corpus scan (the rerank query's stage-2
    * economics — never a second corpus pass), then ONE shuffle groups
    * each query's ≤ RerankK candidates and the greedy loop runs
    * per-group in [[org.apache.spark.sql.KeyValueGroupedDataset
    * .flatMapGroups]] — the Dataset shape for genuinely SEQUENTIAL
    * per-group logic: expressing k greedy rounds as relational ops
    * costs k window+join+agg stages over driver-scheduled jobs (the
    * first cut measured 5.7 s of pure stage overhead on
    * NQueries·RerankK = 160 rows), while per-group it is O(k·RerankK)
    * arithmetic on rows already co-located. Group size is bounded by
    * the shortlist depth, never by the corpus.
    *
    * Determinism: the in-group cosine mirrors [[VectorOps.cosine]]'s
    * contract exactly (elements widened to double, LEFT-TO-RIGHT
    * accumulation, norms from the same dot — the DotProduct
    * expression's documented arithmetic), λ = ½ halves exactly, and
    * ties break (score DESC, neighbor_id ASC) — the independent
    * reference-reimplementation spec pins EXACT equality with the
    * mirrored DuckDB CTE chain. */
  def mmrOver(e: DataFrame, qs: DataFrame, short: DataFrame,
      k: Int = MmrK): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val rows = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
      .join(broadcast(short), "neighbor_id")
      .join(broadcast(qs), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        col("qv").cast("array<double>"), col("nv").cast("array<double>"))
      .as[(Long, Long, Seq[Double], Seq[Double])]
    rows.groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Seq[Double], Seq[Double])]) =>
        val cands = it.toArray.sortBy(_._2)
        def dot(a: Seq[Double], b: Seq[Double]): Double = {
          var acc = 0.0; var i = 0
          while (i < a.length) { acc += a(i) * b(i); i += 1 }
          acc
        }
        def cos(a: Seq[Double], b: Seq[Double]): Double =
          dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
        val qv = cands.head._3
        val rel = cands.map(c => c._2 -> cos(qv, c._4)).toMap
        val byId = cands.map(c => c._2 -> c._4).toMap
        val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (sel.length < math.min(k, cands.length)) {
          val remaining = cands.map(_._2).filterNot(sel.contains)
          val next =
            if (sel.isEmpty) remaining.minBy(c => (-rel(c), c))
            else remaining.minBy { c =>
              val maxsim = sel.map(p => cos(byId(c), byId(p))).max
              (-(rel(c) / 2 - maxsim / 2), c)
            }
          sel += next
        }
        sel.iterator.zipWithIndex.map { case (nb, i) => (qid, nb, (i + 1).toLong) }
      }
      .toDF("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** RRF over two ranked legs `(query_id, neighbor_id, rank_lex|vec)` —
    * leg-agnostic, so callers can swap the exact-cosine leg for any ANN
    * variant's (query_id, neighbor_id, rank) output. */
  def hybridRrf(lex: DataFrame, vec: DataFrame): DataFrame = {
    val fused = lex.join(vec, Seq("query_id", "neighbor_id"), "full_outer")
      .select(col("query_id"), col("neighbor_id"),
        (coalesce(expr(s"$RrfFx DIV ($RrfC + rank_lex)"), lit(0L))
          + coalesce(expr(s"$RrfFx DIV ($RrfC + rank_vec)"), lit(0L))).as("rrf_fx"),
        col("rank_lex"), col("rank_vec"))
    val pruned = graft.plans.TopK.perGroup(fused, FuseTopK, Seq("query_id"),
      Seq(col("rrf_fx").desc, col("neighbor_id").asc))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_fx").desc, col("neighbor_id").asc)
    pruned.withColumn("rank", row_number().over(w))
      .where(col("rank") <= FuseTopK)
      .select(col("query_id"), col("neighbor_id"), col("rrf_fx"),
        col("rank_lex"), col("rank_vec"), col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  override def all: Seq[Q] =
    Seq(qHybridRrf, qHybridRrfAnn, qAnnRecall, qRerankAgreement, qMmrRerank)
}
