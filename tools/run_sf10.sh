#!/usr/bin/env bash
# The standing sf10 scale-geometry audit (VERDICT r13 item 8).
#
# Generates the sf1 + sf10 subset fixtures if missing (deterministic,
# seeds 42/423), captures the 44-query dedup/ANN/retrieval subset at
# both decades with graft.Bench, runs the independent plain-Scala
# reference checks (graft.RefCheck: exact-equality for the oracle-blind
# banded-LSH and residual IVF-PQ families), and assembles the round's
# BENCH_r{N}_sf10.json with a family-growth diff against the prior
# round's report.
#
# Usage: tools/run_sf10.sh <round> [prior_report]
#   e.g. tools/run_sf10.sh 14 BENCH_r13_sf10.json
#
# Run AFTER `sbt compile` (uses target/scala-2.13/classes directly; the
# Spark 4.1.2 jars come from /opt/spark/jars). Captures use cpus=24 and
# a 32g heap — the r13-calibrated quiet-box settings.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: run_sf10.sh <round> [prior_report]}"
PRIOR="${2:-}"
OUT="BENCH_r${ROUND}_sf10.json"

SUBSET="q_dedup_exact,q_minhash_dedup,q_minhash_est,q_simhash_dedup,q_ngram_jaccard,q_ngram_containment,q_neardup_capped,q_neardup_prune,q_dedup_cluster,q_cluster_rep,q_dedup_verdict,q_chunk_dedup,q_span_dedup,q_span_maxrep,q_doc_fingerprint,q_contamination,q_contam_ngram,q_bm25,q_lexical_health,q_hybrid_rrf,q_hybrid_rrf_ann,q_mmr_rerank,q_embed_quantize,q_sim_topk,q_sim_topk_int8,q_sim_hamming,q_embed_neardup_lsh,q_neardup_gate_stats,q_neardup_sharded,q_sim_ivf,q_sim_lsh,q_sim_pq,q_sim_ivfpq_res,q_ann_recall,q_index_health,q_probe_sweep,q_semantic_dedup,q_funnel,q_retention,q_gap_fill,q_session_window,q_token_count,q_lang_id,q_quality_score"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
JAVA_FLAGS="-Xmx32g --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

[ -d target/sf1 ]  || python3 tools/gen_sf1.py
[ -d target/sf10 ] || python3 tools/gen_sf10.py

# NOTE: Bench's LAST stdout line is a compact top-30 summary; the full
# per-query capture is written to bench_out.json — copy THAT (the
# subset loses queries past the compact line's top-30 cap).
#
# r15: the near-dup gates are build-once fingerprint-keyed artifacts
# (ndgate-* = single-family, ndshard-* = the beyond-cap sharded gate).
# Wipe them before EACH capture so the first run of
# q_embed_neardup_lsh / q_neardup_sharded measures the COLD one-path
# build (candidates -> broadcast-sketch filter -> verify) at both
# decades — the same-path growth exponent the r14 verdict asked for —
# and every other run measures the pay-once read. Bench reports
# min-of-runs, so the report's cold_builds_sf{1,10} blocks carry the
# first-run build costs explicitly. Other artifact families keep the
# r12+ warm-serve methodology (their builds are oracle-audited at
# official SFs).
rm -rf target/graft-index/ndgate-* target/graft-index/ndshard-* target/graft-index/ndshardreps-* target/graft-index/shingle-*
echo "== sf1 subset capture =="
SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$SUBSET" \
  java $JAVA_FLAGS -cp "$CP" graft.Bench > /dev/null
cp bench_out.json /tmp/sf1_subset.json

rm -rf target/graft-index/ndgate-* target/graft-index/ndshard-* target/graft-index/ndshardreps-* target/graft-index/shingle-*
echo "== sf10 subset capture =="
SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$SUBSET" \
  java $JAVA_FLAGS -cp "$CP" graft.Bench > /dev/null
cp bench_out.json /tmp/sf10_subset.json

echo "== independent reference checks at sf10 =="
SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=24 \
  java $JAVA_FLAGS -cp "$CP" graft.RefCheck | tail -1 > /tmp/sf10_refcheck.json
cat /tmp/sf10_refcheck.json

NOTE="${SF10_NOTE:-44-query dedup/ANN/retrieval subset at target/sf10 (documents 500k, embeddings 200k, events 10M; cpus=24, 32g).}"
python3 tools/sf10_report.py /tmp/sf1_subset.json /tmp/sf10_subset.json \
  "$NOTE" "$OUT" /tmp/sf10_refcheck.json ${PRIOR:+"$PRIOR"}
