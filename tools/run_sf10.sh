#!/usr/bin/env bash
# The standing sf10 scale-geometry audit (VERDICT r13 item 8).
#
# Generates the sf1 + sf10 subset fixtures if missing (deterministic,
# seeds 42/423), captures the 44-query dedup/ANN/retrieval subset at
# both decades with graft.Bench, runs the independent plain-Scala
# reference checks (graft.RefCheck: exact-equality for the oracle-blind
# banded-LSH and residual IVF-PQ families), measures the isolated
# q_neardup_shard_reps cold/warm pass (VERDICT r16 #3), and assembles
# the round's BENCH_r{N}_sf10.json with a family-growth diff against
# the prior round's report — re-running regressed families once in
# isolation so tools/adjudicate.py can call variance vs plan-shift
# (VERDICT r16 #4).
#
# Usage: tools/run_sf10.sh <round> [prior_report]
#   e.g. tools/run_sf10.sh 17 BENCH_r16_sf10.json
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

# reclaim stale artifact trees up front (regenerated/retired corpora:
# the fingerprint key already makes them unreachable, this frees the
# disk — each sf10 gate build leaves tens of GB of parquet candidates)
java $JAVA_FLAGS -cp "$CP" graft.IndexTool sweep

# NOTE: Bench's LAST stdout line is a compact top-30 summary; the full
# per-query capture is written to bench_out.json — copy THAT (the
# subset loses queries past the compact line's top-30 cap).
#
# The heavy index artifacts are build-once and fingerprint-keyed; wipe
# them before EACH capture (via IndexStore, VERDICT r16 #6 — not raw
# rm) so the first run of each artifact-backed family measures the COLD
# one-path build at BOTH decades — the same-path growth exponent the
# r14 verdict asked for — and every other run measures the pay-once
# read. r17 adds pqvec-/bm25-/ham- to the wipe set (VERDICT r16 #1+#7:
# without the wipe, cold_builds_sf1 reported a stale warm number and
# the pqvec decade exponent was unmeasurable).
WIPE_KINDS="ndgate- ndshard- ndshardreps- shingle- pqvec- bm25 ham-"
wipe() {
  java $JAVA_FLAGS -cp "$CP" graft.IndexTool wipe $WIPE_KINDS
  # first-touch assertion (VERDICT r16 #7): no matching artifact may
  # survive the wipe, or run[0] silently measures a warm read
  for k in $WIPE_KINDS; do
    if ls -d target/graft-index/${k}* >/dev/null 2>&1; then
      echo "FATAL: artifact ${k}* survived the wipe — cold builds would be stale" >&2
      exit 1
    fi
  done
}

wipe
echo "== sf1 subset capture =="
SPARK_GRAFT_SF_DIR=target/sf1 SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$SUBSET" \
  java $JAVA_FLAGS -cp "$CP" graft.Bench > /dev/null
cp bench_out.json /tmp/sf1_subset.json

wipe
echo "== sf10 subset capture =="
SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$SUBSET" \
  java $JAVA_FLAGS -cp "$CP" graft.Bench > /dev/null
cp bench_out.json /tmp/sf10_subset.json

echo "== isolated q_neardup_shard_reps sf10 pass (VERDICT r16 #3) =="
# outside the 44-query audit: its build embeds a second global gate
# over ~n representatives. The sharded-gate artifact it reads is
# already warm from the audit above, so this prices exactly the
# ESCALATION (reps + rep gate + cross verify); the nested ndshard cost
# is journaled separately if ever paid here.
java $JAVA_FLAGS -cp "$CP" graft.IndexTool wipe ndshardreps-
SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=24 \
  SPARK_GRAFT_ONLY="q_neardup_shard_reps" \
  java $JAVA_FLAGS -cp "$CP" graft.Bench > /dev/null
cp bench_out.json /tmp/sf10_shardreps.json

echo "== independent reference checks at sf10 =="
SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=24 \
  java $JAVA_FLAGS -cp "$CP" graft.RefCheck | tail -1 > /tmp/sf10_refcheck.json
cat /tmp/sf10_refcheck.json

NOTE="${SF10_NOTE:-44-query dedup/ANN/retrieval subset at target/sf10 (documents 500k, embeddings 200k, events 10M; cpus=24, 32g).}"
python3 tools/sf10_report.py /tmp/sf1_subset.json /tmp/sf10_subset.json \
  "$NOTE" "$OUT" /tmp/sf10_refcheck.json \
  --shardreps-sf10 /tmp/sf10_shardreps.json ${PRIOR:+--prior "$PRIOR"}

# automated variance-vs-plan-shift adjudication (VERDICT r16 #4): when
# a family's growth regressed vs the prior report, re-run its members
# once in isolation (warm artifacts, quiet JVM) and let adjudicate.py
# compare plan counters: identical plans + swinging walls = variance;
# moved counters = plan-shift.
REGR=$(python3 -c "import json,sys; d=json.load(open('$OUT')); print(','.join(d.get('regressed_queries', [])))")
if [ -n "$REGR" ]; then
  echo "== adjudication re-run: $REGR =="
  SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=24 SPARK_GRAFT_ONLY="$REGR" \
    java $JAVA_FLAGS -cp "$CP" graft.Bench > /dev/null
  cp bench_out.json /tmp/sf10_adjudicate.json
  python3 tools/adjudicate.py "$OUT" /tmp/sf10_adjudicate.json
fi
