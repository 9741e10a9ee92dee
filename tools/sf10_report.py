#!/usr/bin/env python3
"""Assemble BENCH_r13_sf10.json: the sf1->sf10 growth audit for the
dedup/ANN/retrieval subset (VERDICT r12 item 8).

Inputs: two raw graft.Bench captures (bench_out.json format) taken with
the SAME SPARK_GRAFT_ONLY subset at target/sf1 and target/sf10, plus
the oracle check result for the tractable names. Emits per-query and
per-family growth; the audit passes when each family's growth exponent
is <= the sf0.1->sf1 exponent measured in BENCH_r12_sf1.json (the
scale-aware geometries must keep bending the curve DOWN, not up).

Usage: python3 tools/sf10_report.py <sf1_capture.json> <sf10_capture.json>
           <oracle_note> [out=BENCH_r13_sf10.json]
"""
import json
import sys

FAMILIES = {
    "text_dedup": ["q_dedup_exact", "q_minhash_dedup", "q_minhash_est",
                   "q_simhash_dedup", "q_ngram_jaccard",
                   "q_ngram_containment", "q_neardup_capped",
                   "q_neardup_prune", "q_dedup_cluster", "q_cluster_rep",
                   "q_dedup_verdict", "q_chunk_dedup", "q_span_dedup",
                   "q_span_maxrep", "q_doc_fingerprint", "q_contamination",
                   "q_contam_ngram"],
    "lexical_retrieval": ["q_bm25", "q_lexical_health"],
    "hybrid_retrieval": ["q_hybrid_rrf", "q_hybrid_rrf_ann", "q_mmr_rerank"],
    "vector_ann": ["q_embed_quantize", "q_sim_topk", "q_sim_topk_int8",
                   "q_sim_hamming", "q_embed_neardup_lsh",
                   "q_neardup_gate_stats", "q_neardup_sharded",
                   "q_sim_ivf", "q_sim_lsh",
                   "q_sim_pq", "q_sim_ivfpq_res", "q_ann_recall",
                   "q_index_health", "q_probe_sweep", "q_semantic_dedup"],
    "events": ["q_funnel", "q_retention", "q_gap_fill", "q_session_window"],
    "text_analysis": ["q_token_count", "q_lang_id", "q_quality_score"],
}


# Queries whose first run can pay a fingerprint-keyed IndexStore build
# (ndgate/ndshard/pqvec/bm25/ham/semasg/shingle). Only these may appear
# in cold_builds: every query's first run also pays one-time JIT /
# codegen / page-cache warmup, and flagging that as a "cold artifact
# build" misattributes ordinary warmup to build cost (ADVICE r15).
ARTIFACT_QUERIES = {
    "q_embed_neardup_lsh", "q_neardup_gate_stats", "q_neardup_sharded",
    "q_sim_ivf", "q_sim_pq", "q_sim_ivfpq", "q_sim_ivfpq_res",
    "q_sim_ivfpq_rerank", "q_sim_hamming", "q_index_health",
    "q_probe_sweep", "q_ann_recall", "q_semantic_dedup",
    "q_semantic_dedup_seeded", "q_bm25", "q_lexical_health",
    "q_hybrid_rrf", "q_hybrid_rrf_ann", "q_mmr_rerank",
    "q_ngram_jaccard", "q_ngram_containment",
    "q_minhash_dedup", "q_minhash_est", "q_neardup_capped",
    "q_neardup_prune", "q_dedup_cluster", "q_cluster_rep",
    "q_dedup_verdict", "q_contam_ngram", "q_contamination",
}


def cold_builds(capture):
    """First-run artifact-build costs (r15): Bench reports min-of-runs,
    which hides a cold fingerprint-keyed build (ndgate/ndshard) paid on
    a query's FIRST run. Surface run[0] whenever it dwarfs the reported
    value — the 'paid once per corpus' number the audit must not lose.
    Restricted to the artifact-backed queries (ADVICE r15)."""
    runs = capture.get("runs", {})
    final = capture.get("queries", {})
    return {q: round(r[0], 2) for q, r in runs.items()
            if r and q in final and q in ARTIFACT_QUERIES
            and r[0] > 1.0 and r[0] > 3 * final[q]}


def main():
    cap1 = json.load(open(sys.argv[1]))
    cap10 = json.load(open(sys.argv[2]))
    sf1 = cap1["queries"]
    sf10 = cap10["queries"]
    oracle_note = sys.argv[3]
    out = sys.argv[4] if len(sys.argv) > 4 else "BENCH_r14_sf10.json"
    # optional: graft.RefCheck's one-line JSON (the independent plain-Scala
    # exact-equality checks for the oracle-blind families, VERDICT r13 #6)
    refcheck = json.load(open(sys.argv[5])) if len(sys.argv) > 5 else None
    # optional: a prior round's sf10 report to diff family growth against
    prior = json.load(open(sys.argv[6])) if len(sys.argv) > 6 else None
    # carry the deterministic plan counters per query at BOTH decades
    # (VERDICT r15 #3: without them, a flagged family regression cannot
    # be adjudicated between box variance — ±20-60% measured on this VM
    # for shuffle-heavy queries — and a real plan shift)
    pm1 = cap1.get("plan_metrics", {})
    pm10 = cap10.get("plan_metrics", {})
    fam_rows = {}
    for fam, names in FAMILIES.items():
        a = sum(sf1[n] for n in names if n in sf1 and n in sf10)
        b = sum(sf10[n] for n in names if n in sf1 and n in sf10)
        fam_rows[fam] = {
            "sf1_secs": round(a, 3), "sf10_secs": round(b, 3),
            "growth_10x_data": round(b / a, 2) if a else None,
            "queries": {n: {"sf1": sf1.get(n), "sf10": sf10.get(n),
                            "growth": (round(sf10[n] / sf1[n], 2)
                                       if n in sf1 and n in sf10 and sf1[n]
                                       else None),
                            "plan_sf1": pm1.get(n), "plan_sf10": pm10.get(n)}
                        for n in names},
        }
    total1 = sum(v["sf1_secs"] for v in fam_rows.values())
    total10 = sum(v["sf10_secs"] for v in fam_rows.values())
    doc = {
        "metric": "sf10_subset_audit",
        "unit": "sec",
        "note": oracle_note,
        "sf1_total": round(total1, 2),
        "sf10_total": round(total10, 2),
        "growth_10x_data": round(total10 / total1, 2),
        "cold_builds_sf1": cold_builds(cap1),
        "cold_builds_sf10": cold_builds(cap10),
        "families": fam_rows,
    }
    if refcheck is not None:
        doc["refcheck"] = refcheck.get("refcheck", refcheck)
    if prior is not None:
        diff = {}
        for fam, v in fam_rows.items():
            pg = prior.get("families", {}).get(fam, {}).get("growth_10x_data")
            diff[fam] = {"prior_growth": pg, "growth": v["growth_10x_data"],
                         "regressed": (pg is not None
                                       and v["growth_10x_data"] is not None
                                       and v["growth_10x_data"] > pg * 1.15)}
        doc["growth_diff_vs_prior"] = diff
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: total {total1:.1f}s -> {total10:.1f}s "
          f"({total10 / total1:.2f}x for 10x data)")
    for fam, v in fam_rows.items():
        prior_note = ""
        if prior is not None:
            pg = prior.get("families", {}).get(fam, {}).get("growth_10x_data")
            prior_note = f"  [prior {pg}x]"
        print(f"  {fam:20s} {v['sf1_secs']:8.2f}s -> {v['sf10_secs']:8.2f}s"
              f"  ({v['growth_10x_data']}x){prior_note}")
    if refcheck is not None:
        for name, r in doc["refcheck"].items():
            print(f"  refcheck {name}: match={r.get('match')}")
    for tag in ("cold_builds_sf1", "cold_builds_sf10"):
        if doc[tag]:
            print(f"  {tag}: {doc[tag]}")


if __name__ == "__main__":
    main()
