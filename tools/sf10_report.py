#!/usr/bin/env python3
"""Assemble BENCH_r{N}_sf10.json: the sf1->sf10 growth audit for the
dedup/ANN/retrieval subset (VERDICT r12 item 8).

Inputs: two raw graft.Bench captures (bench_out.json format) taken with
the SAME SPARK_GRAFT_ONLY subset at target/sf1 and target/sf10, plus
the oracle check result for the tractable names. Emits per-query and
per-family growth; the audit passes when each family's growth exponent
is <= the sf0.1->sf1 exponent measured in BENCH_r12_sf1.json (the
scale-aware geometries must keep bending the curve DOWN, not up).

Cold builds are keyed BY ARTIFACT (VERDICT r16 #2): graft.Bench folds
the IndexStore builds journal into each capture as `artifact_builds`,
so a shared artifact's one-time cost is attributed to the artifact
that paid it — not to whichever consumer query ran first. The legacy
query-keyed first-run heuristic stays for continuity.

Usage:
  python3 tools/sf10_report.py <sf1_capture.json> <sf10_capture.json>
      <oracle_note> <out.json> [refcheck.json]
      [--prior BENCH_r{N-1}_sf10.json]
      [--shardreps-sf10 shardreps_capture.json]
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
    "q_neardup_shard_reps",
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


def artifact_builds(capture):
    """The journal-folded per-ARTIFACT build records — authoritative
    cold-build pricing (per-stage walls + notes + the query whose
    window paid the build), independent of run-index heuristics."""
    return capture.get("artifact_builds", {})


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {}
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--"):
            flags[a.lstrip("-")] = next(it)
    cap1 = json.load(open(args[0]))
    cap10 = json.load(open(args[1]))
    sf1 = cap1["queries"]
    sf10 = cap10["queries"]
    oracle_note = args[2]
    out = args[3] if len(args) > 3 else "BENCH_sf10.json"
    # optional: graft.RefCheck's one-line JSON (the independent plain-Scala
    # exact-equality checks for the oracle-blind families, VERDICT r13 #6)
    refcheck = json.load(open(args[4])) if len(args) > 4 else None
    # optional: a prior round's sf10 report to diff family growth against
    prior = json.load(open(flags["prior"])) if "prior" in flags else None
    # optional: the ISOLATED q_neardup_shard_reps capture at sf10
    # (VERDICT r17 #3 — measured outside the 44-query audit because its
    # build embeds a second global gate over ~n reps)
    shardreps = (json.load(open(flags["shardreps-sf10"]))
                 if "shardreps-sf10" in flags else None)
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
        "artifact_builds_sf1": artifact_builds(cap1),
        "artifact_builds_sf10": artifact_builds(cap10),
        "families": fam_rows,
    }
    if shardreps is not None:
        q = "q_neardup_shard_reps"
        doc["shard_reps_sf10"] = {
            "cold": (shardreps.get("runs", {}).get(q) or [None])[0],
            "warm": shardreps.get("queries", {}).get(q),
            "plan": shardreps.get("plan_metrics", {}).get(q),
            "artifact_builds": artifact_builds(shardreps),
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
        # the members of regressed families, for the runner's ISOLATED
        # adjudication re-run (VERDICT r16 #4; tools/adjudicate.py folds
        # the re-run back in as variance | plan-shift per family)
        doc["regressed_queries"] = sorted({
            n for fam, d in diff.items() if d["regressed"]
            for n in FAMILIES[fam] if n in sf1 and n in sf10})
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
    for tag in ("artifact_builds_sf1", "artifact_builds_sf10"):
        for name, b in doc[tag].items():
            print(f"  {tag}: {name} {b.get('build_secs')}s "
                  f"stages={b.get('stages')} notes={b.get('notes')} "
                  f"during={b.get('during_query')}")
    if doc.get("shard_reps_sf10"):
        print(f"  shard_reps_sf10: {doc['shard_reps_sf10']}")
    if doc.get("regressed_queries"):
        print(f"  REGRESSED (adjudication re-run needed): "
              f"{','.join(doc['regressed_queries'])}")


if __name__ == "__main__":
    main()
