#!/usr/bin/env python3
"""Round-over-round diff of the streaming soak captures (VERDICT r16
#5: batch has bench_diff.py + an in-run noise gate; the stream soak's
rates/state-sizes were eyeballed). Compares every scalar metric of two
BENCH_r*_stream.json files and flags anything >1.5x off its prior in
the BAD direction:

  - throughput metrics (*_per_sec)            bad when they FALL
  - cost/size metrics (*_bytes, *_secs, ...)  bad when they GROW
  - workload identities (rows, docs, queries, expected counts, k)
    must be EQUAL — a changed workload invalidates the comparison
    for that section (reported as workload-changed, not regressed)

Usage: python3 tools/stream_diff.py <prior.json> <current.json> [out.json]
Exit code 1 when any metric is flagged (CI-able).
"""
import json
import sys

THRESH = 1.5

# metric-name classification (suffix/substring match on the leaf key)
RATE_KEYS = ("_per_sec",)
COST_KEYS = ("_bytes", "_secs", "_files_before", "_files_after")
IDENTITY_KEYS = ("rows", "docs", "queries", "vecs", "edges", "k",
                 "expected", "state_keys")


def classify(key):
    if any(key.endswith(s) for s in RATE_KEYS):
        return "rate"
    if any(key.endswith(s) for s in COST_KEYS):
        return "cost"
    if key in IDENTITY_KEYS or key.endswith("_expected"):
        return "identity"
    # residual scalar outputs (pairs, labeled_docs, served_rows, ...):
    # deterministic results — compare for equality, flag on change
    return "identity"


def main():
    prior = json.load(open(sys.argv[1]))
    cur = json.load(open(sys.argv[2]))
    out = sys.argv[3] if len(sys.argv) > 3 else None
    flags, rows = [], {}
    for section, pv in prior.items():
        cv = cur.get(section)
        if not isinstance(pv, dict) or not isinstance(cv, dict):
            continue
        srow = {}
        for key, p in pv.items():
            c = cv.get(key)
            if not isinstance(p, (int, float)) or isinstance(p, bool):
                continue
            if not isinstance(c, (int, float)) or isinstance(c, bool):
                continue
            kind = classify(key)
            ratio = (c / p) if p else None
            entry = {"prior": p, "now": c, "ratio":
                     round(ratio, 3) if ratio is not None else None}
            bad = None
            if kind == "identity":
                if c != p:
                    bad = "workload-or-result-changed"
            elif ratio is None:
                bad = "prior-zero"
            elif kind == "rate" and ratio < 1 / THRESH:
                bad = "throughput-regressed"
            elif kind == "cost" and ratio > THRESH:
                bad = "cost-grew"
            if bad:
                entry["flag"] = bad
                flags.append(f"{section}.{key}: {bad} "
                             f"(prior {p}, now {c})")
            srow[key] = entry
        rows[section] = srow
    doc = {"metric": "stream_diff", "prior": sys.argv[1],
           "current": sys.argv[2], "threshold": THRESH,
           "flags": flags, "sections": rows}
    if out:
        json.dump(doc, open(out, "w"), indent=1)
    for fl in flags:
        print(f"FLAG {fl}")
    print(f"stream_diff: {len(flags)} flags across "
          f"{sum(len(r) for r in rows.values())} metrics"
          + (f" -> {out}" if out else ""))
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
