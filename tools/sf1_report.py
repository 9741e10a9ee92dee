#!/usr/bin/env python3
"""Assemble BENCH_r{N}_sf1.json: the sf0.1 -> sf1 full-surface growth
audit (the trend line VERDICT r14 #4 asked to restore). Inputs are two
raw graft.Bench captures (bench_out.json format) taken with the SAME
cpus at /root/testdata/sf0.1 and target/sf1.

Usage: python3 tools/sf1_report.py <sf0_1.json> <sf1.json> <note> <out>
"""
import json
import sys


def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    note = sys.argv[3]
    out = sys.argv[4]
    common = sorted(set(a) & set(b))
    t1 = sum(a[q] for q in common)
    t10 = sum(b[q] for q in common)
    doc = {
        "metric": "sf1_growth",
        "unit": "sec",
        "note": note,
        "sf0_1_total": round(t1, 2),
        "sf1_total": round(t10, 2),
        "growth_10x_data": round(t10 / t1, 2),
        "queries": {q: {"sf0_1": round(a[q], 4), "sf1": round(b[q], 4),
                        "growth": round(b[q] / a[q], 2) if a[q] else None}
                    for q in common},
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: sf0.1 {t1:.2f}s -> sf1 {t10:.2f}s "
          f"(x{t10 / t1:.2f} for 10x data, {len(common)} queries)")


if __name__ == "__main__":
    main()
