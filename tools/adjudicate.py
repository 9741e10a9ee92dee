#!/usr/bin/env python3
"""Machine adjudication of flagged family regressions in the sf10
audit (VERDICT r16 #4 — the call the r16 round made by hand): given
the assembled report and an ISOLATED re-run capture of the regressed
families' members, decide per family between

  - "variance":   every member's plan counters (scan rows + shuffle
                  records exact, shuffle bytes within 1% — the Bench
                  noise gate's own equality) match the audit's, so the
                  wall movement is box scheduling noise (±20-60%
                  measured on this VM for shuffle-heavy queries);
  - "plan-shift": some member's counters MOVED — a real plan change;
                  the evidence names the query and both counter sets.

Writes the adjudication (+ per-member evidence: audit wall, isolated
wall, plan_same) back into the report's growth_diff_vs_prior entries.

Usage: python3 tools/adjudicate.py <BENCH_rN_sf10.json> <rerun_capture.json>
"""
import json
import sys


def plan_same(a, b):
    if not a or not b:
        return None
    if a.get("scan_rows", -1) < 0 or b.get("scan_rows", -1) < 0:
        return None
    return (a["scan_rows"] == b["scan_rows"]
            and a["shuffle_records"] == b["shuffle_records"]
            and abs(a["shuffle_bytes"] - b["shuffle_bytes"])
            <= max(a["shuffle_bytes"] // 100, 64))


def main():
    report_path = sys.argv[1]
    report = json.load(open(report_path))
    rerun = json.load(open(sys.argv[2]))
    rq = rerun.get("queries", {})
    rpm = rerun.get("plan_metrics", {})
    diff = report.get("growth_diff_vs_prior", {})
    for fam, d in diff.items():
        if not d.get("regressed"):
            continue
        members = report["families"][fam]["queries"]
        evidence = {}
        shifted = []
        for name, q in members.items():
            if name not in rq:
                continue
            same = plan_same(q.get("plan_sf10"), rpm.get(name))
            evidence[name] = {
                "audit_sf10": q.get("sf10"), "isolated_sf10": rq[name],
                "plan_same": same,
                "plan_audit": q.get("plan_sf10"),
                "plan_isolated": rpm.get(name),
            }
            if same is False:
                shifted.append(name)
        d["adjudication"] = "plan-shift" if shifted else "variance"
        d["adjudication_evidence"] = evidence
        if shifted:
            d["plan_shifted_queries"] = shifted
        print(f"{fam}: {d['adjudication']}"
              + (f" ({','.join(shifted)})" if shifted else ""))
    json.dump(report, open(report_path, "w"), indent=1)
    print(f"adjudications folded into {report_path}")


if __name__ == "__main__":
    main()
