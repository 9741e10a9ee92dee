#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r05.json vs a local run).

Usage: python3 tools/bench_diff.py [old.json] <new.json> [ratio_flag]

With a single file argument the old side defaults to BENCH_r06.json (the
operative baseline pinned in BASELINE.md).

Prints per-query deltas for queries present in both files, sorted by
ratio, and flags regressions above `ratio_flag` (default 1.3) when the
absolute cost is large enough to matter (>0.2 s). Strips an sbt "[info] "
prefix if present, so raw captured output works directly.
"""
import json
import sys


PLAN_METRIC_RE = (r'"(q_\w+)":\{"scan_rows":(\d+),'
                  r'"shuffle_records":(\d+),"shuffle_bytes":(\d+)\}')


def load(path):
    """Accept either Bench's own one-line JSON (possibly sbt-prefixed) or
    the driver's BENCH_r{N}.json wrapper, whose `tail` embeds
    `"name":[run1,run2]` timing fragments (best-of-n semantics: take min)
    and, when the tail window reaches them, per-query plan_metrics
    fragments."""
    import re
    text = open(path).read()
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    try:
        wrapper = json.loads(text)
    except json.JSONDecodeError:
        raise SystemExit(f"no bench JSON found in {path}")
    tail = wrapper.get("tail", "")
    queries = {
        name: min(float(x) for x in runs.split(","))
        for name, runs in re.findall(r'"(q_\w+)":\[([\d.,]+)\]', tail)
    }
    plan_metrics = {
        name: {"scan_rows": int(sr), "shuffle_records": int(rec),
               "shuffle_bytes": int(sb)}
        for name, sr, rec, sb in re.findall(PLAN_METRIC_RE, tail)
    }
    if not queries and not plan_metrics:
        raise SystemExit(f"no per-query runs found in {path}")
    return {"queries": queries, "plan_metrics": plan_metrics}


def diff_plan_metrics(old, new, flag):
    """Plan-shape drift gate (VERDICT r7 #5): plan metrics are
    deterministic (records/bytes through each exchange, rows scanned),
    so unlike wall-clock they admit a hard threshold. Flags any common
    query whose shuffle_bytes grew more than `flag`x at equal sf, once
    past a 64 KiB floor that ignores constant-overhead jitter (empty
    exchanges, map-status framing) on queries that shuffle almost
    nothing."""
    opm = old.get("plan_metrics") or {}
    npm = new.get("plan_metrics") or {}
    common = sorted(set(opm) & set(npm))
    if not common:
        print("\nplan metrics: not present on both sides, drift gate "
              "skipped")
        return 0
    floor = 64 * 1024
    regressions = 0
    rows = []
    for k in common:
        o, n = opm[k]["shuffle_bytes"], npm[k]["shuffle_bytes"]
        ratio = n / o if o > 0 else (float("inf") if n > floor else 1.0)
        if ratio > flag and n > floor:
            rows.append((ratio, k, o, n))
            regressions += 1
    print(f"\nplan metrics: {len(common)} queries compared, "
          f"{regressions} shuffle_bytes regression(s) above {flag}x")
    for ratio, k, o, n in sorted(rows, reverse=True):
        print(f"{k:34s} {o:>12d} {n:>12d} {ratio:7.2f}"
              "  <-- PLAN REGRESSION (shuffle_bytes)")
    return regressions


def main():
    import os

    def is_float(s):
        try:
            float(s)
            return True
        except ValueError:
            return False

    args = sys.argv[1:]
    # Shift to the default baseline ONLY when the extra argument is a
    # ratio flag — a typoed second file path must report file-not-found,
    # not be misread as a ratio (ADVICE r6).
    if len(args) == 1 or (len(args) == 2 and is_float(args[1])):
        default_old = os.path.join(os.path.dirname(__file__), "..",
                                   "BENCH_r06.json")
        args = [default_old] + args
    for p in args[:2]:
        if not os.path.exists(p):
            raise SystemExit(f"bench file not found: {p}")
    old, new = load(args[0]), load(args[1])
    flag = float(args[2]) if len(args) > 2 else 1.3
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    rows = [(nq[k] / oq[k] if oq[k] > 0 else float("inf"), k, oq[k], nq[k])
            for k in common]
    rows.sort(reverse=True)
    regressions = 0
    opm = old.get("plan_metrics") or {}
    npm = new.get("plan_metrics") or {}
    print(f"{'query':34s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for ratio, k, o, n in rows:
        mark = ""
        if ratio > flag and n > 0.2:
            mark = "  <-- REGRESSION"
            regressions += 1
        # The q_winsorize class (VERDICT r11): wall >2x while the
        # deterministic plan metrics are IDENTICAL means the slowdown
        # has no plan-shape explanation (environment, memory pressure,
        # a driver-side stall) — machine-caught, hard fail, regardless
        # of the wall-clock flag the caller chose.
        if (ratio > 2.0 and n > 0.5 and k in opm and k in npm
                and opm[k] == npm[k]):
            if "REGRESSION" not in mark:
                regressions += 1
            mark += "  (UNEXPLAINED: plan metrics unchanged)"
        print(f"{k:34s} {o:8.3f} {n:8.3f} {ratio:7.2f}{mark}")
    ot = sum(oq[k] for k in common)
    nt = sum(nq[k] for k in common)
    if common:
        print(f"\ncommon queries: {len(common)}  old total {ot:.1f}s  "
              f"new total {nt:.1f}s  ratio {nt / ot:.2f}")
    print(f"only-old: {sorted(set(oq) - set(nq))}")
    print(f"only-new: {len(set(nq) - set(oq))} new queries")
    # Plan drift uses a 1.5x threshold regardless of the wall-clock flag:
    # metrics are deterministic, so the flag needs no noise margin.
    regressions += diff_plan_metrics(old, new, 1.5)
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
