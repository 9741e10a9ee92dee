#!/usr/bin/env python3
"""Local pre-flight twin of the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB 1.0.0 against views over the sf parquet tables, and
compares with the Spark-written parquet in <verifyOutDir>/<name>/.

Comparison is deliberately strict — stricter than any plausible driver
hash: columns sorted by name, rows compared in emitted order (queries end
in a total ORDER BY), values exactly equal (floats bit-compared; datetimes
normalized to us).
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
            import datetime
            nonnull = df[c].dropna()
            if len(nonnull) and isinstance(nonnull.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # this DuckDB build defaults to 1 thread — the sf1 all-pairs oracle
    # is a >1h single-core grind but minutes with the box's cores
    con.execute(f"PRAGMA threads={os.cpu_count()}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    # Optional comma-separated name filter (same contract as
    # SPARK_GRAFT_ONLY on Verify/Bench) — lets a long gate run resume
    # from a failure without re-executing hours of already-green oracles.
    only = os.environ.get("CHECK_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        missing = names - set(oracles)
        if missing:
            # a typo'd name must not yield a green zero-query run
            print(f"CHECK_ONLY names not in oracle_sql.json: {sorted(missing)}")
            sys.exit(2)
        oracles = {k: v for k, v in oracles.items() if k in names}
    n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        # Skip-before-execute: on a SPARK_GRAFT_ONLY subset run the
        # other ~160 oracles have no spark output, and running their
        # SQL anyway costs minutes at sf1 — check the output first.
        pdir = f"{outdir}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            o = norm(con.execute(sql).fetch_df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s = norm(pd.read_parquet(pdir))
        problems = []
        if list(o.columns) != list(s.columns):
            problems.append(f"columns oracle={list(o.columns)} spark={list(s.columns)}")
        elif len(o) != len(s):
            problems.append(f"rows oracle={len(o)} spark={len(s)}")
        else:
            for c in o.columns:
                ov, sv = o[c].to_numpy(), s[c].to_numpy()
                if np.issubdtype(o[c].dtype, np.floating):
                    eq = (ov == sv) | (np.isnan(ov.astype(float)) & np.isnan(sv.astype(float)))
                else:
                    eq = (ov == sv) | (pd.isna(o[c]).to_numpy() & pd.isna(s[c]).to_numpy())
                if not eq.all():
                    i = int(np.argmin(eq))
                    problems.append(
                        f"col {c} ({o[c].dtype} vs {s[c].dtype}): first diff row {i}: "
                        f"oracle={ov[i]!r} spark={sv[i]!r} ({int((~eq).sum())} diffs)")
            for c in o.columns:
                if str(o[c].dtype) != str(s[c].dtype):
                    print(f"  note {name}.{c}: dtype oracle={o[c].dtype} spark={s[c].dtype}")
        if problems:
            n_fail += 1
            print(f"FAIL {name}")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"ok   {name} ({len(o)} rows)")
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} queries match")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
