#!/usr/bin/env python3
"""Generate local sf1 fixtures for the scale audit (VERDICT r8 item 6).

The driver ships sf{0.001,0.01,0.1} only; the capped dedup/ANN paths
(stop-shingle df cap, hot-bucket cap, semantic-dedup cell bound) are
oracle-expressed but exercised only to sf0.1 by the official gate. This
script extrapolates the generator's OBSERVED distributions one decade
up — documents 5 000→50 000, embeddings 2 000→20 000 — so the subset
can run once at sf1 with its DuckDB oracles and a wall-clock growth
check (sub-quadratic: ≲12x wall for 10x data).

Fidelity notes (measured on /root/testdata/sf0.1):
- documents.text draws from a ~40-word vocabulary; per-doc word count
  and unigram frequencies are resampled EMPIRICALLY from sf0.1, so
  shingle collision density (what makes the caps bite) carries over;
  exact-duplicate rate matches (8 dup pairs / 5 000 docs).
- embeddings are unit-norm float32[64] with NO cluster structure
  (labels are uniform 0..9, max pairwise cosine in a 500-sample ≈0.6)
  — reproduced with a seeded RNG.
- The TPC-H-ish tables + events are generated at 10x sf0.1 from their
  MEASURED generation rules (all columns verified independent uniforms
  on sf0.1, plus the exact formulas below), so the FULL 164-query
  surface — not just the dedup/ANN subset — can run its oracle gate
  and a wall-clock growth audit at sf1:
  * keys are dense 0..N-1; names are `Customer#%09d` / `Supplier#%09d`;
    p_name is the 8x8 adjective-noun grid; p_retailprice is EXACTLY
    900 + (p_partkey % 1000)/10 (verified bit-equal on all 20k rows).
  * money columns are 2-dp uniforms; l_quantity integer 1..50;
    l_discount cents 0..10; l_tax cents 0..8; dates day-granular
    uniforms over the measured ranges (l_shipdate = an independent
    uniform orderdate + uniform(1..95) days — sf0.1 shows ship/own-
    order gaps of +-2400 days with mean 48, i.e. NOT the line's order).
  * events: 10x rows over the SAME 30-day window (densified arrivals,
    like the driver across sf0.01->sf0.1), user_id scaled 10x,
    event_id assigned in ts order (corr(id, ts) = 0.999995 measured),
    value ~ Exponential(mean 50) rounded to 2 dp, props = '{"k": N}'
    with N uniform 0..99.
  Per-order line counts come out Poisson(4) exactly as measured
  (600k independent uniform orderkey draws over 150k orders).

Usage: python3 tools/gen_sf1.py [outDir=/root/repo/target/sf1]
Deterministic (seed 421). Writes outside /root/testdata — the driver
fixtures stay untouched.
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
DOCS, EMBS = 50_000, 20_000
SEED = 421


def gen_documents(rng):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    texts = [r[0] for r in rows]
    langs = [r[1] for r in rows]
    sources = [r[2] for r in rows]
    words = [t.split() for t in texts]
    vocab, counts = np.unique(
        np.concatenate([np.array(w) for w in words]), return_counts=True)
    wfreq = counts / counts.sum()
    lens = np.array([len(w) for w in words])
    uniq = len(set(texts))
    dup_rate = (len(texts) - uniq) / len(texts)  # ~0.0016 at sf0.1

    out_text = []
    for i in range(DOCS):
        if out_text and rng.random() < dup_rate:
            out_text.append(out_text[rng.integers(0, len(out_text))])
        else:
            n = int(lens[rng.integers(0, len(lens))])
            out_text.append(" ".join(rng.choice(vocab, size=n, p=wfreq)))
    lang = rng.choice(langs, size=DOCS)      # empirical lang mix
    source = rng.choice(sources, size=DOCS)  # empirical source mix
    return pa.table({
        "doc_id": pa.array(range(DOCS), pa.int64()),
        "text": pa.array(out_text, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array([len(t) for t in out_text], pa.int64()),
    })


def gen_embeddings(rng):
    v = rng.standard_normal((EMBS, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pa.array(v.tolist(), pa.list_(pa.float32()))
    return pa.table({
        "vec_id": pa.array(range(EMBS), pa.int64()),
        "embedding": emb,
        "label": pa.array(rng.integers(0, 10, EMBS), pa.int32()),
    })


CUST, SUPP, PART, ORD, LINE, EVT, USERS = (
    150_000, 10_000, 200_000, 1_500_000, 6_000_000, 1_000_000, 15_000)

DAY_US = 86_400_000_000
ORDERDATE_LO = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
ORDERDATE_DAYS = 2404  # 1995-01-01 .. 2001-08-01 inclusive (measured)
EVT_LO = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EVT_SPAN_US = 30 * DAY_US  # 30-day window, identical across SFs (measured)


def money(rng, lo, hi, n):
    """2-dp uniform — every money column on sf0.1 is cent-exact."""
    return np.round(rng.uniform(lo, hi, n), 2)


def day_ts(rng, lo_us, days, n):
    """Uniform day-granular timestamps (dates are midnight on sf0.1)."""
    return (lo_us + rng.integers(0, days, n) * DAY_US).astype("datetime64[us]")


def gen_customer(rng):
    return pa.table({
        "c_custkey": pa.array(range(CUST), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(CUST)]),
        "c_nationkey": pa.array(rng.integers(0, 25, CUST), pa.int32()),
        "c_acctbal": pa.array(money(rng, -1000, 10000, CUST), pa.float64()),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
             "MACHINERY"], CUST)),
    })


def gen_supplier(rng):
    return pa.table({
        "s_suppkey": pa.array(range(SUPP), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(SUPP)]),
        "s_nationkey": pa.array(rng.integers(0, 25, SUPP), pa.int32()),
        "s_acctbal": pa.array(money(rng, -1000, 10000, SUPP), pa.float64()),
    })


def gen_part(rng):
    adj = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
    noun = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
            "widget"]
    keys = np.arange(PART)
    return pa.table({
        "p_partkey": pa.array(keys, pa.int64()),
        "p_name": pa.array([f"{rng.choice(adj)} {rng.choice(noun)}"
                            for _ in range(PART)]),
        "p_brand": pa.array([f"Brand#{b}"
                             for b in rng.integers(0, 25, PART)]),
        "p_type": pa.array(rng.choice(
            ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"],
            PART)),
        "p_size": pa.array(rng.integers(1, 51, PART), pa.int32()),
        # exact measured formula — bit-equal on all sf0.1 rows
        "p_retailprice": pa.array(900.0 + (keys % 1000) / 10.0,
                                  pa.float64()),
    })


def gen_orders(rng):
    return pa.table({
        "o_orderkey": pa.array(range(ORD), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, CUST, ORD), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["F", "O", "P"], ORD)),
        "o_totalprice": pa.array(money(rng, 1000, 500000, ORD),
                                 pa.float64()),
        "o_orderdate": pa.array(day_ts(rng, ORDERDATE_LO, ORDERDATE_DAYS,
                                       ORD), pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW"], ORD)),
    })


def gen_lineitem(rng):
    # l_shipdate: an INDEPENDENT uniform orderdate + 1..95 days (the
    # measured ship-vs-own-order gap spans +-2400 days, mean 48)
    ship = (ORDERDATE_LO
            + rng.integers(0, ORDERDATE_DAYS, LINE) * DAY_US
            + rng.integers(1, 96, LINE) * DAY_US).astype("datetime64[us]")
    return pa.table({
        "l_orderkey": pa.array(rng.integers(0, ORD, LINE), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, PART, LINE), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, SUPP, LINE), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, LINE), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, LINE).astype(float),
                               pa.float64()),
        "l_extendedprice": pa.array(money(rng, 900, 105000, LINE),
                                    pa.float64()),
        "l_discount": pa.array(rng.integers(0, 11, LINE) / 100.0,
                               pa.float64()),
        "l_tax": pa.array(rng.integers(0, 9, LINE) / 100.0, pa.float64()),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], LINE)),
        "l_linestatus": pa.array(rng.choice(["F", "O"], LINE)),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    })


def gen_events(rng):
    # 10x the arrivals over the SAME 30-day window (measured: the window
    # does not scale with SF); ids assigned in ts order like the driver
    ts = np.sort(rng.integers(0, EVT_SPAN_US, EVT)) + EVT_LO
    return pa.table({
        "event_id": pa.array(range(EVT), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, USERS, EVT), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "error", "purchase", "signup", "view"], EVT)),
        "value": pa.array(np.round(rng.exponential(50.0, EVT), 2),
                          pa.float64()),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.integers(0, 100, EVT)]),
    })


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(gen_documents(rng), f"{OUT}/documents.parquet")
    pq.write_table(gen_embeddings(rng), f"{OUT}/embeddings.parquet")
    import shutil
    for t in ["region", "nation"]:  # fixed-size dims: identical at sf1
        dst = f"{OUT}/{t}.parquet"
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    for name, gen in [("customer", gen_customer), ("supplier", gen_supplier),
                      ("part", gen_part), ("orders", gen_orders),
                      ("lineitem", gen_lineitem), ("events", gen_events)]:
        dst = f"{OUT}/{name}.parquet"
        if os.path.islink(dst):
            os.remove(dst)
        pq.write_table(gen(rng), dst)
    print(f"sf1 fixtures at {OUT}: documents={DOCS} embeddings={EMBS} "
          f"lineitem={LINE} orders={ORD} events={EVT}")


if __name__ == "__main__":
    main()
