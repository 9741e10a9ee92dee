#!/usr/bin/env python3
"""Generate the sf10 SUBSET fixtures for the scale-geometry audit
(VERDICT r12 item 8).

One more decade above the r9 sf1 audit, for the tables the
dedup/ANN/retrieval families read: documents 50k -> 500k, embeddings
20k -> 200k, events 1M -> 10M. This is where the scale-aware
geometries actually move again:

  - ndBits(200k)  = 17 (bands 288)  vs sf1's 14 (192)
  - ivfCells(200k) = ceil(sqrt(200000)/3) = 150 vs sf1's 48
  - bm25DfCap(500k docs) = 5000 vs sf1's 500
  - PqTrainCap sampling at 2% vs sf1's 20%

Same measured generation rules as tools/gen_sf1.py (empirical resample
of the sf0.1 vocabulary/length/dup-rate for documents, seeded unit
Gaussians for embeddings, densified same-window arrivals for events).
The TPC-H-ish tables are COPIED from target/sf1 (check.py views every
table; the audited families never read them, and copying keeps the
fixture honest about what this decade actually tests).

Usage: python3 tools/gen_sf10.py [outDir=/root/repo/target/sf10]
Deterministic (seed 423). Requires target/sf1 (run tools/gen_sf1.py
first).
"""
import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SF1 = "/root/repo/target/sf1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf10"
DOCS, EMBS, EVT, USERS = 500_000, 200_000, 10_000_000, 150_000
SEED = 423

DAY_US = 86_400_000_000
EVT_LO = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EVT_SPAN_US = 30 * DAY_US  # the window does not scale with SF (measured)


def gen_documents(rng):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    texts = [r[0] for r in rows]
    words = [t.split() for t in texts]
    vocab, counts = np.unique(
        np.concatenate([np.array(w) for w in words]), return_counts=True)
    wfreq = counts / counts.sum()
    lens = np.array([len(w) for w in words])
    uniq = len(set(texts))
    dup_rate = (len(texts) - uniq) / len(texts)

    # vectorized: draw every fresh doc's length, then one big word pool
    doc_lens = lens[rng.integers(0, len(lens), DOCS)]
    pool = rng.choice(vocab, size=int(doc_lens.sum()), p=wfreq)
    offs = np.concatenate([[0], np.cumsum(doc_lens)])
    out_text = [" ".join(pool[offs[i]:offs[i + 1]]) for i in range(DOCS)]
    # plant the measured exact-duplicate rate
    for i in np.flatnonzero(rng.random(DOCS) < dup_rate):
        if i > 0:
            out_text[i] = out_text[rng.integers(0, i)]
    lang = rng.choice([r[1] for r in rows], size=DOCS)
    source = rng.choice([r[2] for r in rows], size=DOCS)
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
    return pa.table({
        "vec_id": pa.array(range(EMBS), pa.int64()),
        "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, EMBS), pa.int32()),
    })


def gen_events(rng):
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
    pq.write_table(gen_events(rng), f"{OUT}/events.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        dst = f"{OUT}/{t}.parquet"
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        shutil.copyfile(f"{SF1}/{t}.parquet", dst)
    print(f"sf10 subset fixtures at {OUT}: documents={DOCS} "
          f"embeddings={EMBS} events={EVT}")


if __name__ == "__main__":
    main()
