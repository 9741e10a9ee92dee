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
- The remaining tables are not part of the audited subset; symlink
  them from sf0.1 so loaders/oracle views resolve.

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


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    pq.write_table(gen_documents(rng), f"{OUT}/documents.parquet")
    pq.write_table(gen_embeddings(rng), f"{OUT}/embeddings.parquet")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"sf1 fixtures at {OUT}: documents={DOCS} embeddings={EMBS}")


if __name__ == "__main__":
    main()
