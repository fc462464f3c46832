#!/usr/bin/env python3
"""Realistic-vocabulary corpus for the set-similarity SELECTIVITY demo
(round-13 VERDICT item 3).

The driver testdata's documents draw on a 31-word vocabulary, so every
doc's token SET is nearly the full vocabulary and token-set minhash has no
selectivity: band buckets degenerate toward all-pairs and the q180
prescreen prunes nothing (documented in IMPLEMENTATION.md round-12 leg 8).
That is a property of the corpus, not the algorithm — this script builds
the corpus shape real text has, so the selectivity CLAIM of the LSH tier
can be measured instead of asserted:

- 50,000 word types, Zipf(s=1.07) frequency law (the classic fit for
  natural language), words "w0".."w49999";
- 20,000 base documents, lengths uniform 30..130 tokens (testdata-like);
- 10% planted near-duplicates: a copy of a random base doc with ~8% of
  positions re-sampled from the vocabulary — token-set Jaccard and
  tf-cosine stay high (>= ~0.8), everything else is unrelated with only
  stop-word-grade overlap.

Deterministic (fixed seed). Output schema matches documents.parquet so
registered queries run against it unmodified.

Usage: python3 tools/synth_zipf.py [outdir]   (default /tmp/testdata_zipf)
"""
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_zipf"
os.makedirs(out, exist_ok=True)

V = 50_000
N_BASE = 20_000
DUP_FRAC = 0.10
MUT = 0.08
rng = np.random.default_rng(13)

# Zipf over a FIXED vocabulary size: p(r) ~ 1/r^s, r = 1..V
s = 1.07
p = 1.0 / np.arange(1, V + 1) ** s
p /= p.sum()

ids, txts = [], []
base_tokens = []
for i in range(N_BASE):
    ln = int(rng.integers(30, 131))
    toks = rng.choice(V, size=ln, p=p)
    base_tokens.append(toks)
    ids.append(i)
    txts.append(" ".join(f"w{t}" for t in toks))

n_dup = int(N_BASE * DUP_FRAC)
pick = rng.choice(N_BASE, size=n_dup, replace=False)
for j, src in enumerate(pick):
    toks = base_tokens[src].copy()
    nmut = max(1, int(len(toks) * MUT))
    pos = rng.choice(len(toks), size=nmut, replace=False)
    toks[pos] = rng.choice(V, size=nmut, p=p)
    ids.append(1_000_000 + j)
    txts.append(" ".join(f"w{t}" for t in toks))

langs = ["en"] * len(ids)
srcs = ["zipf"] * len(ids)
t = pa.table({
    "doc_id": pa.array(ids, pa.int64()),
    "text": pa.array(txts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(srcs, pa.string()),
    "n_chars": pa.array([len(x) for x in txts], pa.int64()),
})
pq.write_table(t, f"{out}/documents.parquet")
types = len(set(w for x in txts for w in x.split()))
print(f"wrote {out}/documents.parquet: {t.num_rows} rows, "
      f"{types} realized word types, {n_dup} planted near-dups")
