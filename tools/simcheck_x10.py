#!/usr/bin/env python3
"""Exact independent oracle for q18 (simhash all-pairs, hamming <= 4) at
×10 scale, where the DuckDB brute oracle is a 1.25 G-pair nested-loop cross
join. numpy recomputes the identical semantics densely:

  - token hash: 60-bit '0x'||md5[:15] (the md5Long family);
  - fingerprint bit j set iff Σ_tokens(((h>>j)&1)·2−1) > 0, tokens counted
    WITH multiplicity — vectorized as (doc×vocab counts) @ (vocab×60 ±1);
  - all-pairs hamming via chunked xor + byte-popcount table (the corpus
    vocabulary is tiny, so the count matrix is docs × |vocab|).

Usage: python3 tools/simcheck_x10.py <x10dir> <verify_outdir> [maxDist]
"""
import glob
import hashlib
import sys

import numpy as np
import pyarrow.parquet as pq

x10dir, outdir = sys.argv[1], sys.argv[2]
max_dist = int(sys.argv[3]) if len(sys.argv) > 3 else 4

t = pq.read_table(f"{x10dir}/documents.parquet")
doc_ids = np.array(t.column("doc_id").to_pylist(), dtype=np.int64)
texts = t.column("text").to_pylist()
order = np.argsort(doc_ids)
doc_ids, texts = doc_ids[order], [texts[i] for i in order]
n = len(doc_ids)

vocab = {}
rows, cols, vals = [], [], []
for i, tx in enumerate(texts):
    cnt = {}
    for tok in tx.split(" "):
        cnt[tok] = cnt.get(tok, 0) + 1
    for tok, c in cnt.items():
        j = vocab.setdefault(tok, len(vocab))
        rows.append(i); cols.append(j); vals.append(c)
V = np.zeros((n, len(vocab)), dtype=np.int64)
V[rows, cols] = vals

sign = np.zeros((len(vocab), 60), dtype=np.int64)
for tok, j in vocab.items():
    h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
    sign[j] = [((h >> b) & 1) * 2 - 1 for b in range(60)]

sums = V @ sign                               # doc × 60 bit sums
fp = ((sums > 0).astype(np.uint64) << np.arange(60, dtype=np.uint64)).sum(1)
print(f"{n} docs, {len(vocab)} vocab, {len(set(fp.tolist()))} distinct fps")

POP = np.array([bin(x).count("1") for x in range(256)], dtype=np.uint8)
pa_, pb_, ph_ = [], [], []
B = 2048
for i0 in range(0, n, B):
    x = np.bitwise_xor(fp[i0:i0 + B, None], fp[None, :])
    ham = POP[x.view(np.uint8).reshape(x.shape + (8,))].sum(2).astype(np.int64)
    ai, bi = np.nonzero(ham <= max_dist)
    keep = (ai + i0) < bi
    pa_.append(ai[keep] + i0); pb_.append(bi[keep])
    ph_.append(ham[ai[keep], bi[keep]])
a = np.concatenate(pa_); b = np.concatenate(pb_); h = np.concatenate(ph_)
o = np.lexsort((b, a))
truth = (doc_ids[a[o]], doc_ids[b[o]], h[o])

files = sorted(glob.glob(f"{outdir}/q18_simhash_pairs/*.parquet"))
if not files:
    print("q18_simhash_pairs: MISSING spark result"); sys.exit(1)
import pyarrow as pa
sp = pa.concat_tables([pq.read_table(f) for f in files])
got = tuple(np.array(sp.column(c).to_pylist())
            for c in ("doc_a", "doc_b", "hamming"))
ok = (len(got[0]) == len(truth[0]) and
      all(np.array_equal(g, w) for g, w in zip(got, truth)))
print(f"q18_simhash_pairs: {'OK' if ok else 'MISMATCH'} "
      f"(spark {len(got[0])} rows, truth {len(truth[0])})")
sys.exit(0 if ok else 1)
