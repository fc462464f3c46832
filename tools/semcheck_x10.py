#!/usr/bin/env python3
"""Exact independent oracle for q115/q183 (semanticDedup) at ×10 scale.

At 50 k docs the registered DuckDB oracles are structurally infeasible: the
in-cluster pair count is ~n²/nlist (937 M pairs at nlist = 8 on the ×10
organic corpus; the dt CTE's bucket equi-join fans ~40× further), which no
duplicate-density choice can fix — it is the assignment geometry, not the
data. This checker recomputes the SAME exact semantics with numpy/BLAS,
where the per-cluster Gram matrix is a dense matmul (Σ n_l² · 64 · 2 ≈
tens of GFLOPs — seconds, not hours):

  - 64-dim token-hash count vectors: bucket = int(md5(tok)[:15 hex], 16) % 64
    summed per doc (the q115/q183 oracle's `cnt` CTE, bit-identical);
  - centroids = the first `nlist` docs by doc_id; assignment = argmin of the
    exact integer squared distance, ties to the smaller list_id;
  - dominated: db (da < db, same list) with dot²·tauDen² ≥ na²·nb²·tauNum².

Exactness: counts ≤ a few hundred, so dots ≤ 64·max_c² < 2⁵³ — float64
matmul is EXACT; the accept rule is evaluated in int64 (dot²·400 ≤ 1.3e16
< 2⁶³). The compare against the Verify parquet dump is row-exact.

Usage: python3 tools/semcheck_x10.py <x10dir> <verify_outdir> [q115_semantic_dedup:8] [q183_semantic_dedup_wide:64]
"""
import glob
import hashlib
import sys

import numpy as np
import pyarrow.parquet as pq

x10dir, outdir = sys.argv[1], sys.argv[2]
targets = [t.split(":") for t in (sys.argv[3:] or
           ["q115_semantic_dedup:8", "q183_semantic_dedup_wide:64"])]

t = pq.read_table(f"{x10dir}/documents.parquet")
doc_ids = np.array(t.column("doc_id").to_pylist(), dtype=np.int64)
texts = t.column("text").to_pylist()
order = np.argsort(doc_ids)
doc_ids, texts = doc_ids[order], [texts[i] for i in order]
n = len(doc_ids)

DIM = 64
bucket_cache = {}
V = np.zeros((n, DIM), dtype=np.int64)
for i, tx in enumerate(texts):
    for tok in tx.split(" "):
        b = bucket_cache.get(tok)
        if b is None:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % DIM
            bucket_cache[tok] = b
        V[i, b] += 1
print(f"vectors: {n} docs, {len(bucket_cache)} distinct tokens, "
      f"max count {V.max()}")

TAU_N, TAU_D = 19, 20
fails = 0
for name, nlist_s in targets:
    nlist = int(nlist_s)
    cents = V[:nlist].astype(np.float64)          # first nlist docs by doc_id
    Vf = V.astype(np.float64)
    # exact: all quantities < 2^53. Assignment and Gram are BLOCKED so the
    # same checker runs at ×100 (500 k docs × nlist 6400 would be a 26 GB
    # dense distance matrix unblocked) — blocking changes memory, not math.
    c2 = (cents * cents).sum(1)
    asg = np.empty(n, dtype=np.int64)
    for s0 in range(0, n, 20000):
        X = Vf[s0:s0 + 20000]
        d2 = (X * X).sum(1)[:, None] - 2.0 * X @ cents.T + c2[None, :]
        asg[s0:s0 + 20000] = np.argmin(d2, axis=1)  # ties -> smallest index
    n2 = (V.astype(np.int64) ** 2).sum(1)         # squared norms, int64
    dominated = np.zeros(n, dtype=bool)
    for l in range(min(nlist, n)):
        idx = np.flatnonzero(asg == l)
        m = len(idx)
        if m < 2:
            continue
        W = Vf[idx]
        w2 = n2[idx]
        hit = np.zeros(m, dtype=bool)
        blk = max(1, int(2e8 // max(m, 1)))       # ~1.6 GB float64 per block
        for r0 in range(0, m, blk):
            r1 = min(m, r0 + blk)
            dots = (W[r0:r1] @ W.T).astype(np.int64)   # exact in float64
            # accept: dot²·tauDen² >= na²·nb²·tauNum² — int64 (≤1.3e16)
            acc = (dots * dots * (TAU_D * TAU_D)
                   >= np.outer(w2[r0:r1], w2) * (TAU_N * TAU_N))
            # dominated = the LARGER doc_id of an accepted pair: column j
            # is hit when any row i (global position) < j accepts
            cols = np.arange(m)[None, :]
            rows_g = np.arange(r0, r1)[:, None]
            hit |= (acc & (cols > rows_g)).any(axis=0)
        dominated[idx[hit]] = True
    truth = {int(doc_ids[i]): (int(asg[i]), not bool(dominated[i]))
             for i in range(n)}

    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        print(f"{name}: MISSING spark result")
        fails += 1
        continue
    got = {}
    for f in files:
        for r in pq.read_table(f).to_pylist():
            got[int(r["doc_id"])] = (int(r["list_id"]), bool(r["is_kept"]))
    if got == truth:
        kept = sum(1 for _, k in truth.values() if k)
        print(f"{name}: OK ({len(truth)} rows, {kept} kept, nlist={nlist})")
    else:
        bad = [k for k in truth if got.get(k) != truth[k]][:5]
        print(f"{name}: MISMATCH rows={len(got)}/{len(truth)} first_bad={bad} "
              f"truth={[truth[b] for b in bad]} got={[got.get(b) for b in bad]}")
        fails += 1
sys.exit(1 if fails else 0)
