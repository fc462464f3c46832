#!/usr/bin/env python3
"""Exact independent oracle for the embedding pair tier (q20/q32/q51) at
×10 scale, where the DuckDB brute oracles are list-lambda all-pairs scans
(200 M pairs × 64-dim zips at 20 k vectors — hours) but the same exact
semantics are a dense BLAS matmul (51 GFLOP — seconds).

Bit-exact mirror of the registered oracles' arithmetic:
  - quantize: e = round_half_up(float64(x) · 10⁴) as int64 (Spark `round`
    ties away from zero; numpy's banker's rounding would diverge on .5);
  - norm: n = sqrt(float64(Σ e²)); cosine = float64(dot) / (n_a·n_b) —
    dots ≤ 64·(a few·10⁴)² < 2⁵³ so float64 matmul dots are EXACT, and the
    single sqrt/division is correctly-rounded IEEE on every engine;
  - buckets (q32/q51): Σ_p [dot(e, plane_p) ≥ 0]·2^p with
    plane_p[j] = (first two md5("p:j") bytes, big-endian) − 32768 —
    the Ann.planeComponent family, recomputed here from its definition;
  - q51: connected components over the q32 pair set, min-id cluster label,
    keep = (vec_id == cluster_id), singletons keep themselves.

Float columns are compared for BIT equality against the Verify dump.

Usage: python3 tools/embcheck_x10.py <x10dir> <verify_outdir>
"""
import glob
import hashlib
import sys

import numpy as np
import pyarrow.parquet as pq

x10dir, outdir = sys.argv[1], sys.argv[2]

et = pq.read_table(f"{x10dir}/embeddings.parquet")
vec_ids = np.array(et.column("vec_id").to_pylist(), dtype=np.int64)
emb = np.array(et.column("embedding").to_pylist(), dtype=np.float32)
order = np.argsort(vec_ids)
vec_ids, emb = vec_ids[order], emb[order]
n, dim = emb.shape

# quantize with half-away-from-zero ties (Spark round / DuckDB round)
y = emb.astype(np.float64) * 10000.0
E = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
Ef = E.astype(np.float64)
norms = np.sqrt((Ef * Ef).sum(1))          # exact: Σe² < 2⁵³

planes = np.array([[(lambda h: ((h[0] << 8) | h[1]) - 32768)(
    hashlib.md5(f"{p}:{j}".encode()).digest()) for j in range(dim)]
    for p in range(4)], dtype=np.float64)
buckets = ((Ef @ planes.T >= 0).astype(np.int64)
           * (1 << np.arange(4, dtype=np.int64))).sum(1)

print(f"{n} vectors, dim {dim}, {len(set(buckets.tolist()))} buckets live")


def pairs_at(idx, tau):
    """(a_pos, b_pos, cosine) for vec_id-ordered positions idx, a < b, in
    blocks so the Gram matrix never exceeds ~1 GB."""
    out = []
    m = len(idx)
    B = 4096
    sub = Ef[idx]
    sn = norms[idx]
    for i0 in range(0, m, B):
        a = sub[i0:i0 + B]
        G = a @ sub.T                      # exact float64 dots
        cos = G / (sn[i0:i0 + B, None] * sn[None, :])
        ai, bi = np.nonzero(cos >= tau)
        keep = (ai + i0) < bi              # strict upper triangle, a < b
        out.append((idx[ai[keep] + i0], idx[bi[keep]],
                    cos[ai[keep], bi[keep]]))
    if not out:
        return (np.array([], dtype=np.int64),) * 2 + (np.array([]),)
    return tuple(np.concatenate(x) for x in zip(*out))


def load(name, cols):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    import pyarrow as pa
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return tuple(np.array(t.column(c).to_pylist()) for c in cols)


def report(name, got, want_cols):
    if got is None:
        print(f"{name}: MISSING spark result")
        return 1
    ok = (len(got[0]) == len(want_cols[0]) and
          all(np.array_equal(g, w) for g, w in zip(got, want_cols)))
    if ok:
        print(f"{name}: OK ({len(got[0])} rows)")
        return 0
    print(f"{name}: MISMATCH spark={len(got[0])} truth={len(want_cols[0])}")
    return 1


fails = 0

# ---- q20: all-pairs exact cosine >= 0.5 ----
a20, b20, c20 = pairs_at(np.arange(n), 0.5)
o = np.lexsort((b20, a20))
fails += report("q20_cosine_pairs",
                load("q20_cosine_pairs", ["vid_a", "vid_b", "cosine"]),
                (vec_ids[a20[o]], vec_ids[b20[o]], c20[o]))

# ---- q32: within-bucket pairs, cosine >= 0.3 ----
pa_, pb_, pc_ = [], [], []
for bkt in sorted(set(buckets.tolist())):
    idx = np.flatnonzero(buckets == bkt)
    if len(idx) < 2:
        continue
    x, yy, c = pairs_at(idx, 0.3)
    pa_.append(x); pb_.append(yy); pc_.append(c)
a32 = np.concatenate(pa_); b32 = np.concatenate(pb_); c32 = np.concatenate(pc_)
o = np.lexsort((b32, a32))
a32, b32, c32 = a32[o], b32[o], c32[o]
fails += report("q32_lsh_cosine_pairs",
                load("q32_lsh_cosine_pairs", ["vid_a", "vid_b", "cosine"]),
                (vec_ids[a32], vec_ids[b32], c32))

# ---- q51: connected components over the q32 pair set ----
parent = np.arange(n)
def find(x):
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x
for u, v in zip(a32, b32):
    ru, rv = find(u), find(v)
    if ru != rv:
        parent[max(ru, rv)] = min(ru, rv)
roots = np.array([find(i) for i in range(n)])
cluster = vec_ids[roots]
keep = vec_ids == cluster
fails += report("q51_embedding_clusters",
                load("q51_embedding_clusters", ["vec_id", "cluster_id", "keep"]),
                (vec_ids, cluster, keep))

sys.exit(1 if fails else 0)
