#!/usr/bin/env python3
"""×100 oracle for the near-dup CLUSTERING layer (round-14 VERDICT item 5).

The ScaleProbe leg `q49_clusters_x100` runs star-contraction connected
components + min-id survivorship (Dedup.nearDupClusters, threshold 0.8,
registered 32/16 geometry) over the full 500 k-doc corpus. Its pair layer
is exactly the `q15_dedup_neardup` leg (same family, same geometry, same
corpus), so the independent truth is plain union-find over that dump:

  component(doc) via union-find on (doc_a, doc_b) pairs,
  cluster_id(doc) = min doc_id of its component (singleton -> itself),
  keep(doc) = (doc_id == cluster_id).

Compared row-exactly for ALL docs in the corpus.

Usage: python3 tools/clustercheck_x100.py <x100dir> <probe_outdir>
"""
import glob
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def load(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/part-*.parquet"))
    assert files, f"{name}: no spark dump under {outdir}"
    return pa.concat_tables([pq.read_table(f) for f in files])


x100dir, outdir = sys.argv[1], sys.argv[2]

pairs = load(outdir, "q15_dedup_neardup")
got = load(outdir, "q49_clusters_x100")
all_ids = pq.read_table(f"{x100dir}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()

parent = {}


def find(x):
    root = x
    while parent.get(root, root) != root:
        root = parent[root]
    while parent.get(x, x) != x:  # path compression
        parent[x], x = root, parent[x]
    return root


def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        # union by min: the smaller id becomes the root, which makes the
        # root itself the min-id representative
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo


for a, b in zip(pairs.column("doc_a").to_pylist(),
                pairs.column("doc_b").to_pylist()):
    union(a, b)

truth = {d: find(d) for d in all_ids}

fails = 0
got_ids = got.column("doc_id").to_pylist()
got_cids = got.column("cluster_id").to_pylist()
got_keep = got.column("keep").to_pylist()
if sorted(got_ids) != sorted(all_ids):
    print(f"FAIL: clusters cover {len(got_ids)} docs, corpus has "
          f"{len(all_ids)}")
    fails += 1
bad = 0
for d, c, k in zip(got_ids, got_cids, got_keep):
    tc = truth[d]
    if c != tc or k != (d == tc):
        bad += 1
        if bad <= 5:
            print(f"MISMATCH doc {d}: got (cluster {c}, keep {k}), "
                  f"truth (cluster {tc}, keep {d == tc})")
if bad:
    print(f"FAIL: {bad} docs mis-clustered")
    fails += 1
else:
    n_clusters = len(set(truth.values()))
    n_dropped = sum(1 for d in all_ids if truth[d] != d)
    print(f"OK: {len(all_ids)} docs, {n_clusters} components, "
          f"{n_dropped} non-survivors — clusters + survivorship "
          "row-exact vs union-find")

sys.exit(1 if fails else 0)
