#!/usr/bin/env python3
"""x100 spot-check oracle for the EXACT pair tiers q48 (PPJoin Jaccard)
and q102 (Bayardo cosine) — round-14, closing the last unmeasured
expensive paths (both previously evidenced only at x10).

Same construction argument as x100check.py: the x100 corpus is 100
bijectively token-renamed domains with zero cross-domain token overlap,
so every qualifying pair is within-domain and the full-corpus answer
restricted to a domain equals the single-domain answer (both tiers are
EXACT — no cap/banding coupling at all). The checker:

  1. asserts the FULL Spark output contains no cross-domain pair;
  2. for sampled domains, recomputes the exact truth —
     q48 via the aggregate-form 3-gram-shingle brute in DuckDB at
     tau 0.5 (the sweep_x10 rewrite of the registered oracle),
     q102 via an exact numpy replica on the domain's doc_id%5==0 view:
     integer tf vectors (the domain vocabulary is small, so the count
     matrix is dense), dot = V @ V.T (float64-exact below 2^53, counts
     are hundreds), accept dot^2*tauDen^2 >= tauNum^2*na2*nb2 in int64,
     and the reported cosine replicated with the same IEEE ops Spark
     uses (double dot / sqrt(double na2 * double nb2)).

Usage: python3 tools/exactcheck_x100.py <x100dir> <probe_outdir> [domains]
"""
import glob
import sys

import duckdb
import numpy as np
import pyarrow.parquet as pq

x100dir, outdir = sys.argv[1], sys.argv[2]
domains = [int(d) for d in (sys.argv[3].split(",") if len(sys.argv) > 3
                            else ["0", "7", "37", "99"])]
OFF = 10_000_000

Q48_AGG = """WITH sh AS (SELECT doc_id, CASE WHEN len(s) >= 3
         THEN list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])
         ELSE [text] END AS st
       FROM (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents)),
sz AS (SELECT doc_id, len(st) AS sz FROM sh),
g AS (SELECT doc_id, unnest(st) AS gram FROM sh),
it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
  CAST(x.sz + y.sz - inter AS BIGINT) AS uni,
  CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) AS jaccard
FROM it JOIN sz x ON it.doc_a = x.doc_id JOIN sz y ON it.doc_b = y.doc_id
WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.5
ORDER BY 1, 2"""


def load(name):
    files = sorted(glob.glob(f"{outdir}/{name}/part-*.parquet"))
    assert files, f"{name}: no spark dump under {outdir}"
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pylist()


fails = 0

# ---- q48: exact Jaccard join ------------------------------------------
rows = load("q48_jaccard_join")
cross = [r for r in rows if r["doc_a"] // OFF != r["doc_b"] // OFF]
if cross:
    print(f"q48_jaccard_join: FAIL - {len(cross)} cross-domain pairs")
    fails += 1
else:
    print(f"q48_jaccard_join: {len(rows)} pairs, all within-domain")
    for d in domains:
        lo, hi = d * OFF, d * OFF + OFF
        got = sorted((r["doc_a"], r["doc_b"], r["inter"], r["uni"],
                      r["jaccard"]) for r in rows if lo <= r["doc_a"] < hi)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{x100dir}/documents.parquet' WHERE doc_id >= {lo} "
            f"AND doc_id < {hi}")
        truth = sorted(tuple(t) for t in con.execute(Q48_AGG).fetchall())
        con.close()
        if got == truth:
            print(f"  domain {d}: OK ({len(truth)} pairs)")
        else:
            only_g = [g for g in got if g not in truth][:3]
            only_t = [t for t in truth if t not in got][:3]
            print(f"  domain {d}: MISMATCH got={len(got)} "
                  f"truth={len(truth)} extra={only_g} missing={only_t}")
            fails += 1

# ---- q102: exact cosine join (numpy replica) --------------------------
rows = load("q102_cosine_join")
cross = [r for r in rows if r["doc_a"] // OFF != r["doc_b"] // OFF]
if cross:
    print(f"q102_cosine_join: FAIL - {len(cross)} cross-domain pairs")
    fails += 1
else:
    print(f"q102_cosine_join: {len(rows)} pairs, all within-domain")
    t = pq.read_table(f"{x100dir}/documents.parquet",
                      columns=["doc_id", "text"])
    all_ids = np.array(t.column("doc_id").to_pylist(), dtype=np.int64)
    all_texts = t.column("text").to_pylist()
    for d in domains:
        lo, hi = d * OFF, d * OFF + OFF
        sel = [(i_, x_) for i_, x_ in zip(all_ids, all_texts)
               if lo <= i_ < hi and i_ % 5 == 0]
        ids = np.array([i_ for i_, _ in sel], dtype=np.int64)
        texts = [x_ for _, x_ in sel]
        order = np.argsort(ids)
        ids, texts = ids[order], [texts[i_] for i_ in order]
        vocab = {}
        rws, cls, vls = [], [], []
        for i_, tx in enumerate(texts):
            cnt = {}
            for tok in tx.split(" "):
                cnt[tok] = cnt.get(tok, 0) + 1
            for tok, c in cnt.items():
                j = vocab.setdefault(tok, len(vocab))
                rws.append(i_); cls.append(j); vls.append(c)
        V = np.zeros((len(ids), len(vocab)), dtype=np.float64)
        V[rws, cls] = vls
        dot = V @ V.T                      # exact: entries << 2^53
        n2 = np.einsum("ij,ij->i", V, V)
        truth = []
        tN, tD = 4, 5
        ia, ib = np.triu_indices(len(ids), k=1)
        dd = dot[ia, ib].astype(np.int64)
        acc = dd * dd * (tD * tD) >= (tN * tN) * (
            n2[ia].astype(np.int64) * n2[ib].astype(np.int64))
        for k in np.nonzero(acc)[0]:
            a_, b_ = int(ia[k]), int(ib[k])
            dv = int(dd[k])
            na2, nb2 = int(n2[a_]), int(n2[b_])
            cos = float(dv) / np.sqrt(float(na2) * float(nb2))
            truth.append((int(ids[a_]), int(ids[b_]), dv, na2, nb2, cos))
        truth.sort()
        got = sorted((r["doc_a"], r["doc_b"], r["dot"], r["na2"],
                      r["nb2"], r["cosine"])
                     for r in rows if lo <= r["doc_a"] < hi)
        if got == truth:
            print(f"  domain {d}: OK ({len(truth)} pairs)")
        else:
            only_g = [g for g in got if g not in truth][:3]
            only_t = [t_ for t_ in truth if t_ not in got][:3]
            print(f"  domain {d}: MISMATCH got={len(got)} "
                  f"truth={len(truth)} extra={only_g} missing={only_t}")
            fails += 1

sys.exit(1 if fails else 0)
