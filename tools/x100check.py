#!/usr/bin/env python3
"""×100 spot-check oracle for q15/q180 (round-13 VERDICT item 5).

The ×100 corpus (`synth_x10_organic.py <dir> 100`) is 100 bijectively
token-renamed domains with ZERO cross-domain token overlap, so every true
Jaccard-0.8 / cosine-0.8 pair is within-domain, and the full-corpus answer
restricted to a domain equals the single-domain answer (q180 runs
uncapped, so no bucket-cap coupling; q15's band buckets are domain-pure up
to 64-bit xxhash collisions, which this check would surface as a
mismatch). The checker therefore:

  1. asserts the FULL Spark output contains no cross-domain pair
     (precision of the construction claim);
  2. for sampled domains, recomputes the exact truth in DuckDB on that
     domain's 5,000-doc view — q15 via the aggregate-form shingle-overlap
     brute (the sweep_x10 rewrite, algebraically identical to the
     registered list_intersect oracle), q180 via its REGISTERED
     banding-reproduced oracle SQL (dumped by ScaleProbe) — and compares
     row-exactly.

Usage: python3 tools/x100check.py <x100dir> <probe_outdir> [domains]
       (default domains: 0,7,37,99)
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

x100dir, outdir = sys.argv[1], sys.argv[2]
domains = [int(d) for d in (sys.argv[3].split(",") if len(sys.argv) > 3
                            else ["0", "7", "37", "99"])]
OFF = 10_000_000

Q15_AGG = """WITH sh AS (SELECT doc_id, CASE WHEN len(s) >= 3
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
WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.8
ORDER BY 1, 2"""


def load(name):
    files = sorted(glob.glob(f"{outdir}/{name}/part-*.parquet"))
    assert files, f"{name}: no spark dump under {outdir}"
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files]).to_pylist()


fails = 0
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

for name, sql in (("q15_dedup_neardup", Q15_AGG),
                  # the knee-rule DEFAULT geometry at threshold 0.9
                  # (q187 / ScaleProbe leg q187_neardup_auto)
                  ("q187_neardup_auto", Q15_AGG.replace(">= 0.8", ">= 0.9")),
                  ("q180_cosine_join_lsh", oracle["q180_cosine_join_lsh"])):
    try:
        rows = load(name)
    except AssertionError:
        # A missing dump is a FAILURE unless the leg was explicitly
        # excluded (X100CHECK_SKIP=name1,name2 — set it to mirror a
        # SPARK_GRAFT_PROBE_ONLY partial probe run). Round-14 ADVICE: the
        # unconditional skip let a crashed/filtered leg pass vacuously.
        skips = {s.strip() for s in
                 os.environ.get("X100CHECK_SKIP", "").split(",") if s.strip()}
        if name in skips:
            print(f"{name}: no dump, explicitly excluded (X100CHECK_SKIP)")
        else:
            print(f"{name}: FAIL — no dump under {outdir} and not in "
                  f"X100CHECK_SKIP (did the ScaleProbe leg run?)")
            fails += 1
        continue
    ka, kb = ("doc_a", "doc_b")
    cross = [r for r in rows if r[ka] // OFF != r[kb] // OFF]
    if cross:
        print(f"{name}: FAIL — {len(cross)} cross-domain pairs, "
              f"first {cross[:3]}")
        fails += 1
        continue
    print(f"{name}: {len(rows)} pairs, all within-domain")
    for d in domains:
        lo, hi = d * OFF, d * OFF + OFF
        got = sorted((r[ka], r[kb],
                      tuple(v for k, v in sorted(r.items())
                            if k not in (ka, kb)))
                     for r in rows if lo <= r[ka] < hi)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{x100dir}/documents.parquet' WHERE doc_id >= {lo} "
            f"AND doc_id < {hi}")
        cols = [c[0] for c in con.execute(sql).description]
        truth = sorted((t[cols.index(ka)], t[cols.index(kb)],
                        tuple(v for c, v in sorted(zip(cols, t))
                              if c not in (ka, kb)))
                       for t in con.execute(sql).fetchall())
        con.close()
        if got == truth:
            print(f"  domain {d}: OK ({len(truth)} pairs)")
        else:
            only_g = [g for g in got if g not in truth][:3]
            only_t = [t for t in truth if t not in got][:3]
            print(f"  domain {d}: MISMATCH got={len(got)} truth={len(truth)}"
                  f" extra={only_g} missing={only_t}")
            fails += 1

sys.exit(1 if fails else 0)
