#!/usr/bin/env python3
"""×10 organic-density oracle sweep (round-12 VERDICT item 2): patch the
Verify dump's oracle_sql.json with AGGREGATE-FORM rewrites of the two
all-pairs-list_intersect oracles (q48/q49), then run the standard localcheck
compare.

The q48/q49 rewrite is algebraically identical — `st` is list_distinct, so a
gram equi-join count IS |A ∩ B| — but evaluates as one Σ df² hash join instead
of N²/2 list intersections, which is what makes the brute truth feasible at
50 k docs (the registered oracles are untouched; the driver still runs them
at sf0.01).

The q61/q97/q181 rewrite inserts a LOSSLESS char-histogram prefilter into the
length-banded levenshtein join: every edit operation changes the character
multiset difference D = Σ_c |n_a(c) − n_b(c)| by at most 2 (a substitution
moves two counts by one each; insert/delete moves one), so lev(a,b) ≥ D/2 and
`D ≤ 2·maxDist` keeps EVERY qualifying pair. The histogram is the 95 printable
ASCII counts (the inputs are regexp-cleaned to [ -~]); at ×10 the band join
holds ~4.7 M pairs of ~300-char strings, and the O(95) multiset bound prunes
the O(len²) DP to the true-pair neighborhood. Verified rewrite ≡ original on
sf0.1 (52/52 identical rows, 62 s → 17 s).

Usage: python3 tools/sweep_x10.py <x10dir> <verify_outdir>
"""
import json
import subprocess
import sys

x10dir, outdir = sys.argv[1], sys.argv[2]

SH = """sh AS (SELECT doc_id, CASE WHEN len(s) >= 3
         THEN list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2] for i in range(1, len(s)-1)])
         ELSE [text] END AS st
       FROM (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents)),
sz AS (SELECT doc_id, len(st) AS sz FROM sh),
g AS (SELECT doc_id, unnest(st) AS gram FROM sh),
it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       GROUP BY 1, 2)"""

Q48 = f"""WITH {SH}
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
  CAST(x.sz + y.sz - inter AS BIGINT) AS uni,
  CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) AS jaccard
FROM it JOIN sz x ON it.doc_a = x.doc_id JOIN sz y ON it.doc_b = y.doc_id
WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.5
ORDER BY 1, 2"""

Q49 = f"""WITH RECURSIVE {SH},
pr AS (SELECT doc_a AS u, doc_b AS v
       FROM it JOIN sz x ON it.doc_a = x.doc_id
               JOIN sz y ON it.doc_b = y.doc_id
       WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.8),
e AS (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
reach(s, t) AS (
  SELECT u, u FROM e
  UNION
  SELECT r.s, e.v FROM reach r JOIN e ON r.t = e.u),
cc AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s)
SELECT d.doc_id,
  coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
  (d.doc_id = coalesce(cc.cluster_id, d.doc_id)) AS keep
FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
ORDER BY d.doc_id"""

# lev(a,b) >= sum_c |n_a(c)-n_b(c)| / 2 — see module docstring
HIST = ("[length({t}) - length(replace({t}, chr(CAST(c AS INT)), '')) "
        "for c in range(32, 127)]")
DSUM = "list_sum(list_transform(list_zip({a}, {b}), z -> abs(z[1]-z[2])))"

Q61 = f"""WITH en AS (SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
            FROM documents WHERE lang = 'en'),
l AS (SELECT doc_id, t, length(t) AS len, {HIST.format(t='t')} AS h FROM en),
p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
      FROM l a JOIN l b
        ON a.doc_id < b.doc_id AND abs(a.len - b.len) <= 6
       AND {DSUM.format(a='a.h', b='b.h')} <= 12)
SELECT doc_a, doc_b, dist FROM p WHERE dist <= 6
ORDER BY 1, 2"""

Q181 = Q61  # same contract, brute oracle identical by construction

Q97 = f"""WITH en AS (SELECT doc_id,
              substr(regexp_replace(text, '[^ -~]', '', 'g'),
                     1, 40 + CAST(doc_id % 60 AS INT)) AS t
            FROM documents WHERE lang = 'en'),
l AS (SELECT doc_id, t, length(t) AS len, {HIST.format(t='t')} AS h FROM en),
r AS (SELECT doc_id + 1000000 AS doc_id, replace(t, 'a', 'q') AS t,
             length(t) AS len, {HIST.format(t="replace(t, 'a', 'q')")} AS h
      FROM en),
p AS (SELECT l.doc_id AS left_id, r.doc_id AS right_id,
             CAST(levenshtein(l.t, r.t) AS BIGINT) AS dist
      FROM l JOIN r ON abs(l.len - r.len) <= 4
       AND {DSUM.format(a='l.h', b='r.h')} <= 8)
SELECT left_id, right_id, dist FROM p WHERE dist <= 4
ORDER BY 1, 2"""

# q38's brute oracle is an all-pairs hamming cross join (1.25G pairs at
# 50 k docs). The rewrite adds a LOSSLESS pigeonhole band prefilter — the
# same theorem the Spark plan uses: hamming <= 3 < 4 bands forces at least
# one identical 15-bit band, so candidates-from-band-equality keep every
# qualifying pair; the final filter is the unchanged hamming predicate.
SUMS = ", ".join(f"sum(((h >> {j}) & 1)*2 - 1) AS s{j}" for j in range(60))
FP = " + ".join(f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END"
                for j in range(60))
BANDS = ", ".join(f"((simhash >> {15 * b}) & 32767) + {b * 100000}"
                  for b in range(4))
Q38 = f"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
h AS (SELECT doc_id, CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS h FROM tok),
s AS (SELECT doc_id, {SUMS} FROM h GROUP BY doc_id),
fp AS (SELECT doc_id, {FP} AS simhash FROM s),
bd AS (SELECT doc_id, unnest([{BANDS}]) AS bk FROM fp),
cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         FROM bd a JOIN bd b ON a.bk = b.bk AND a.doc_id < b.doc_id)
SELECT c.da AS doc_a, c.db AS doc_b,
  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM cand c JOIN fp x ON x.doc_id = c.da JOIN fp y ON y.doc_id = c.db
WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
ORDER BY 1, 2"""

# ---- q15/q101: reproduce the minhash BANDING itself (the q180 precedent) —
# same 60-bit rot-xor positional gram hashes, same Carter-Wegman family,
# per-band minima-TUPLE equality standing in for the xxhash64 band key
# (xxhash collisions can only ADD candidates the exact Jaccard verify then
# discards), exact textual-shingle verify at the threshold. The maxBucket
# = 1000 cap is asserted INERT below (max band-bucket size printed) so the
# uncapped SQL equals the capped plan.
P_CW = 2147483647
def _coefs(num):
    a, seq = 1103515245, []
    while len(seq) < 2 * num:
        if a > 1:
            seq.append(a)
        a = (a * 69069 + 1) & 0x7FFFFFFF
    return [(seq[2 * i] | 1, seq[2 * i + 1]) for i in range(num)]

def _rot60(h, s):
    if s == 0:
        return h
    lm = 1 << (60 - s)
    return f"(({h} % {lm}) * {1 << s} + ({h} // {lm}))"

def _banding_ctes(numh=32, bands=16):
    rows = numh // bands
    cw = _coefs(numh)
    mins = ", ".join(
        f"min((hx * {a} + {b}) % {P_CW}) AS m{i}" for i, (a, b) in enumerate(cw))
    structs = ",\n        ".join(
        "{'band': %d, %s}" % (b, ", ".join(
            f"'k{r}': m{b * rows + r}" for r in range(rows)))
        for b in range(bands))
    keyeq = " AND ".join(f"a.u.k{r} = b.u.k{r}" for r in range(rows))
    return f"""tk AS (SELECT doc_id, text, string_split(text, ' ') AS s FROM documents),
th AS (SELECT doc_id, text, len(s) AS n,
         [CAST('0x' || substr(md5(s[i]), 1, 15) AS BIGINT) for i in range(1, len(s)+1)] AS h
       FROM tk),
gr AS (SELECT doc_id, CASE WHEN n >= 3 THEN
         [xor(xor(h[i], {_rot60('h[i+1]', 7)}), {_rot60('h[i+2]', 14)}) for i in range(1, n-1)]
       ELSE [CAST('0x' || substr(md5(text), 1, 15) AS BIGINT)] END AS grams
       FROM th),
hxr AS (SELECT doc_id, unnest(grams) % {P_CW} AS hx FROM gr),
sg AS (SELECT doc_id, {mins} FROM hxr GROUP BY doc_id),
bd AS (SELECT doc_id, unnest([{structs}]) AS u FROM sg)""", keyeq

_B, _KEQ = _banding_ctes()
_VER = """vg AS (SELECT doc_id, unnest(st) AS gram FROM sh),
vit AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
       FROM cand c JOIN vg x ON x.doc_id = c.doc_a
                   JOIN vg y ON y.doc_id = c.doc_b AND y.gram = x.gram
       GROUP BY 1, 2),
vsz AS (SELECT doc_id, len(st) AS sz FROM sh)"""

Q15 = f"""WITH {_B},
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bd a JOIN bd b
           ON a.u.band = b.u.band AND {_KEQ} AND a.doc_id < b.doc_id),
{SH},
{_VER}
SELECT vit.doc_a, vit.doc_b, CAST(inter AS BIGINT) AS inter,
  CAST(x.sz + y.sz - inter AS BIGINT) AS uni,
  CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) AS jaccard
FROM vit JOIN vsz x ON vit.doc_a = x.doc_id JOIN vsz y ON vit.doc_b = y.doc_id
WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.8
ORDER BY 1, 2"""

Q101 = f"""WITH {_B},
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bd a JOIN bd b
           ON a.u.band = b.u.band AND {_KEQ}
          AND a.doc_id % 5 = 0 AND b.doc_id % 5 != 0),
{SH},
{_VER}
SELECT vit.doc_a AS batch_id, vit.doc_b AS corpus_id,
  CAST(inter AS BIGINT) AS inter,
  CAST(x.sz + y.sz - inter AS BIGINT) AS uni,
  CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) AS jaccard
FROM vit JOIN vsz x ON vit.doc_a = x.doc_id JOIN vsz y ON vit.doc_b = y.doc_id
WHERE CAST(inter AS DOUBLE) / (x.sz + y.sz - inter) >= 0.8
ORDER BY 1, 2"""

BUCKET_MAX = f"""WITH {_B}
SELECT max(c) FROM (SELECT count(*) AS c FROM bd GROUP BY u) t"""

p = f"{outdir}/oracle_sql.json"
oracle = json.load(open(p))
oracle["q48_jaccard_join"] = Q48
oracle["q49_neardup_clusters"] = Q49
oracle["q61_edit_neardup"] = Q61
oracle["q181_edit_neardup_seg"] = Q181
oracle["q97_entity_link"] = Q97
oracle["q38_simhash_banded"] = Q38
oracle["q15_dedup_neardup"] = Q15
oracle["q101_neardup_delta"] = Q101
# Verify dumps the FULL oracle map even under SPARK_GRAFT_ONLY; restrict the
# compare to the queries that were actually run (result dir present), so the
# sweep reports N/N over its own scope instead of MISSING rows for the rest.
import os
oracle = {k: v for k, v in oracle.items()
          if os.path.isdir(os.path.join(outdir, k))}
# semanticDedup's in-cluster pair count is ~n²/nlist — structurally out of
# DuckDB's reach at 50 k docs regardless of duplicate density (937 M pairs at
# nlist=8). tools/semcheck_x10.py recomputes the same exact integer semantics
# with numpy/BLAS instead; run it on the same Verify dump.
for k in ("q115_semantic_dedup", "q183_semantic_dedup_wide"):
    oracle.pop(k, None)
json.dump(oracle, open(p, "w"))
if {"q15_dedup_neardup", "q101_neardup_delta"} & set(oracle):
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{x10dir}/documents.parquet'")
    mx = con.execute(BUCKET_MAX).fetchone()[0]
    print(f"max band-bucket size = {mx} (cap 1000 must be inert)")
    assert mx < 1000, "maxBucket cap is LIVE on this corpus — the uncapped " \
        "banding oracle no longer equals the capped plan; shrink the corpus"
print(f"patched q48/q49 (aggregate-form) + q61/q97/q181 "
      f"(histogram-prefiltered) + q38 (pigeonhole-banded) + q15/q101 "
      f"(banding-reproduced) brute oracles; scope = {sorted(oracle)}")
sys.exit(subprocess.call(
    [sys.executable, "tools/localcheck.py", x10dir, outdir]))
