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

p = f"{outdir}/oracle_sql.json"
oracle = json.load(open(p))
oracle["q48_jaccard_join"] = Q48
oracle["q49_neardup_clusters"] = Q49
oracle["q61_edit_neardup"] = Q61
oracle["q181_edit_neardup_seg"] = Q181
oracle["q97_entity_link"] = Q97
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
print(f"patched q48/q49 (aggregate-form) + q61/q97/q181 "
      f"(histogram-prefiltered) brute oracles; scope = {sorted(oracle)}")
sys.exit(subprocess.call(
    [sys.executable, "tools/localcheck.py", x10dir, outdir]))
