#!/usr/bin/env python3
"""×10 ORGANIC-density scale corpus for the pair-similarity oracle sweep
(round-12 VERDICT item 2).

Construction: 10 domains, each a BIJECTIVE per-domain token renaming of the
sf0.1 documents table — domain 0 is the original, domain k (1-9) appends the
digit k to every whitespace token and offsets doc_id by k·10⁷ (≡ 0 mod 5, so
the q102/q180 doc_id % 5 subsets scale uniformly). A bijective renaming
preserves every within-domain similarity EXACTLY (token-set Jaccard, tf-vector
cosine, cluster structure) while dropping cross-domain token overlap to zero —
the heaviest possible mutation that keeps duplication density sf0.1-like:
true pair counts grow ×10 (linearly), never ×100, so the brute-force DuckDB
oracles stay feasible. Char-level distances (q61/q97/q181) shift slightly
(+1 char per token on domains 1-9) — the oracle recomputes truth on the new
text, so that is fine; cross-domain pairs differ in every token and never
pass a maxDist ≤ 6 gate at these lengths.

The vocabulary is 31 ASCII words with no digits, so the digit suffix is
collision-free (no renamed token ever equals another domain's token).

×100 (round-13 VERDICT item 5): pass a factor as the second argument —
the construction generalizes verbatim (the vocabulary has no digits, so
multi-digit suffixes stay bijective and cross-domain-disjoint: a collision
orig_a+"1" == orig_b+"12" would force orig_a to contain a digit). doc_id
offsets k·10⁷ stay ≡ 0 (mod 5) and below 10⁹ for k ≤ 99. Factors beyond
10 write the DOCUMENTS table only: the embeddings construction is a cyclic
shift of 64 dims (domain 64 would alias domain 0), and the pair-tier
spot-check targets (q15/q180/q183) read only documents.

Usage: python3 tools/synth_x10_organic.py [outdir] [factor]
       (default /tmp/testdata_x10org, 10)
"""
import sys
import os
import pyarrow as pa
import pyarrow.parquet as pq

src = "/root/testdata/sf0.1/documents.parquet"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_x10org"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
assert FACTOR <= 100, "doc_id offset k*10^7 requires k <= 99 (k < FACTOR)"
os.makedirs(out, exist_ok=True)

t = pq.read_table(src)
doc_id = t.column("doc_id").to_pylist()
text = t.column("text").to_pylist()
lang = t.column("lang").to_pylist()
source = t.column("source").to_pylist()

ids, txts, langs, srcs, nchars = [], [], [], [], []
for k in range(FACTOR):
    off = k * 10_000_000
    sfx = str(k) if k else ""
    for i, tx in enumerate(text):
        nt = tx if k == 0 else " ".join(w + sfx for w in tx.split(" "))
        ids.append(doc_id[i] + off)
        txts.append(nt)
        langs.append(lang[i])
        srcs.append(source[i])
        nchars.append(len(nt))

out_t = pa.table({
    "doc_id": pa.array(ids, pa.int64()),
    "text": pa.array(txts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(srcs, pa.string()),
    "n_chars": pa.array(nchars, pa.int64()),
})
pq.write_table(out_t, f"{out}/documents.parquet")
print(f"wrote {out}/documents.parquet: {out_t.num_rows} rows "
      f"({t.num_rows} × {FACTOR} domains)")

if FACTOR != 10:
    # documents-only mode: see the module docstring
    sys.exit(0)

# ---- embeddings: the same organic-density construction in vector space.
# Domain k applies a CYCLIC DIMENSION SHIFT by k (an orthogonal permutation:
# within-domain cosines/buckets recompute on identical geometry, so true
# within-domain pair counts grow exactly ×10), and offsets vec_id by k·10⁷.
# Cross-domain cosines of permuted near-isotropic vectors are ~N(0, 1/64) —
# the high-threshold joins see sf0.1-like density, never ×100 (and the
# oracle recomputes truth on the shifted vectors, so no assumption rides
# on that: it only keeps the pair-enumeration cost bounded).
esrc = "/root/testdata/sf0.1/embeddings.parquet"
et = pq.read_table(esrc)
vec_id = et.column("vec_id").to_pylist()
emb = et.column("embedding").to_pylist()
lab = et.column("label").to_pylist()
eids, eembs, elabs = [], [], []
for k in range(10):
    off = k * 10_000_000
    for i, v in enumerate(emb):
        eids.append(vec_id[i] + off)
        eembs.append(v[k:] + v[:k] if k else v)
        elabs.append(lab[i])
eout = pa.table({
    "vec_id": pa.array(eids, pa.int64()),
    "embedding": pa.array(eembs, pa.list_(pa.float32())),
    "label": pa.array(elabs, pa.int32()),
})
pq.write_table(eout, f"{out}/embeddings.parquet")
print(f"wrote {out}/embeddings.parquet: {eout.num_rows} rows "
      f"({et.num_rows} × 10 shifted domains)")

# ---- events: organic ×10 for the session/interval tier (q117). Copy k
# shifts every timestamp by k·(span + 1 day) and every user by k·10⁷ —
# copies occupy DISJOINT time ranges with copy-local users, so the
# session set and its overlap-pair set are the original's ×10 (time-
# translated, user-renamed) and the quadratic overlap density never
# grows. event_id offsets keep the ingest key unique.
import pyarrow.compute as pc
vt = pq.read_table("/root/testdata/sf0.1/events.parquet")
span_us = (pc.max(vt.column("ts")).cast(pa.int64()).as_py()
           - pc.min(vt.column("ts")).cast(pa.int64()).as_py()
           + 86_400_000_000)
parts = []
for k in range(10):
    p = vt
    if k:
        p = p.set_column(p.schema.get_field_index("ts"), "ts",
            pc.add(p.column("ts").cast(pa.int64()),
                   k * span_us).cast(pa.timestamp("us")))
        p = p.set_column(p.schema.get_field_index("user_id"), "user_id",
            pc.add(p.column("user_id"), k * 10_000_000))
        p = p.set_column(p.schema.get_field_index("event_id"), "event_id",
            pc.add(p.column("event_id"), k * 1_000_000_000))
    parts.append(p)
evt = pa.concat_tables(parts)
pq.write_table(evt, f"{out}/events.parquet")
print(f"wrote {out}/events.parquet: {evt.num_rows} rows "
      f"({vt.num_rows} × 10 time-shifted copies)")
