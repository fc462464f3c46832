#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load Verify output parquet,
run each oracle SQL in DuckDB over the same sf dir, compare rows/schema/values.
Usage: python3 tools/localcheck.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd


def _norm_type(t):
    """Normalize arrow-representation artifacts that the driver's hash is
    known to tolerate (duckdb emits large_string where pyarrow-parquet reads
    string). Everything else must match EXACTLY: the two-round q42 failure
    was duckdb sum() OVER returning decimal128(38,0) vs spark int64 with
    bit-identical values -- a dtype-blind value compare cannot see it."""
    if pa.types.is_large_string(t):
        return pa.string()
    if pa.types.is_large_binary(t):
        return pa.binary()
    if pa.types.is_dictionary(t):
        return _norm_type(t.value_type)
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return pa.list_(_norm_type(t.value_type))
    return t

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark result"); fail += 1; continue
    spark_tbl = pa.concat_tables([pq.read_table(f) for f in files])
    spark_df = spark_tbl.to_pandas()
    try:
        duck_tbl = con.execute(sql).arrow()
        duck_df = duck_tbl.to_pandas()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}"); fail += 1; continue
    dtype_bad = []
    for c in sorted(set(spark_tbl.schema.names) & set(duck_tbl.schema.names)):
        st = _norm_type(spark_tbl.schema.field(c).type)
        dt = _norm_type(duck_tbl.schema.field(c).type)
        if st != dt:
            dtype_bad.append(f"{c}: spark={st} duck={dt}")
    if dtype_bad:
        print(f"{name}: DTYPE {'; '.join(dtype_bad)}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"{name}: SCHEMA cols spark={list(s.columns)} duck={list(d.columns)}")
        fail += 1; continue
    if len(s) != len(d):
        print(f"{name}: ROWS spark={len(s)} duck={len(d)}"); fail += 1; continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    mismatch = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            same = (sv.values == dv.values) | (sv.isna().values & dv.isna().values)
        except Exception:
            same = sv.astype(str).values == dv.astype(str).values
        import numpy as np
        if not bool(np.all(same)):
            idx = int(np.argmin(same))
            mismatch = (c, idx, sv.iloc[idx], dv.iloc[idx]); break
    if mismatch:
        c, i, a, b = mismatch
        print(f"{name}: VALUE col={c} row={i} spark={a!r} duck={b!r}"); fail += 1
    else:
        print(f"{name}: OK ({len(s)} rows)"); ok += 1
print(f"== {ok} ok / {fail} fail / {len(oracle)} total")
sys.exit(1 if fail else 0)
