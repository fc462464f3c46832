#!/bin/sh
# End-to-end ×10 organic-density oracle sweep (round 12): synthesize the
# corpus, run the Spark side for all 18 pair-similarity queries, then check
# every one against an independent oracle — DuckDB (with the lossless
# rewrites in sweep_x10.py) where the brute truth is join-feasible, numpy
# (sem/emb/simcheck) where it is structurally not. Takes ~1-1.5 h on 32
# cores; every stage prints its own N/N verdict.
set -e
X10=${1:-/tmp/testdata_x10org}
OUT=${2:-/tmp/vx10all}

python3 tools/synth_x10_organic.py "$X10"

SPARK_GRAFT_CPUS=16 SPARK_GRAFT_ONLY=q15_dedup_neardup,q18_simhash_pairs,q20_cosine_pairs,q32_lsh_cosine_pairs,q38_simhash_banded,q48_jaccard_join,q49_neardup_clusters,q51_embedding_clusters,q61_edit_neardup,q97_entity_link,q101_neardup_delta,q102_cosine_join,q115_semantic_dedup,q117_session_overlap,q122_containment,q180_cosine_join_lsh,q181_edit_neardup_seg,q183_semantic_dedup_wide \
  sbt "runMain graft.Verify $X10 $OUT"

python3 tools/semcheck_x10.py "$X10" "$OUT"   # q115 + q183 (numpy/BLAS)
python3 tools/embcheck_x10.py "$X10" "$OUT"   # q20 + q32 + q51 (numpy/BLAS)
python3 tools/simcheck_x10.py "$X10" "$OUT"   # q18 (numpy popcount)
python3 tools/sweep_x10.py "$X10" "$OUT"      # the rest via DuckDB
