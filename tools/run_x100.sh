#!/bin/sh
# End-to-end ×100 pair-tier spot-check (round 13): synthesize the 500k-doc
# corpus, run the three scale-critical paths with max-task accounting
# (q15 / q180 / q183-at-scale-correct-geometry), then check q15/q180
# against DuckDB on sampled domains and q183 against the blocked-numpy
# oracle. ~30-40 min on an idle 32-core box.
set -e
X100=${1:-/tmp/testdata_x100}
OUT=${2:-/tmp/vx100}
NLIST=${3:-6400}

python3 tools/synth_x10_organic.py "$X100" 100
sbt -batch "runMain graft.ScaleProbe $X100 $OUT $NLIST"
python3 tools/x100check.py "$X100" "$OUT"
python3 tools/semcheck_x10.py "$X100" "$OUT" "q183x100:$NLIST" "q190x100_auto:500"
python3 tools/exactcheck_x100.py "$X100" "$OUT"
