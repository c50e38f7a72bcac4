#!/bin/bash
# Scaling protocol (BASELINE.md): identical KG build at local[N] and
# local[4N], one JVM per measurement, writes BENCH/BASELINE.md.
set -e
cd "$(dirname "$0")/.."
DOCS=${1:-100000}
SMALL=${2:-8}
LARGE=${3:-32}
OUT=/tmp/scale_out.txt
: > $OUT
for CPUS in $SMALL $LARGE; do
  sbt -batch "runMain graft.ScalingBench $CPUS $DOCS" 2>&1 | grep SCALE_RESULT >> $OUT
done
python3 - "$DOCS" "$SMALL" "$LARGE" <<'EOF'
import json, sys, re
docs, small, large = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rows = {}
for line in open('/tmp/scale_out.txt'):
    d = json.loads(re.sub(r'^.*SCALE_RESULT ', '', line.strip()))
    rows[d['cpus']] = d
s, l = rows[small], rows[large]
ratio = large / small
eff = (s['sec'] / l['sec']) / ratio
md = f"""# BENCH/BASELINE — KG-build scaling evidence

Protocol (BASELINE.md): identical KG-build job, identical synthetic input
({docs} docs, seed-fixed PagesGen corpus materialized to parquet), run at
local[{small}] and local[{large}] in separate JVMs (tools/run_scaling.sh);
efficiency = (T_{small} / T_{large}) / {ratio:.0f}.

| parallelism | wall (s) | docs/sec | triples/sec |
|---|---|---|---|
| local[{small}] | {s['sec']:.2f} | {s['docs_per_sec']:.1f} | {s['triples_per_sec']:.1f} |
| local[{large}] | {l['sec']:.2f} | {l['docs_per_sec']:.1f} | {l['triples_per_sec']:.1f} |

triples per build: {l['triples']}
scaling efficiency (target >= 0.8): **{eff:.3f}**
"""
import os
os.makedirs('BENCH', exist_ok=True)
open('BENCH/BASELINE.md', 'w').write(md)
print(md)
EOF
