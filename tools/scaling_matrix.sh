#!/bin/bash
# Paired-interleaved scaling matrix: runs HI,LO,HI,LO,... (each in a fresh
# JVM), computes per-adjacent-pair efficiency and reports medians.
#
# Why paired: this host shows up to 4x wall drift over tens of minutes
# (shared VM / noisy neighbors). Interleaving the two parallelism levels
# makes each efficiency ratio compare runs taken minutes apart, so slow
# drift cancels in the ratio even when absolute numbers swing; the median
# over pairs then rejects the remaining outliers.
#
# Usage: tools/scaling_matrix.sh [docs] [lo] [hi] [pairs]
set -e
DOCS=${1:-2000000}
LO=${2:-8}
HI=${3:-32}
PAIRS=${4:-3}
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
export SPARK_GRAFT_GC=${SPARK_GRAFT_GC:-G1}

HIS=()
LOS=()
for i in $(seq 1 "$PAIRS"); do
  hi=$(sbt -batch "runMain graft.ScalingBench $HI $DOCS" 2>/dev/null | grep -o '{"metric":"scaling_point".*}')
  lo=$(sbt -batch "runMain graft.ScalingBench $LO $DOCS" 2>/dev/null | grep -o '{"metric":"scaling_point".*}')
  echo "pair $i hi: $hi" >&2
  echo "pair $i lo: $lo" >&2
  HIS+=("$hi"); LOS+=("$lo")
done

python3 - "$LO" "$HI" "$DOCS" "${HIS[@]}" -- "${LOS[@]}" <<'EOF'
import json, statistics, sys
lo_c, hi_c, docs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
rest = sys.argv[4:]
sep = rest.index('--')
his = [json.loads(x) for x in rest[:sep]]
los = [json.loads(x) for x in rest[sep+1:]]
ratio = hi_c / lo_c
pair_eff = [(h["docs_per_sec"] / l["docs_per_sec"]) / ratio for h, l in zip(his, los)]
out = {
  "metric": "scaling_matrix", "docs": docs,
  "cpus_lo": lo_c, "cpus_hi": hi_c, "pairs": len(his),
  "docs_per_sec_hi": [round(h["docs_per_sec"], 1) for h in his],
  "docs_per_sec_lo": [round(l["docs_per_sec"], 1) for l in los],
  "median_docs_per_sec_hi": round(statistics.median(h["docs_per_sec"] for h in his), 1),
  "median_docs_per_sec_lo": round(statistics.median(l["docs_per_sec"] for l in los), 1),
  "pair_efficiency": [round(e, 4) for e in pair_eff],
  "median_pair_efficiency": round(statistics.median(pair_eff), 4),
}
print(json.dumps(out))
EOF
