#!/bin/bash
# Scaling-efficiency evidence: same pipeline, same input, local[LO] vs
# local[HI], each in a fresh JVM. Usage: tools/scaling.sh [docs] [lo] [hi]
set -e
DOCS=${1:-300000}
LO=${2:-8}
HI=${3:-32}
cd "$(dirname "$0")/.."
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
outlo=$(sbt -batch "runMain graft.ScalingBench $LO $DOCS" 2>/dev/null | grep -o '{"metric":"scaling_point".*}')
outhi=$(sbt -batch "runMain graft.ScalingBench $HI $DOCS" 2>/dev/null | grep -o '{"metric":"scaling_point".*}')
python3 - "$outlo" "$outhi" "$LO" "$HI" <<'EOF'
import json, sys
lo, hi = json.loads(sys.argv[1]), json.loads(sys.argv[2])
ratio = int(sys.argv[4]) / int(sys.argv[3])
eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 4),
                  "unit": "ratio", "docs": lo["docs"],
                  "cpus_lo": lo["cpus"], "cpus_hi": hi["cpus"],
                  "sec_lo": lo["sec"], "sec_hi": hi["sec"],
                  "docs_per_sec_lo": lo["docs_per_sec"],
                  "docs_per_sec_hi": hi["docs_per_sec"]}))
EOF
