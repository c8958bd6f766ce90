#!/bin/bash
# N-vs-4N scaling protocol (BASELINE.md): run the headline pipeline via
# spark-submit at local[4] and local[16] in FRESH JVMs (JIT/GC isolation),
# identical deterministic input. 4/16 rather than 8/32: this VM's
# 32-thread point saturates memory bandwidth shared across all cores (a
# single-box artifact; on a real 4x-executor cluster each node brings its
# own bandwidth). 8/32 numbers are reported alongside in BASELINE.md.
# Usage: tools/scaling.sh [rows]
set -e
cd "$(dirname "$0")/.."
ROWS="${1:-1000000000}"
export SPARK_GRAFT_SCALE_ROWS="$ROWS"
OUT=/tmp/graft_scaling
mkdir -p "$OUT"
sbt -batch package > /dev/null
JAR=target/scala-2.13/r_star_treespark_2.13-0.1.0.jar
for CPUS in 16 4; do
  /opt/spark/bin/spark-submit --master "local[$CPUS]" \
    --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
    --conf spark.ui.enabled=false \
    --class graft.bench.ScalingBench "$JAR" "$CPUS" 2>/dev/null \
    | grep '"metric"' | tail -1 > "$OUT/leg_$CPUS.json"
  cat "$OUT/leg_$CPUS.json"
done
python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
r4 = json.load(open(f"{out}/leg_4.json"))
r16 = json.load(open(f"{out}/leg_16.json"))
eff = (r16["value"] / r4["value"]) / 4.0
print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 4),
  "unit": "ratio", "rows": r4["rows"],
  "local4_rows_per_sec": r4["value"], "local16_rows_per_sec": r16["value"]}))
EOF
