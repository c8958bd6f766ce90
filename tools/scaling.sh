#!/bin/bash
# N-vs-4N scaling protocol (BASELINE.md): run the headline pipeline via
# spark-submit at local[4] and local[16] in FRESH JVMs (JIT/GC isolation),
# identical deterministic input. 4/16 rather than 8/32: this VM's
# 32-thread point saturates memory bandwidth shared across all cores (a
# single-box artifact; on a real 4x-executor cluster each node brings its
# own bandwidth). 8/32 numbers are reported alongside in BASELINE.md.
#
# PAIRS back-to-back legs per sample; the estimator MATCHES graft.Bench
# exactly — including in the aggregator (the round-3 version filtered only
# in the retry loop, so a post-retry degenerate pair still entered the
# median here while Bench excluded it):
#   - efficiency = MEDIAN (upper-middle element, Bench.med convention) of
#     PER-PAIR efficiencies over CLEAN pairs only; a pair's two legs share
#     one host-noise regime, so cross-pair level-median ratios are biased
#     (measured: pair efficiencies 0.88/0.84/0.61 vs a 0.62 cross-pair
#     ratio on the same legs).
#   - clean = speedup in [1.6, 4.4] (symmetric: <1.6 = starved 16c leg,
#     >4.4 = starved 4c leg) AND both legs above the absolute-throughput
#     floors (4c >= 12M rows/s, 16c >= 45M at the default 1e9-row input —
#     0.6x the stable clean-leg medians; a both-legs-degraded pair passes
#     the window alone, round-3 verdict).
#   - each LEG reports throughput from the MIN of 3 in-JVM passes
#     (Headline.measureBest, round 5): host noise is strictly additive,
#     so the min estimates the uncontended pass; per-iter times ride in
#     the leg JSON (iters_sec). Inherited here via ScalingBench's
#     SPARK_GRAFT_SCALE_ITERS default.
#   - two retries per degenerate pair (same budget as Bench); rejects
#     printed WITH the leg's steal_pct; if NO pair is clean the output
#     carries contended=true.
# Usage: tools/scaling.sh [rows] [pairs]
set -e
cd "$(dirname "$0")/.."
ROWS="${1:-1000000000}"
PAIRS="${2:-5}"
export SPARK_GRAFT_SCALE_ROWS="$ROWS"
OUT=/tmp/graft_scaling
mkdir -p "$OUT"
sbt -batch package > /dev/null
JAR=target/scala-2.13/r_star_treespark_2.13-0.1.0.jar

# floors only apply at the default input size (throughput depends on
# rows/pass); 0 disables
if [ "$ROWS" = "1000000000" ]; then FLOOR4=12000000; FLOOR16=45000000
else FLOOR4=0; FLOOR16=0; fi

leg() { # cpus outfile
  /opt/spark/bin/spark-submit --master "local[$1]" \
    --driver-memory "${SPARK_DRIVER_MEM:-16g}" \
    --conf spark.ui.enabled=false \
    --class graft.bench.ScalingBench "$JAR" "$1" 2>/dev/null \
    | grep '"metric"' | tail -1 > "$2"
  cat "$2"
}

for P in $(seq 1 "$PAIRS"); do
  for TRY in a b c; do
    leg 4  "$OUT/leg_4_p${P}.json"
    leg 16 "$OUT/leg_16_p${P}.json"
    OK=$(python3 -c "
import json
a = json.load(open('$OUT/leg_4_p${P}.json'))['value']
b = json.load(open('$OUT/leg_16_p${P}.json'))['value']
ok = a > 0 and b > 0 and 1.6 <= b / a <= 4.4 and a >= $FLOOR4 and b >= $FLOOR16
print(1 if ok else 0)")
    if [ "$OK" = "1" ] || [ "$TRY" = "c" ]; then break; fi
    python3 -c "
import json
a = json.load(open('$OUT/leg_4_p${P}.json'))
b = json.load(open('$OUT/leg_16_p${P}.json'))
print(json.dumps({'rejected_pair': $P, 'legs': [a['value'], b['value']],
  'speedup': round(b['value'] / a['value'], 3),
  'steal_pct': max(a.get('steal_pct', -1), b.get('steal_pct', -1))}))"
  done
done

python3 - "$OUT" "$PAIRS" "$FLOOR4" "$FLOOR16" <<'EOF'
import json, sys
out, pairs = sys.argv[1], int(sys.argv[2])
floor4, floor16 = float(sys.argv[3]), float(sys.argv[4])
allp, l4, l16, steals = [], [], [], []
for p in range(1, pairs + 1):
    a = json.load(open(f"{out}/leg_4_p{p}.json"))
    b = json.load(open(f"{out}/leg_16_p{p}.json"))
    l4.append(a["value"]); l16.append(b["value"])
    steals.append(max(a.get("steal_pct", -1), b.get("steal_pct", -1)))
    # same positive-legs filter as Bench's allPairs — a degenerate run
    # that still printed a metric line must not enter any median (and a
    # zero leg would divide by zero below)
    if a["value"] > 0 and b["value"] > 0:
        allp.append((a["value"], b["value"]))
def is_clean(p):
    sp = p[1] / p[0]
    return 1.6 <= sp <= 4.4 and p[0] >= floor4 and p[1] >= floor16
clean = [p for p in allp if is_clean(p)]
contended = len(clean) == 0
use = allp if contended else clean   # best-effort + flag, same as Bench
effs = [(b / a) / 4.0 for a, b in use]
# every pair degenerate -> no estimable efficiency at all (Bench med([]) = -1)
med = sorted(effs)[len(effs) // 2] if effs else -1.0
print(json.dumps({"metric": "scaling_efficiency", "unit": "ratio",
  "value": round(med, 4), "contended": contended,
  "clean_pairs": len(clean),
  "floor_4c": floor4, "floor_16c": floor16,
  "pair_efficiencies": [round((b / a) / 4.0, 4) for a, b in allp],
  "pair_steal_pct": steals,
  "local4_rows_per_sec": l4, "local16_rows_per_sec": l16}))
EOF
