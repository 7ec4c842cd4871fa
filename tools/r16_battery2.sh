#!/bin/bash
# Round-16 battery, phase 2:
#  1. Re-run the t42/t43 stage decompositions with the FIXED emb-probe
#     timer (the first tables wrapped only the downstream cut and left
#     ~75% of the wall unattributed to a visible stage — the probe's
#     eager work happens at incrementPairs call time). Seeds are warm;
#     each run is the pure per-batch ingest. NOTE these are REPLAYS
#     (state advanced by phase 1): t43's drop-set excludes the
#     first-advance cluster term (82 s measured, BENCH_R15_CC.json).
#  2. Closing validation pair (VERDICT ask #6): two full sf0.1 runs
#     under the baseline protocol (min-of-two-reversed, cold caches).
# Artifacts captured from result files, never stdout tails.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r16
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r16b_classes
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery2.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery2.log"
}

for q in t42 t43; do
  run curprof2_$q env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
    SPARK_GRAFT_PROBE_BC_MB=1024 SPARK_GRAFT_PROBE_SLICE_PAR=4 \
    SPARK_DRIVER_MAXRESULT=4g SPARK_GRAFT_CC_LOG=1 \
    tools/run_main.sh graft.tools.CurProfile target/testdata/sf100sub $q
done

for i in 1 2; do
  run valid$i env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="$OUT/valid$i.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/valid${i}_headline.json" \
    tools/run_main.sh graft.Bench
done

echo "=== battery phase 2 complete $(date +%T) ===" | tee -a "$OUT/battery2.log"
