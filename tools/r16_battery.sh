#!/bin/bash
# Round-16 battery, phase 1: convert the round-15 measured laws into
# engineering, per VERDICT "Next round" items:
#  1. Stage-decompose t42 AND t43 at sf100sub (ask #1): CurProfile hooks
#     ingestImpl's own eager cut/append boundaries — names the dominant
#     non-probe stage of the 576.6 s decade-3 wall. NOTE: round-15's last
#     sf100sub runs re-seeded the lifecycle warehouses at band-bits 17,
#     so the first bits-16 run pays a one-time re-seed (timed separately
#     in the ensure-seeded stage, outside the ingest decomposition).
#  2. Dispatch-dial sweep (ask #2): par ∈ {1, 2, 4, 8} on the sf100sub
#     t55 at the 1 GB budget (the round-15 champion). par=1 doubles as
#     the same-day weather control against round-15's 488.2 s (1 GB seq).
#     The new driver-heap guard allows par 12 at this budget on a 48 GB
#     driver, so none of these arms are capped (maxParFor spec).
#  3. Decade-4-shaped term (ask #5): CcProbe prices the distributed CC
#     loop on a synthetic 400M-edge clique graph — the capacity model's
#     cluster term at 10x the measured 41.5M-edge anchor.
# Artifacts are captured from the RESULT FILES, not stdout tails
# (ask #7) — see the cp lines at the end.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r16
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r16_classes
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery.log"
}

# 1. t42/t43 stage decomposition at the third decade, champion dial
# (1 GB x 4 — round-15 sweep's knee; budget was measured <±10% anyway)
for q in t42 t43; do
  run curprof_$q env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
    SPARK_GRAFT_PROBE_BC_MB=1024 SPARK_GRAFT_PROBE_SLICE_PAR=4 \
    SPARK_DRIVER_MAXRESULT=4g SPARK_GRAFT_CC_LOG=1 \
    tools/run_main.sh graft.tools.CurProfile target/testdata/sf100sub $q
done

# 2. the dispatch-dial sweep at the third decade (t55, 1 GB budget)
sweep() {
  local par=$1
  run sweep_p$par env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
    SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
    SPARK_GRAFT_PROBE_BC_MB=1024 SPARK_GRAFT_PROBE_SLICE_PAR=$par \
    SPARK_DRIVER_MAXRESULT=4g \
    SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
    SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
    SPARK_GRAFT_BENCH_OUT="$OUT/sweep_p$par.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/sweep_p${par}_headline.json" \
    tools/run_main.sh graft.Bench
}
sweep 1
sweep 2
sweep 4
sweep 8

# 3. the decade-4 cluster term: 400M-edge clique graph through the
# distributed label-propagation loop (model predicts ~790 s)
run ccprobe_400m env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.CcProbe 400000000 30

# capture from result files (VERDICT wrong #4 / ask #7): the battery's
# committed artifacts are the files Bench wrote, never stdout tails
for f in sweep_p1 sweep_p2 sweep_p4 sweep_p8; do
  [ -f "$OUT/$f.json" ] && cp "$OUT/$f.json" "BENCH_R16_SWEEP_$f.json.part"
done

echo "=== battery phase 1 complete $(date +%T) ===" | tee -a "$OUT/battery.log"
