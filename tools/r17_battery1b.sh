#!/bin/bash
# Round-17 battery, phase 1b — the same-day pairings phase 1 lacked:
#  - t55 default-dial REPEATS (phase 1's single 394 s reading came off a
#    cold page cache for the 7.9 GB warm state; CcProbe's simultaneous
#    1.00x-of-model reading shows the box itself is not slow — these
#    repeats measure the warm-cache number, min-of-two protocol).
#  - CurProfile t42 par/ckpt A/B BACK-TO-BACK (ask #6): same cache
#    state, only the checkpoint mode differs. The ckpt arm's probe
#    stage vs the par arm's prices the storage-pinned-cut-blocks term.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r17
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r17_classes

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery1b.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery1b.log"
}

for i in 2 3; do
  run t55_default_$i env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
    SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
    SPARK_DRIVER_MAXRESULT=4g \
    SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
    SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
    SPARK_GRAFT_BENCH_OUT="$OUT/t55_default_$i.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/t55_default_${i}_headline.json" \
    tools/run_main.sh graft.Bench
done

run curprof_t42_par2 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_DRIVER_MAXRESULT=4g \
  tools/run_main.sh graft.tools.CurProfile target/testdata/sf100sub t42

rm -rf /tmp/graft_ckpt_r17
run curprof_t42_ckpt env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_DRIVER_MAXRESULT=4g SPARK_GRAFT_CKPT_DIR=/tmp/graft_ckpt_r17 \
  tools/run_main.sh graft.tools.CurProfile target/testdata/sf100sub t42
rm -rf /tmp/graft_ckpt_r17

echo "=== battery phase 1b complete $(date +%T) ===" | tee -a "$OUT/battery1b.log"
