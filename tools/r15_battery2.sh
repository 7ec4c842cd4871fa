#!/bin/bash
# Round-15 battery part 2 (continues r15_battery.sh after its sweep
# stages — the confirmation dial is re-tuned to the sweep's measured
# best, 1 GB budget + 4-way slice dispatch, instead of the pre-sweep
# guess). Classes re-frozen AFTER the slice-telemetry line landed
# (fedc647+), so stages here log [graft.probe] slices=... — the only
# diff vs part 1's snapshot is that stderr line.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r15
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r15_classes2
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery2.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery2.log"
}

# 4. lifecycle confirmation at the sweep's best dial + union-find headroom
run life_sf100_r15 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_GRAFT_PROBE_BC_MB=1024 SPARK_GRAFT_PROBE_SLICE_PAR=4 SPARK_DRIVER_MAXRESULT=4g \
  SPARK_GRAFT_PASSES=1 SPARK_GRAFT_CC_LOG=1 \
  SPARK_GRAFT_ONLY=t55_banded_cluster_increment,t42_incremental_multisignal,t43_incremental_clustered \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life_sf100_r15.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf100_r15_headline.json" \
  tools/run_main.sh graft.Bench

# 5. occupancy A/B decade 2 (sf10sub, 200k): policy bits 13 vs 15
for b in 13 15; do
  run audit_sf10_b$b env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_SF_DIR=target/testdata/sf10sub \
    SPARK_GRAFT_LSH_BITS=15 SPARK_GRAFT_BAND_BITS=$b \
    SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
    SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
    SPARK_GRAFT_BENCH_OUT="$OUT/audit_sf10_b$b.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/audit_sf10_b${b}_headline.json" \
    tools/run_main.sh graft.Bench
done
run recall_200k_b15 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.tools.PairRecallProbe 200000 band6:15:1 1000

# 6. occupancy A/B decade 3 (re-seeds the banded index at bits 17)
run audit_sf100_b17 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=17 \
  SPARK_GRAFT_PROBE_BC_MB=1024 SPARK_GRAFT_PROBE_SLICE_PAR=4 SPARK_DRIVER_MAXRESULT=4g \
  SPARK_GRAFT_PASSES=1 \
  SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/audit_sf100_b17.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/audit_sf100_b17_headline.json" \
  tools/run_main.sh graft.Bench
run recall_2m_b17 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run_main.sh graft.tools.PairRecallProbe 2000000 band8:17:1 500

# 7. banded soak at the second decade
run soak_sf10 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_BAND_BITS=13 \
  tools/run_main.sh graft.tools.SoakRun target/testdata/sf10sub 12 4

# 8. the single-table contrast, bounded: completes or refuses on clock
run life_sf100_single timeout 2400 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
  SPARK_GRAFT_LSH_BITS=18 \
  SPARK_GRAFT_PASSES=1 \
  SPARK_GRAFT_ONLY=t40_embed_cluster_increment \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life_sf100_single.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf100_single_headline.json" \
  tools/run_main.sh graft.Bench

echo "=== battery2 complete $(date +%T) ===" | tee -a "$OUT/battery2.log"
