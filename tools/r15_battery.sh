#!/bin/bash
# Round-15 battery: close the verdict's seven asks with measurements.
#  1. full Verify + oracle pre-check at sf0.01 (code changed this round)
#  2. quiet-box validation: 2 full sf0.1 benches under the baseline
#     protocol (min-of-two-reversed) -> per-query medians re-anchor the
#     weather band and adjudicate t54/t36/t24/t39 (VERDICT wrong #2)
#  3. THE ROUND'S HEADLINE — sliced-probe recovery dial at the third
#     decade (sf100sub, 2M vectors): sweep SPARK_GRAFT_PROBE_BC_MB
#     256 (control) / 1024 / 4096 on t55, then concurrent dispatch
#     (SLICE_PAR=4) at 256 and 1024 -> budget -> slices -> wall table
#  4. confirmation at the recovered dial: t42/t43/t55 single-pass with
#     SPARK_GRAFT_CC_LOG=1 (the union-find contracted-edge headroom
#     measurement rides the same run)
#  5. occupancy A/B decade 2: t55 sf10sub bits 13 (policy) vs 15, plus
#     PairRecallProbe 200k band6:15:1 (recall side of the trade)
#  6. occupancy A/B decade 3: t55 sf100sub bits 17 (re-seeds!) vs the
#     step-3 bits-16 control, plus PairRecallProbe 2M band8:17:1
#     NOTE: runs AFTER every bits-16 consumer — the re-seed rewrites
#     the banded index state for this corpus
#  7. banded soak at sf10sub (12 batches, cadence 4): decade file-litter
#     bound + reconcile drift
#  8. t40 single-table sf100 contrast under a hard timeout — completes
#     or documents the refusal with its arithmetic
# Run from a frozen class snapshot; single-pass (PASSES=1) only where
# the quantity is a same-box ratio between configs.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r15
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r15_classes
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery.log"
}

# 1. correctness pre-check: ran pre-commit on these exact classes
# (94 ok / 0 fail, /tmp/r15_verify.log) — not repeated here

# 2. quiet-box validation (baseline protocol, twice)
for i in 1 2; do
  run valid$i env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_OUT="$OUT/valid$i.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/valid${i}_headline.json" \
    tools/run_main.sh graft.Bench
done

# 3. the budget/concurrency sweep at the third decade (bits 16 = policy)
sweep() {
  local mr=8g
  local tag=$1 bc=$2 par=$3
  run sweep_$tag env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
    SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
    SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
    SPARK_GRAFT_PROBE_BC_MB=$bc SPARK_GRAFT_PROBE_SLICE_PAR=$par SPARK_DRIVER_MAXRESULT=$mr \
    SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
    SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
    SPARK_GRAFT_BENCH_OUT="$OUT/sweep_$tag.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/sweep_${tag}_headline.json" \
    tools/run_main.sh graft.Bench
}
sweep bc256 256 1
sweep bc1024 1024 1
sweep bc4096 4096 1
sweep bc256p4 256 4
sweep bc1024p4 1024 4

# 4. lifecycle confirmation at the recovered dial + union-find headroom
run life_sf100_r15 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_GRAFT_PROBE_BC_MB=4096 SPARK_GRAFT_PROBE_SLICE_PAR=4 SPARK_DRIVER_MAXRESULT=8g \
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
  SPARK_GRAFT_PROBE_BC_MB=4096 SPARK_GRAFT_PROBE_SLICE_PAR=4 SPARK_DRIVER_MAXRESULT=8g \
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

echo "=== battery complete $(date +%T) ===" | tee -a "$OUT/battery.log"
