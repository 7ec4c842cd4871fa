#!/bin/bash
# Round-13 measurement battery — runs sequentially from a frozen class
# snapshot so sbt stays free for development. Outputs land in /tmp/r13
# (raw logs + JSON); curated numbers move into SCALE.md / BENCH_* by hand.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r13
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r13_classes
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_ONLY=t40_embed_cluster_increment,t42_incremental_multisignal,t43_incremental_clustered
LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() { # name, then env pairs + command
  local name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$OUT/battery.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery.log"
}

# 1. Quiet-box full-suite validation (min-of-two-reversed is internal to Bench)
run bench_valid env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT="$OUT/BENCH_R13_VALID.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/bench_valid_headline.json" \
  tools/run_main.sh graft.Bench

# 2. t51 baseline seed — isolated run, full warmup (nothing skipped), sf0.1
run t51_seed env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=t51_ann_batch_serve \
  SPARK_GRAFT_BENCH_OUT="$OUT/t51_seed.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/t51_seed_headline.json" \
  tools/run_main.sh graft.Bench

# 3-4. sf1.0 lifecycle at the two occupancy dials (bits 10 = target 32, 12 = target 8)
for B in 10 12; do
  run life_sf1_b$B env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g \
    SPARK_GRAFT_SF_DIR=target/testdata/sf1.0 SPARK_GRAFT_LSH_BITS=$B \
    SPARK_GRAFT_ONLY=$LIFE_ONLY SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
    SPARK_GRAFT_BENCH_OUT="$OUT/life_sf1_b$B.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf1_b${B}_headline.json" \
    tools/run_main.sh graft.Bench
done

# 5-7. sf10sub lifecycle at bits 13 (target 32), 15 (target 8), 16 (third-decade probe)
for B in 13 15 16; do
  run life_sf10_b$B env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_SF_DIR=target/testdata/sf10sub SPARK_GRAFT_LSH_BITS=$B \
    SPARK_GRAFT_ONLY=$LIFE_ONLY SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
    SPARK_GRAFT_BENCH_OUT="$OUT/life_sf10_b$B.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf10_b${B}_headline.json" \
    tools/run_main.sh graft.Bench
done

# 8-9. Pair recall at the occupancy dials (policy radius per bits)
run recall_20k env SPARK_GRAFT_CPUS=32 tools/run_main.sh graft.tools.PairRecallProbe 20000 10,12 1000
run recall_200k env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.tools.PairRecallProbe 200000 13,15,16 500

# 10. Batched serving: uniform vs skewed at 10^4 on the 200k corpus
run batchserve env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.tools.BatchServe target/testdata/sf10sub 10000 both

echo "=== battery complete $(date +%T) ===" | tee -a "$OUT/battery.log"
