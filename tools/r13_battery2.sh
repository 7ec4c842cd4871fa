#!/bin/bash
# Round-13 battery #2: lifecycle cost at the FINAL joint policy
# (BucketTarget 8 + MaskBudget 1024 -> dials (12,4)/(15,3)/(16,3)),
# t39/t42 isolated attribution, production-dial batched serving,
# fixed band-stratified recall, Verify at the occupancy dial, and the
# sf100sub third-decade row. Sequential, frozen class snapshot.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r13
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r13_classes2
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_ONLY=t40_embed_cluster_increment,t42_incremental_multisignal,t43_incremental_clustered
LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$OUT/battery2.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery2.log"
}

# 1-3. Lifecycle at the final policy dials (radius now from the 1024 budget)
run life2_sf1_b12 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf1.0 SPARK_GRAFT_LSH_BITS=12 \
  SPARK_GRAFT_ONLY=$LIFE_ONLY SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life2_sf1_b12.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life2_sf1_b12_headline.json" \
  tools/run_main.sh graft.Bench
for B in 15 16; do
  run life2_sf10_b$B env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    SPARK_GRAFT_SF_DIR=target/testdata/sf10sub SPARK_GRAFT_LSH_BITS=$B \
    SPARK_GRAFT_ONLY=$LIFE_ONLY SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
    SPARK_GRAFT_BENCH_OUT="$OUT/life2_sf10_b$B.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/life2_sf10_b${B}_headline.json" \
    tools/run_main.sh graft.Bench
done

# 4. Isolated t39/t42 attribution at default dials, sf0.1
run attrib_t39_t42 env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=t39_temperature_mix,t42_incremental_multisignal \
  SPARK_GRAFT_BENCH_OUT="$OUT/attrib_t39_t42.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/attrib_headline.json" \
  tools/run_main.sh graft.Bench

# 5. Batched serving at the PRODUCTION quantizer dial (round-12 protocol)
run batchserve2 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  SPARK_GRAFT_IVF_K=256 SPARK_GRAFT_PQ_KS=256 \
  tools/run_main.sh graft.tools.BatchServe target/testdata/sf10sub 10000 both

# 6. Band-stratified recall (fixed instrument) at the decision dials
run recall3_20k env SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.tools.PairRecallProbe 20000 "10:4,12:4,12:3" 1000
run recall3_200k env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.tools.PairRecallProbe 200000 "13:3,15:3,15:2,16:3" 500

# 7. Verify at the occupancy dial (oracle replay checked after by check_oracle.py)
run verify_b12 env SPARK_GRAFT_CPUS=16 SPARK_GRAFT_LSH_BITS=12 \
  tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_b12

# 8. Third decade for real: 2M-vector corpus, bits=18 (the target-8 dial), t40
run gen_sf100 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 target/testdata/sf100sub 1000 documents,embeddings
run life2_sf100_b18 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub SPARK_GRAFT_LSH_BITS=18 \
  SPARK_GRAFT_ONLY=t40_embed_cluster_increment SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life2_sf100_b18.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life2_sf100_b18_headline.json" \
  tools/run_main.sh graft.Bench

echo "=== battery2 complete $(date +%T) ===" | tee -a "$OUT/battery2.log"
