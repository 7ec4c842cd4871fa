#!/bin/bash
# Round-14 battery: the banded-lifecycle switch measured end to end.
#  1. full Verify + oracle pre-check at sf0.01 (the banded t42/t43 oracles)
#  2. full Bench at sf0.1 (regression gate over the switched lifecycle)
#  3. isolated baseline seeds: t54/t55 (new) + t42/t43 (re-measure after
#     the pair-source switch), min-of-two protocol inside Bench
#  4. lifecycle decade² at the banded policy dials: sf1.0 (band3:10:1)
#     and sf10sub (band5:13:1), t40 single-table alongside at ITS dial
#  5. post-fix BatchServe uniform + skewed at 10^4 on sf10sub
#  6. recall re-pins at 200k (decade-2 + forced third-decade dial) and a
#     REAL third decade at n=2M (band7:16:1 by the ~n^0.22 law)
#  7. 20-batch SoakRun of the (now banded) t43 lifecycle at sf1.0
# Run on a quiet box from a frozen class snapshot.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r14
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r14_classes
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$OUT/battery.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery.log"
}

# 1. full correctness pre-check at sf0.01
run verify_full env SPARK_GRAFT_CPUS=16 \
  tools/run_main.sh graft.Verify /root/testdata/sf0.01 "$OUT/verify_full"
run oracle_full python3 tools/check_oracle.py "$OUT/verify_full" /root/testdata/sf0.01

# 2. full bench at sf0.1 (the driver's shape)
run bench_full env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench_full.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/bench_full_headline.json" \
  tools/run_main.sh graft.Bench

# 3. isolated baseline seeds (new + switched queries)
run seed_iso env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=t54_near_dup_banded,t55_banded_cluster_increment,t42_incremental_multisignal,t43_incremental_clustered \
  SPARK_GRAFT_BENCH_OUT="$OUT/seed_iso.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/seed_iso_headline.json" \
  tools/run_main.sh graft.Bench

# 4. lifecycle decade² at the banded policy dials; t40 at its own dial
run life_sf1 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf1.0 \
  SPARK_GRAFT_LSH_BITS=12 SPARK_GRAFT_BAND_BITS=10 \
  SPARK_GRAFT_ONLY=t40_embed_cluster_increment,t55_banded_cluster_increment,t42_incremental_multisignal,t43_incremental_clustered \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life_sf1.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf1_headline.json" \
  tools/run_main.sh graft.Bench
run life_sf10 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf10sub \
  SPARK_GRAFT_LSH_BITS=15 SPARK_GRAFT_BAND_BITS=13 \
  SPARK_GRAFT_ONLY=t40_embed_cluster_increment,t55_banded_cluster_increment,t42_incremental_multisignal,t43_incremental_clustered \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life_sf10.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf10_headline.json" \
  tools/run_main.sh graft.Bench

# 5. post-fix batched serving: uniform + skewed at 10^4 (the re-spread
# fix's corpus-scale confirmation — r13 measured uniform 1792.9 PRE-fix)
run batchserve env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  SPARK_GRAFT_IVF_K=256 SPARK_GRAFT_PQ_KS=256 \
  tools/run_main.sh graft.tools.BatchServe target/testdata/sf10sub 10000 both

# 6. recall pins: decade-2 policy dial + forced third-decade dial at
# 200k, then the REAL third decade at 2M
run recall_200k env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  tools/run_main.sh graft.tools.PairRecallProbe 200000 \
  band5:13:1,band7:16:1 1000
run recall_2m env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  tools/run_main.sh graft.tools.PairRecallProbe 2000000 \
  band7:16:1,band6:15:1 500

# 7. banded-lifecycle soak at sf1.0 (cadence 5 to exercise maintenance)
run soak_band env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g \
  SPARK_GRAFT_BAND_BITS=10 \
  tools/run_main.sh graft.tools.SoakRun target/testdata/sf1.0 20 5

echo "=== battery complete $(date +%T) ===" | tee -a "$OUT/battery.log"
