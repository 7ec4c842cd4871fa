#!/bin/bash
# Round-14 battery 2: the third decade FOR REAL, on the lifecycle itself.
#  1. generate sf100sub (1000x documents+embeddings of sf0.1: ~2M vectors,
#     ~2M docs) — the corpus the round-13/14 recall probes simulated
#  2. t55/t42/t43 at the banded policy dial for n=2M: bits=16
#     (bitsFor(2M, BandBucketTarget=32)), L=bandTablesFor(16,1)=7 — the
#     exact dial the 2M recall probe pinned at dup recall 0.937
#  3. t40 (single-table) at ITS policy dial bits=18 (target-8), radius
#     policy — the measured contrast the banded family replaces
#  4. decade-2 dial audit: t55 at sf10sub, bits=15 (occupancy 6, L=6) vs
#     the policy bits=13 (occupancy 24, L=5) — candidates-vs-explode A/B
# Run on a quiet box from a frozen class snapshot.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r14
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r14_classes
if [ ! -d "$GRAFT_CLASSES" ]; then
  cp -a target/scala-2.13/classes "$GRAFT_CLASSES"
fi

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$OUT/battery2.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery2.log"
}

# 1. the 2M corpus
if [ ! -d target/testdata/sf100sub ]; then
  run gen_sf100 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    tools/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 target/testdata/sf100sub 1000 documents,embeddings
fi

# 2. the banded lifecycle at the n=2M policy dial. LSH_BITS=18 matters
# even here: Bench's cluster-seeds warmup seeds t40's single-table state
# at DialBits regardless of the selected queries, and the default width
# at 2M vectors means ~500 occupancy -> a ~1e9-pair seed set that fills
# the disk (measured: the first run of this battery died on ENOSPC).
run life_sf100_band env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_GRAFT_ONLY=t55_banded_cluster_increment,t42_incremental_multisignal,t43_incremental_clustered \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life_sf100_band.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf100_band_headline.json" \
  tools/run_main.sh graft.Bench

# 3. the single-table contrast at its own policy dial
run life_sf100_single env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
  SPARK_GRAFT_LSH_BITS=18 \
  SPARK_GRAFT_ONLY=t40_embed_cluster_increment \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/life_sf100_single.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/life_sf100_single_headline.json" \
  tools/run_main.sh graft.Bench

# 4. decade-2 dial audit: bits 15 vs the policy's 13 at 200k
run audit_sf10_b15 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf10sub \
  SPARK_GRAFT_BAND_BITS=15 \
  SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/audit_sf10_b15.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/audit_sf10_b15_headline.json" \
  tools/run_main.sh graft.Bench

echo "=== battery2 complete $(date +%T) ===" | tee -a "$OUT/battery2.log"
