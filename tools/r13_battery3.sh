#!/bin/bash
# Round-13 battery #3: the banded lifecycle (t55) measured against the
# single-table lifecycle (t40) at both decades, plus baseline seeds for
# the two queries registered this round (t54, t55) and a dialed Verify
# that includes them. Run AFTER battery2 on a quiet box, from a fresh
# class snapshot that includes BandEmbIndex/t55.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r13
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r13_classes3
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a "$OUT/battery3.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery3.log"
}

# 1. Baseline seeds for t54 + t55: isolated sf0.1 run, full warmup
run t54_t55_seed env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=t54_near_dup_banded,t55_banded_cluster_increment \
  SPARK_GRAFT_BENCH_OUT="$OUT/t54_t55_seed.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/t54_t55_seed_headline.json" \
  tools/run_main.sh graft.Bench

# 2-3. Banded vs single-table lifecycle at both decades: t55 alongside
# t40 in ONE run per decade (same warmup, same box) so the comparison is
# within-session. LSH_BITS drives both families (DialBandBits follows).
run band_sf1_b12 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=12g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf1.0 SPARK_GRAFT_LSH_BITS=12 \
  SPARK_GRAFT_ONLY=t40_embed_cluster_increment,t55_banded_cluster_increment \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/band_sf1_b12.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/band_sf1_b12_headline.json" \
  tools/run_main.sh graft.Bench
run band_sf10_b15 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf10sub SPARK_GRAFT_LSH_BITS=15 \
  SPARK_GRAFT_ONLY=t40_embed_cluster_increment,t55_banded_cluster_increment \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/band_sf10_b15.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/band_sf10_b15_headline.json" \
  tools/run_main.sh graft.Bench

# 3b. Re-measure uniform batched serving with the re-spread fix (the
# single-partition 1793 s vs 32-way 258 s finding): expect the uniform
# batch near the skewed batch's wall now
run batchserve3 env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
  SPARK_GRAFT_IVF_K=256 SPARK_GRAFT_PQ_KS=256 \
  tools/run_main.sh graft.tools.BatchServe target/testdata/sf10sub 10000 both

# 4. Verify at the bits-12 occupancy dial INCLUDING t54/t55 (battery2's
# verify ran from the pre-t55 snapshot)
run verify3_b12 env SPARK_GRAFT_CPUS=16 SPARK_GRAFT_LSH_BITS=12 \
  tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/verify3_b12

# 5. t42 attribution: isolated t42 at round-11 HEAD (09179d0) vs current
# HEAD, back-to-back on the same box — separates code drift from box
# weather (trajectory: baseline 4.13 -> r11-valid 4.49 -> r13-valid
# 5.72 -> isolated 6.50)
if [ ! -d /tmp/r13_t42prev ]; then
  git worktree add /tmp/r13_t42prev 09179d0 >>"$OUT/battery3.log" 2>&1
fi
( cd /tmp/r13_t42prev && sbt -batch compile ) >"$OUT/attrib_prev_compile.log" 2>&1
run attrib_t42_prev env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  GRAFT_CLASSES=/tmp/r13_t42prev/target/scala-2.13/classes \
  SPARK_GRAFT_ONLY=t42_incremental_multisignal \
  SPARK_GRAFT_BENCH_OUT="$OUT/attrib_t42_prev.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/attrib_t42_prev_headline.json" \
  tools/run_main.sh graft.Bench
run attrib_t42_head env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ONLY=t42_incremental_multisignal \
  SPARK_GRAFT_BENCH_OUT="$OUT/attrib_t42_head.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/attrib_t42_head_headline.json" \
  tools/run_main.sh graft.Bench

echo "=== battery3 complete $(date +%T) ===" | tee -a "$OUT/battery3.log"
