#!/bin/bash
# Round-17 battery, phase 1 — sf100sub (warm decade-3 state) + the CC
# default-config probe, per VERDICT "Next round" items:
#  A1. t55 at PURE DEFAULT probe dials (no SPARK_GRAFT_PROBE_BC_MB, no
#      SPARK_GRAFT_PROBE_SLICE_PAR): since round 17 the defaults ARE the
#      measured champion — budget 256 MB (code default), par =
#      parFor(sc.defaultParallelism) = 8 at local[32], K floored at
#      2×par by flooredSliceCount. Done-criterion for verdict #2/#3:
#      within ~10% of the 252.5 s champion (weather-normalized).
#  A2. CurProfile t42 at default dials (= champion): stage-table delta
#      for the CONCURRENT appends (verdict #4 — r16 measured 38.5 s
#      sequential) + per-stage pinned-storage telemetry (ask #6 input).
#  A3. CurProfile t42 with SPARK_GRAFT_CKPT_DIR (ask #6 A/B): reliable
#      disk checkpoints instead of localCheckpoint — if the in-session
#      probe overhead vanishes, the term is storage-pinned cut blocks.
#  A4. CcProbe 400M edges at SUITE-DEFAULT partitions (no third arg):
#      the propagation loop must now raise shuffle partitions ITSELF
#      (ccShufflePartitionsFor — verdict #5). r16 completed only with
#      hand-set 400; the model's number is 645 s.
# Artifacts are read from Bench result files / tool stage tables, never
# stdout tails.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r17
mkdir -p "$OUT"
export GRAFT_CLASSES=/tmp/r17_classes
rm -rf "$GRAFT_CLASSES"
cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

LIFE_SKIP=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a "$OUT/battery.log"
}

# A1: defaults == champion (no probe dials set)
run t55_default env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=target/testdata/sf100sub \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_DRIVER_MAXRESULT=4g \
  SPARK_GRAFT_PASSES=1 \
  SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
  SPARK_GRAFT_SKIP_WARM=$LIFE_SKIP \
  SPARK_GRAFT_BENCH_OUT="$OUT/t55_default.json" \
  SPARK_GRAFT_BENCH_HEADLINE="$OUT/t55_default_headline.json" \
  tools/run_main.sh graft.Bench

# A2: t42 stage table, concurrent appends (default dials = champion)
run curprof_t42_par env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_DRIVER_MAXRESULT=4g \
  tools/run_main.sh graft.tools.CurProfile target/testdata/sf100sub t42

# A3: same run, reliable-checkpoint arm (ask #6 A/B)
rm -rf /tmp/graft_ckpt_r17
run curprof_t42_ckpt env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_LSH_BITS=18 SPARK_GRAFT_BAND_BITS=16 \
  SPARK_DRIVER_MAXRESULT=4g SPARK_GRAFT_CKPT_DIR=/tmp/graft_ckpt_r17 \
  tools/run_main.sh graft.tools.CurProfile target/testdata/sf100sub t42
rm -rf /tmp/graft_ckpt_r17

# A4: CC loop sizes its own shuffle partitions (suite default = cpus)
run ccprobe_default env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=80g \
  SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.CcProbe 400000000 30

echo "=== battery phase 1 complete $(date +%T) ===" | tee -a "$OUT/battery.log"
