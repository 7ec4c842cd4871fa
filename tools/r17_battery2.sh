#!/bin/bash
# Round-17 battery, phase 2 — the OFF-FIT composed-model test
# (VERDICT next #1; predictions stated in SCALE.md BEFORE this runs):
#   sf300sub = factor 3000 of sf0.1 documents+embeddings — 6M vectors,
#   3× past the largest fitted corpus. Champion dial = the code
#   DEFAULTS since round 17 (256 MB budget, par 8 fleet-derived,
#   K >= 2×par floor). Policy dials at 6M: LSH 20 bits, BAND 18 bits
#   (L auto-derives to bandTablesFor(18,1) = 9).
#
# Disk protocol (each sf300sub lifecycle warehouse ≈ 29 GB, free ≈ 70):
# one warehouse on disk at a time — t55 seeds/runs/IS DELETED, then t42.
# Two timed runs per query: run 1 = first advance (real appends +
# cluster), run 2 = replay (the posture the model's anchors were
# measured in — the model test proper).
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r17
mkdir -p "$OUT"
export GRAFT_CLASSES=${GRAFT_CLASSES:-/tmp/r17_classes}
[ -d "$GRAFT_CLASSES" ] || cp -a target/scala-2.13/classes "$GRAFT_CLASSES"

SF=target/testdata/sf300sub
# periodicGC: without it the 3M-vector seed accumulated 56 GB of
# cleanable shuffle/block litter (the 48 GB heap never GC'd, so the
# context cleaner never fired) and ENOSPC'd the box — scratch is
# bounded by ~interval of churn once the cleaner actually runs
DIALS_ENV="SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g SPARK_GRAFT_LSH_BITS=20 SPARK_GRAFT_BAND_BITS=18 SPARK_DRIVER_MAXRESULT=4g SPARK_GRAFT_JAVA_OPTS=-Dspark.cleaner.periodicGC.interval=90s"
SKIP_ALL=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed,cluster-seeds,curation-seeds,vacuum

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery2.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery2.log"
}

# B1: generate the corpus (untimed setup; deterministic)
if [ ! -d "$SF/embeddings.parquet" ]; then
  run gen_sf300sub env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
    tools/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 "$SF" 3000 documents,embeddings
fi

# B2: seed t55 only (untimed; stamped)
run seed_t55 env $DIALS_ENV SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.SeedLifecycle "$SF" t55

# B3/B4: t55 first advance, then replay (both timed, PASSES=1)
for arm in first replay; do
  run t55_$arm env $DIALS_ENV SPARK_GRAFT_CC_LOG=1 \
    SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
    SPARK_GRAFT_SKIP_WARM=$SKIP_ALL \
    SPARK_GRAFT_BENCH_OUT="$OUT/t55_offfit_$arm.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/t55_offfit_${arm}_headline.json" \
    tools/run_main.sh graft.Bench
done

# B5: retire t55's warehouse before t42 seeds (disk protocol)
T55WH=$(ls -td /tmp/graft_index_root_*/t55_increment 2>/dev/null | head -1)
if [ -n "$T55WH" ] && [ -d "$T55WH" ]; then
  echo "=== retiring $T55WH ($(du -sh "$T55WH" | cut -f1)) ===" | tee -a "$OUT/battery2.log"
  rm -rf "$T55WH"
fi

# B6/B7: t42 first advance + replay via CurProfile (stage tables; seed
# is CurProfile's own untimed ensure-seeded stage)
run t42_first env $DIALS_ENV SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.CurProfile "$SF" t42
run t42_replay env $DIALS_ENV SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.CurProfile "$SF" t42

echo "=== battery phase 2 complete $(date +%T) ===" | tee -a "$OUT/battery2.log"
