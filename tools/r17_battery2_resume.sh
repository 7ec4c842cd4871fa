#!/bin/bash
# Round-17 battery phase 2 RESUME — the 48 GB arms died of Java heap
# OOM at the 3M-vector FIRST ADVANCE (stage-242 executor OOM killed the
# context): the advance pins TWO corpus-scale cuts (pruned settled
# index + batch coding, ~13 GB each at 3M×9 rows) where the seed's
# self-probe holds one, plus par 8 slice broadcasts — past 48 GB. The
# heap term is the finding (memory breaks before disk at this box
# class); the arms resume at 80 GB, same dials, same frozen classes.
# Extra arms vs the original script: a NEW-classes t55 replay and t42
# replay, back-to-back on the same cache as their old-classes twins —
# the round-17 optimization A/B (empty-index collapse, tbl-0 slice
# vectors, ingest emb-branch overlap) at the 6M off-fit point.
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=/tmp/r17
mkdir -p "$OUT"
OLD_CLASSES=/tmp/r17_classes
NEW_CLASSES=/tmp/r17_classes_new
rm -rf "$NEW_CLASSES"
cp -a target/scala-2.13/classes "$NEW_CLASSES"

SF=target/testdata/sf300sub
DIALS_ENV="SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=80g SPARK_GRAFT_LSH_BITS=20 SPARK_GRAFT_BAND_BITS=18 SPARK_DRIVER_MAXRESULT=4g SPARK_GRAFT_JAVA_OPTS=-Dspark.cleaner.periodicGC.interval=90s"
SKIP_ALL=ivf-lists,attr-lists,cattr-lists,pq,rarity-vocab,ngram-lm,assets,t46-seed,t48-seed,cluster-seeds,curation-seeds,vacuum

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery2.log"
  ( "$@" ) >"$OUT/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%T) free=$(df --output=avail -BG / | tail -1 | tr -d ' G')G ===" | tee -a "$OUT/battery2.log"
}

t55bench() { # $1 = arm name, $2 = classes dir
  run "$1" env $DIALS_ENV GRAFT_CLASSES="$2" SPARK_GRAFT_CC_LOG=1 \
    SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_PASSES=1 \
    SPARK_GRAFT_ONLY=t55_banded_cluster_increment \
    SPARK_GRAFT_SKIP_WARM=$SKIP_ALL \
    SPARK_GRAFT_BENCH_OUT="$OUT/$1.json" \
    SPARK_GRAFT_BENCH_HEADLINE="$OUT/${1}_headline.json" \
    tools/run_main.sh graft.Bench
}

# B3/B4 resume: first advance then replay (old classes = the model test)
t55bench t55_offfit_first "$OLD_CLASSES"
t55bench t55_offfit_replay "$OLD_CLASSES"
# optimization A/B: new classes on the warmed cache
t55bench t55_offfit_replay_new "$NEW_CLASSES"

# B5: retire t55's warehouse before t42 seeds (disk protocol)
T55WH=$(ls -td /tmp/graft_index_root_*/t55_increment 2>/dev/null | head -1)
if [ -n "$T55WH" ] && [ -d "$T55WH" ]; then
  echo "=== retiring $T55WH ($(du -sh "$T55WH" | cut -f1)) ===" | tee -a "$OUT/battery2.log"
  rm -rf "$T55WH"
fi

# B6/B7: t42 first advance + replay via CurProfile (old classes), then
# the new-classes replay (overlap + slice-vector A/B, same cache)
run t42_first env $DIALS_ENV GRAFT_CLASSES="$OLD_CLASSES" SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.CurProfile "$SF" t42
run t42_replay env $DIALS_ENV GRAFT_CLASSES="$OLD_CLASSES" SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.CurProfile "$SF" t42
run t42_replay_new env $DIALS_ENV GRAFT_CLASSES="$NEW_CLASSES" SPARK_GRAFT_CC_LOG=1 \
  tools/run_main.sh graft.tools.CurProfile "$SF" t42

echo "=== battery phase 2 resume complete $(date +%T) ===" | tee -a "$OUT/battery2.log"
