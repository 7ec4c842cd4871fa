#!/bin/bash
# Regenerate the scaled corpora lost with the session restart, then run battery2.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r13
{
  echo "=== gen sf1.0 start $(date +%T)"
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    tools/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 target/testdata/sf1.0 10 \
    > /tmp/r13/gen_sf1.log 2>&1
  echo "=== gen sf1.0 rc=$? $(date +%T)"
  echo "=== gen sf10sub start $(date +%T)"
  env SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
    tools/run_main.sh graft.tools.ScaleData /root/testdata/sf0.1 target/testdata/sf10sub 100 documents,embeddings \
    > /tmp/r13/gen_sf10sub.log 2>&1
  echo "=== gen sf10sub rc=$? $(date +%T)"
  bash tools/r13_battery2.sh
} >> /tmp/r13/prep.log 2>&1
