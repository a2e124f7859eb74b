#!/usr/bin/env bash
# Memory-bandwidth counter-experiment (BENCH.md "what limits single-box
# strong scaling"): run the identical LP+PR workload
#   (1) solo at local[8],
#   (2) as TWO CONCURRENT local[8] JVMs (16 of 32 cores busy),
# and compare per-superstep medians. If each concurrent run slows vs solo
# while half the cores are idle, the shared memory channels — not the
# engine — bound single-box scaling; a real N→4N executor scale-out adds
# channels with cores, which local[N]→local[4N] cannot.
# Usage: scripts/bandwidth_probe.sh [nodes] [reps]
set -euo pipefail
cd "$(dirname "$0")/.."
NODES="${1:-4000000}"
REPS="${2:-1}"
export SPARK_GRAFT_BENCH_NODES="$NODES" SPARK_GRAFT_REPS="$REPS" SPARK_GRAFT_CPUS=8

echo "== solo local[8] ==" >&2
SPARK_GRAFT_TAG=solo SPARK_DRIVER_MEM=24g \
  scripts/run_main.sh graft.tools.OneLevelBench 2>/dev/null

echo "== two concurrent local[8] ==" >&2
SPARK_GRAFT_TAG=pair_a SPARK_DRIVER_MEM=24g SPARK_GRAFT_LOCAL_DIR=/tmp/bwa \
  scripts/run_main.sh graft.tools.OneLevelBench 2>/dev/null &
PID_A=$!
SPARK_GRAFT_TAG=pair_b SPARK_DRIVER_MEM=24g SPARK_GRAFT_LOCAL_DIR=/tmp/bwb \
  scripts/run_main.sh graft.tools.OneLevelBench 2>/dev/null &
PID_B=$!
wait "$PID_A" "$PID_B"
