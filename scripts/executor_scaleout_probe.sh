#!/usr/bin/env bash
# Deployment-shaped N → 4N evidence: the north rule compares N vs 4N
# EXECUTORS (separate JVMs), which local[8] → local[32] can only proxy —
# one fat JVM adds intra-JVM contention (GC, shared scheduler/cache
# structures) that a real executor scale-out does not share (BENCH.md
# round-3 two-JVM counter-experiment). This probe runs the identical
# LP+PR workload
#   (1) solo at local[8]                        — "N executors",
#   (2) as FOUR CONCURRENT local[8] JVMs        — "4N executors"
#       (all 32 cores busy, one JVM per 8 cores, separate spark.local.dirs),
# and compares per-superstep medians. Per-JVM slowdown of (2) vs (1) is the
# only contention a 4×-executor scale-out of this engine would see on
# 4 such boxes; aggregate scaling efficiency = solo_med / concurrent_med
# (each JVM does the FULL job, so per-JVM parity = 4× aggregate throughput).
# Usage: scripts/executor_scaleout_probe.sh [nodes] [reps]
set -euo pipefail
cd "$(dirname "$0")/.."
NODES="${1:-4000000}"
REPS="${2:-1}"
export SPARK_GRAFT_BENCH_NODES="$NODES" SPARK_GRAFT_REPS="$REPS" SPARK_GRAFT_CPUS=8

echo "== solo local[8] ==" >&2
SPARK_GRAFT_TAG=solo SPARK_DRIVER_MEM=24g \
  scripts/run_main.sh graft.tools.OneLevelBench 2>/dev/null

echo "== four concurrent local[8] (32/32 cores busy) ==" >&2
PIDS=()
for i in a b c d; do
  SPARK_GRAFT_TAG="quad_$i" SPARK_DRIVER_MEM=24g SPARK_GRAFT_LOCAL_DIR="/tmp/bw_$i" \
    scripts/run_main.sh graft.tools.OneLevelBench 2>/dev/null &
  PIDS+=($!)
done
wait "${PIDS[@]}"
