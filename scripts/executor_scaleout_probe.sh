#!/usr/bin/env bash
# Deployment-shaped N → 4N evidence: the north rule compares N vs 4N
# EXECUTORS (separate JVMs), which local[8] → local[32] can only proxy —
# one fat JVM adds intra-JVM contention (GC, shared scheduler/cache
# structures) that a real executor scale-out does not share (BENCH.md
# round-3 two-JVM counter-experiment). Thin wrapper over the canonical
# Scala protocol (graft.ScalingBench executors mode), which runs the
# identical LP+PR workload
#   (1) solo in one local[8] child JVM                  — "N executors",
#   (2) as FOUR CONCURRENT local[8] child JVMs          — "4N executors"
#       (all 32 cores busy, one JVM per 8 cores, separate heaps +
#       spark.local.dirs),
# hard-asserts per-vertex fingerprints identical across all five runs, and
# prints one JSON line with eff = Σ concurrent-tput / (4 × solo-tput).
# Usage: scripts/executor_scaleout_probe.sh [nodes] [reps]
set -euo pipefail
cd "$(dirname "$0")/.."
NODES="${1:-4000000}"
REPS="${2:-1}"
SPARK_GRAFT_SCALE_MODE=executors SPARK_GRAFT_SCALE_N=8 \
SPARK_GRAFT_BENCH_NODES="$NODES" SPARK_GRAFT_REPS="$REPS" \
  scripts/run_main.sh graft.ScalingBench
