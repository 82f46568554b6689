#!/bin/bash
# 450k-page N-vs-4N scaling pair, probe-bracketed, one JVM per cluster size.
# Usage: run_pair.sh <tag> [extra env assignments...]
set -u
cd /root/repo
TAG=$1; shift
LOG=/root/repo/BENCH/r5/${TAG}.log
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_VARIANTS=29 SPARK_GRAFT_EXPAND=8 SPARK_GRAFT_REPLICATE=3
for kv in "$@"; do export "$kv"; done
metrics() { for d in /tmp/graft_scaling_c*; do
  [ -f "$d/metrics.json" ] && { echo "[metrics $d]"; cat "$d/metrics.json"; echo; }; done; }
{
echo "=== tag=$TAG $(date -u +%FT%TZ) git=$(git rev-parse --short HEAD) env: $*"
echo "--- probe pre-lo"; python3 BENCH/probe.py 16
echo "--- lo 1x4 start $(date -u +%FT%TZ)"
sbt -batch 'runMain graft.ScalingBench once 1 4' 2>&1 | grep -E '"mode"|\[scaling|error'
metrics; rm -rf /tmp/graft_scaling_c*
echo "--- probe mid"; python3 BENCH/probe.py 16
echo "--- hi 4x4 start $(date -u +%FT%TZ)"
sbt -batch 'runMain graft.ScalingBench once 4 4' 2>&1 | grep -E '"mode"|\[scaling|error'
metrics; rm -rf /tmp/graft_scaling_c*
echo "--- probe post"; python3 BENCH/probe.py 16
echo "=== done $(date -u +%FT%TZ)"
} >> "$LOG" 2>&1
