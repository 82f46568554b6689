#!/bin/bash
# Interleaved A/B bench runner for round 6 (same protocol class as the r5
# series: probe-bracketed, alternating binaries within one host window, min
# over pairs decides). A = /tmp/classes_base (round-5 HEAD), B =
# /tmp/classes_opt (working tree). One pair = A bench + B bench, each a
# full graft.Bench run (min_of_2 inside).
# Usage: ab_bench.sh <npairs> [logfile]
set -u
cd /root/repo
N=${1:-3}
LOG=${2:-/root/repo/BENCH/r6/ab_bench.log}
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
run_one() { # $1 = classes dir, $2 = tag
  java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1:/opt/spark/jars/*" graft.Bench 2>/dev/null | tail -1 | sed "s/^/[$2] /"
}
{
echo "=== ab_bench pairs=$N $(date -u +%FT%TZ) git=$(git rev-parse --short HEAD)"
for i in $(seq 1 "$N"); do
  echo "--- pair $i probe: $(python3 BENCH/probe.py 16)"
  run_one /tmp/classes_base A
  run_one /tmp/classes_opt  B
done
echo "--- post probe: $(python3 BENCH/probe.py 16)"
echo "=== done $(date -u +%FT%TZ)"
} >> "$LOG" 2>&1
