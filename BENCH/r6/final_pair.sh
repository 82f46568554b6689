#!/bin/bash
# Round-6 final 450k scaling pair on the FINAL round-6 classes
# (streaming candidate cap + reps-view verify), probe-bracketed, one JVM
# per cluster size — the r5 run_pair.sh protocol.
set -u
cd /root/repo
LOG=/root/repo/BENCH/r6/final_pair.log
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_VARIANTS=29 SPARK_GRAFT_EXPAND=8 SPARK_GRAFT_REPLICATE=3
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
metrics() { for d in /tmp/graft_scaling_c*; do
  [ -f "$d/metrics.json" ] && { echo "[metrics $d]"; cat "$d/metrics.json"; echo; }; done; }
{
echo "=== final r6 pair $(date -u +%FT%TZ) git=$(git rev-parse --short HEAD)"
echo "--- probe pre-lo: $(python3 BENCH/probe.py 16)"
echo "--- lo 1x4 start $(date -u +%FT%TZ)"
java $AO -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.ScalingBench once 1 4 2>&1 | grep -E '"mode"|rror' | tail -2
metrics; rm -rf /tmp/graft_scaling_c*
echo "--- probe mid: $(python3 BENCH/probe.py 16)"
echo "--- hi 4x4 start $(date -u +%FT%TZ)"
java $AO -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.ScalingBench once 4 4 2>&1 | grep -E '"mode"|rror' | tail -2
metrics; rm -rf /tmp/graft_scaling_c*
echo "--- probe post: $(python3 BENCH/probe.py 16)"
echo "=== done $(date -u +%FT%TZ)"
} >> "$LOG" 2>&1
