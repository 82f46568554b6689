#!/bin/bash
# Round-6 450k-page scaling evidence, one session, probe-bracketed:
#  1) PipeProbe cluster 4x4 with round-5-HEAD classes  -> stage/shuffle A
#  2) PipeProbe cluster 4x4 with round-6 classes       -> stage/shuffle B
#  3) ScalingBench once 1x4 then once 4x4 (round-6)    -> efficiency pair
# Classes are rsynced into target/scala-2.13/classes because the
# local-cluster executors load spark.executor.extraClassPath=<that dir>.
# NEVER run sbt concurrently with this script.
set -u
cd /root/repo
LOG=/root/repo/BENCH/r6/scaling_session.log
export SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_VARIANTS=29 SPARK_GRAFT_EXPAND=8 SPARK_GRAFT_REPLICATE=3
export SPARK_GRAFT_CPUS=32
AO="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
swap() { rm -rf target/scala-2.13/classes && cp -r "$1" target/scala-2.13/classes; }
metrics() { for d in /tmp/graft_scaling_c* /tmp/graft_probe_*; do
  [ -f "$d/metrics.json" ] && { echo "[metrics $d]"; cat "$d/metrics.json"; echo; }; done; }
{
echo "=== scaling session $(date -u +%FT%TZ) git=$(git rev-parse --short HEAD)"
echo "--- probe: $(python3 BENCH/probe.py 16)"
echo "--- [1] PipeProbe cluster 4x4 BASE (round-5 HEAD classes)"
swap /tmp/classes_base; rm -rf /tmp/graft_probe_* /tmp/graft_scaling_c*
java $AO -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.tools.PipeProbe /root/testdata/sf0.1 cluster 4 4 2>/dev/null > BENCH/r6/probe450k_base.txt
tail -5 BENCH/r6/probe450k_base.txt; metrics; rm -rf /tmp/graft_probe_* /tmp/graft_scaling_c*
echo "--- probe: $(python3 BENCH/probe.py 16)"
echo "--- [2] PipeProbe cluster 4x4 OPT (round-6 classes)"
swap /tmp/classes_opt
java $AO -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.tools.PipeProbe /root/testdata/sf0.1 cluster 4 4 2>/dev/null > BENCH/r6/probe450k_opt.txt
tail -5 BENCH/r6/probe450k_opt.txt; metrics; rm -rf /tmp/graft_probe_* /tmp/graft_scaling_c*
echo "--- probe: $(python3 BENCH/probe.py 16)"
echo "--- [3] ScalingBench once 1 4 OPT $(date -u +%FT%TZ)"
java $AO -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.ScalingBench once 1 4 2>&1 | grep -E '"mode"|\[scaling|rror' | tail -3
metrics; rm -rf /tmp/graft_scaling_c*
echo "--- probe: $(python3 BENCH/probe.py 16)"
echo "--- [4] ScalingBench once 4 4 OPT $(date -u +%FT%TZ)"
java $AO -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.ScalingBench once 4 4 2>&1 | grep -E '"mode"|\[scaling|rror' | tail -3
metrics; rm -rf /tmp/graft_scaling_c*
echo "--- probe: $(python3 BENCH/probe.py 16)"
echo "=== done $(date -u +%FT%TZ)"
} >> "$LOG" 2>&1
