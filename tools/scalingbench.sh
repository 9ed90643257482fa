#!/bin/bash
# Direct-JVM ScalingBench invocation (skips sbt startup; same JVM flags
# as build.sbt's fork options). Usage: scalingbench.sh <cores> <seeds>
#
# -XX:ActiveProcessorCount=<cores>: an N-core EXECUTOR runs its GC, JIT
# and IO pools on those same N cores. Without this, a local[2]
# measurement on a 32-hw-thread box silently parallelizes GC/JIT over
# all 32 threads, inflating the small configuration and understating
# N->4N scaling. Set GRAFT_APC=0 to disable (report both).
set -e
cd "$(dirname "$0")/.."
# fail fast on a nearly-full disk: a run that ENOSPCs mid-write leaves
# partial state and (historically) killed the round's driver artifacts
AVAIL_KB=$(df -kP /tmp | awk 'NR==2 {print $4}')
if [ "${AVAIL_KB:-0}" -lt 20971520 ]; then
  echo "scalingbench: <20 GB free on /tmp (${AVAIL_KB} KB) — aborting" >&2
  exit 1
fi
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
APC_FLAG="-XX:ActiveProcessorCount=${GRAFT_APC:-$1}"
if [ "${GRAFT_APC:-}" = "0" ]; then APC_FLAG="-XX:-UseContainerSupport"; APC_FLAG=""; fi
exec java $APC_FLAG \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" graft.ScalingBench "$@"
