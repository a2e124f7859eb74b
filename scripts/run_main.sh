#!/usr/bin/env bash
# Launch a graft main class directly on the compiled classes + Spark jars,
# bypassing sbt (so tests can run concurrently). Usage:
#   scripts/run_main.sh graft.Bench [args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
CP="$CLASSES:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.local.dir="${SPARK_GRAFT_LOCAL_DIR:-/tmp}" \
  -cp "$CP" "$@"
