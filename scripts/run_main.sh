#!/bin/bash
# Run a graft main class directly against the compiled classes + the
# image's Spark jars, bypassing sbt (no project-lock contention, so a
# long ScaleBench run can overlap local iteration). Mirrors build.sbt's
# forked-run JVM flags exactly.
#
# Usage: SPARK_DRIVER_MEM=48g scripts/run_main.sh graft.ScaleBench <args...>
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MAIN="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=" --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$REPO/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
