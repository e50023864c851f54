#!/usr/bin/env bash
# Run a graft.* main directly on the compiled classes + the image's Spark
# jars — no sbt startup and no sbt project-lock contention, so plan dumps
# and profiling runs can overlap an sbt-driven verify. Compile first
# (`sbt -batch compile`); this script does NOT recompile.
# Usage: tools/graftrun.sh graft.Explain [args...]   (env vars pass through)
set -euo pipefail
MAIN="$1"; shift || true
CP="/root/repo/target/scala-2.13/classes:$(ls -d /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=(
  java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect
  java.base/java.io java.base/java.net java.base/java.nio java.base/java.util
  java.base/java.util.concurrent java.base/java.util.concurrent.atomic
  java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action
  java.base/sun.util.calendar
)
OPENS=()
for p in "${ADD_OPENS[@]}"; do OPENS+=(--add-opens "$p=ALL-UNNAMED"); done
exec java "${OPENS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$MAIN" "$@"
