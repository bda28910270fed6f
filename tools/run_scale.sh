#!/usr/bin/env bash
# Run the empirical scaling study (graft.ScaleBench) outside sbt.
# Mirrors build.sbt's forked-run JVM options (JDK17 add-opens, UTC, en_US).
# Usage: tools/run_scale.sh [factors]   e.g. tools/run_scale.sh 1,10,30
set -euo pipefail
cd "$(dirname "$0")/.."
FACTORS="${1:-1,10,30}"
ADD_OPENS=()
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS+=(--add-opens "$p=ALL-UNNAMED")
done
exec java "${ADD_OPENS[@]}" \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Duser.language=en -Duser.country=US \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ScaleBench "$FACTORS"
