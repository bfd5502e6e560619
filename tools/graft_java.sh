#!/bin/bash
# java launcher for graft mains outside sbt/spark-submit: replays the
# JVM flags build.sbt gives forked runs (JDK17 module opens that Spark
# needs — Kryo state encoders die without java.nio open — plus the
# code-cache sizing the bench protocol depends on). Heap via
# SPARK_DRIVER_MEM (default 16g, matching the driver).
#
# Usage: tools/graft_java.sh <classpath> <mainClass> [args...]
#   e.g. tools/graft_java.sh "target/scala-2.13/classes:/opt/spark/jars/*" \
#          graft.Verify /root/testdata/sf0.1 /tmp/out
set -euo pipefail
CP="$1"; shift
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=("--add-opens=java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  FLAGS+=("--add-opens=java.base/$p=ALL-UNNAMED")
done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-16g}" \
  -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
  -cp "$CP" "$@"
