#!/bin/bash
# Run a graft main against the sbt-compiled classes without taking the
# sbt lock (lets corpus builds / Verify runs proceed while `sbt test`
# holds the project). Usage: tools/run_main.sh graft.Verify <args...>
# Env passes through (SPARK_GRAFT_SF_DIR etc.). Requires a prior
# `sbt compile` — this runs whatever is in target/scala-2.13/classes.
# Heap: GRAFT_XMX overrides; default adapts to the machine (r16 advice:
# a hardcoded -Xmx96g fails or thrashes on smaller hosts) — 60% of RAM
# capped at 96g, floor 2g.
if [ -z "$GRAFT_XMX" ]; then
  mem_kb=$(awk '/MemTotal/{print $2}' /proc/meminfo 2>/dev/null || echo 8388608)
  mem_g=$(( mem_kb * 6 / 10 / 1048576 ))
  [ "$mem_g" -gt 96 ] && mem_g=96
  [ "$mem_g" -lt 2 ] && mem_g=2
  GRAFT_XMX="${mem_g}g"
fi
SPARK_JARS_DIR="${SPARK_JARS_DIR:-/opt/spark/jars}"
exec java \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Xmx"$GRAFT_XMX" \
  -cp "$(dirname "$0")/../target/scala-2.13/classes:$SPARK_JARS_DIR/*" \
  "$@"
