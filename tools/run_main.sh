#!/bin/bash
# Run a graft main against the sbt-compiled classes without taking the
# sbt lock (lets corpus builds / Verify runs proceed while `sbt test`
# holds the project). Usage: tools/run_main.sh graft.Verify <args...>
# Env passes through (SPARK_GRAFT_SF_DIR etc.). Requires a prior
# `sbt compile` — this runs whatever is in target/scala-2.13/classes.
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
  -Xmx96g \
  -cp "$(dirname "$0")/../target/scala-2.13/classes:/opt/spark/jars/*" \
  "$@"
