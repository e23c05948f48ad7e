#!/usr/bin/env bash
# Run a graft main class on the compiled classes + /opt/spark/jars
# classpath without going through sbt (so long-running data gens and
# bench sweeps don't contend for the sbt project lock).
#
# Usage: tools/runmain.sh [-Xmx...] graft.DataGen localdata/sf3 3.0
set -euo pipefail
cd "$(dirname "$0")/.."
XMX="-Xmx48g"
if [[ "${1:-}" == -Xmx* ]]; then XMX="$1"; shift; fi
exec java $XMX \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dderby.system.home=/tmp/derby \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
