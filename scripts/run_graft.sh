#!/bin/bash
# Run a graft main class straight from the compiled classes directory —
# no sbt involvement, so long scale jobs don't hold the project lock.
# Usage: MEM=48g CPUS=32 scripts/run_graft.sh graft.ScaleUp <args...>
set -euo pipefail
MEM="${MEM:-8g}"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx"$MEM" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp /root/repo/target/scala-2.13/classes:'/opt/spark/jars/*' "$@"
