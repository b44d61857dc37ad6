#!/bin/bash
# Run a graft main (Bench / probes) from a SNAPSHOT of the compiled
# classes, without holding the sbt project lock — so long ladder runs
# can proceed in the background while sbt keeps compiling/testing.
# Mirrors build.sbt's fork JVM exactly (add-opens, UTC, no UI, 8g heap
# unless SPARK_DRIVER_MEM overrides).
#
#   tools/run_main.sh graft.Bench [args...]          # env as usual
#
# The snapshot is refreshed from target/scala-2.13/classes at launch;
# recompiles during the run cannot mix class versions into it.
set -euo pipefail
MAIN="$1"; shift
# Sweep stale snapshots from prior runs (the EXIT trap can't fire for
# a killed java child, and leaked dirs accumulate in /tmp otherwise).
find /tmp -maxdepth 1 -name 'graft_classes_*' -mmin +120 -exec rm -rf {} + 2>/dev/null || true
SNAP=$(mktemp -d /tmp/graft_classes_XXXX)
trap 'rm -rf "$SNAP"' EXIT
cp -r /root/repo/target/scala-2.13/classes/. "$SNAP"/

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent \
         java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

# Run java as a child (not exec) so the EXIT trap fires and the
# snapshot is removed; forward the child's exit code.
java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$SNAP:/opt/spark/jars/*" \
  "$MAIN" "$@"
