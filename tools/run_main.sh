#!/usr/bin/env bash
# Launch a graft main with plain java — no sbt lock, so long-running
# background gates (sf1 Verify, adversarial corpus, oracle dumps) can run
# concurrently with interactive sbt work. Mirrors build.sbt's forked-JVM
# options (JDK17 --add-opens, UTC, code cache) exactly.
#
#   sbt -batch package                  # once per source change
#   tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/out [filter]
#   GRAFT_JAVA_OPTS="-Dgraft.checkpointMode=stage" tools/run_main.sh graft.Bench
set -euo pipefail
cd "$(dirname "$0")/.."
JAR=$(ls -t target/scala-2.13/snowflakeemulatorspark_2.13-*.jar 2> /dev/null | head -1)
[ -n "$JAR" ] || { echo "[run_main] no jar — run: sbt -batch package" >&2; exit 1; }
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# shellcheck disable=SC2086
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-16g}" \
  -XX:ReservedCodeCacheSize=512m \
  ${GRAFT_JAVA_OPTS:-} \
  -cp "$JAR:/opt/spark/jars/*" "$@"
