#!/bin/bash
# Run graft.Bench once on the ALREADY-COMPILED classes (plain java, no sbt)
# and copy the JSON line to the named output file. Usage:
#   scripts/bench_once.sh BENCH_LOCAL_r19_run1.json
# Launch detached (setsid) so it survives the caller; poll the .done marker.
set -u
OUT="${1:?output json path}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
LOG="/tmp/$(basename "$OUT" .json).log"
SPARK_GRAFT_SF_DIR="$SF" java \
  --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench > "$LOG" 2>&1
rc=$?
grep '"metric"' "$LOG" | tail -1 > "$OUT"
echo "$rc" > "$OUT.done"
