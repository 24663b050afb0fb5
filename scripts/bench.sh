#!/usr/bin/env bash
# Launch graft.Bench exactly as `sbt run` would (same JVM flags as
# build.sbt) but without sbt's startup overhead, for baseline recording.
#   SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
#   SPARK_GRAFT_ONLY    comma-separated query subset (optional)
#   SPARK_DRIVER_MEM    heap (default 8g — measured faster than 48g)
# Usage: scripts/bench.sh            # full suite, one JSON line on stdout
#        SPARK_GRAFT_ONLY=q32_ml_metrics scripts/bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  --add-modules=jdk.incubator.vector \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Duser.timezone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
