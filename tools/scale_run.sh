#!/bin/bash
# run a graft main against the SNAPSHOT classes (isolated from src edits)
# Run a graft main against a CLASS SNAPSHOT (default /tmp/graftcp, override
# with GRAFT_CLASSES) so SCALE measurements never recompile mid-protocol.
# Usage: tools/scale_run.sh graft.Bench   (env: SPARK_GRAFT_* as usual)
MAIN=$1; shift
exec java -Xmx${GRAFT_XMX:-32g} \
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
  -Dio.netty.tryReflectionSetAccessible=true \
  -cp "${GRAFT_CLASSES:-/tmp/graftcp}:/opt/spark/jars/*" "$MAIN" "$@"
