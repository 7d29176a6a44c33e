#!/bin/bash
# Run a graft main class via plain `java` with the same JVM flags
# build.sbt gives forked runs (Spark 4 on JDK 17 needs the add-opens
# set when SparkSession is created outside spark-submit). Usage:
#   scripts/runjava.sh graft.Bench [args...]
# Env: SPARK_DRIVER_MEM (default 24g) sizes the heap like build.sbt.
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
         java.base/java.lang.reflect java.base/java.io java.base/java.net \
         java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs \
         java.base/sun.security.action java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-24g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
