#!/bin/bash
# Launch graft.ClusterScalingBench (local-cluster executor-axis scaling
# evidence) with a direct java invocation. Going through `sbt runMain` fails:
# the forked JVM's environment loses SPARK_HOME, and the standalone Worker's
# executor launcher additionally needs SPARK_SCALA_VERSION (normally set by
# bin/load-spark-env.sh) or it dies with "Cannot find any build directories".
# Usage: tools/run_cluster_bench.sh [nDocs] [lines] [skew] [reps] [nExecLo]
#        [nExecHi] [coresPerExec] [memPerExecMb]     (after `sbt package`)
set -e
cd "$(dirname "$0")/.."
export SPARK_HOME=${SPARK_HOME:-/opt/spark}
export SPARK_SCALA_VERSION=2.13
ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADDOPENS -Xmx8g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/ifctordfspark_2.13-0.1.0.jar:$SPARK_HOME/jars/*" \
  graft.ClusterScalingBench "$@"
