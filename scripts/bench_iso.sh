#!/bin/bash
# Isolated micro-bench runner: direct java (no sbt startup) against the
# compiled classes. Usage:
#   scripts/bench_iso.sh <query[,query...]> <mult> <cpus> <runs> [sfdir]
# Prints the bench JSON lines to stdout. Compile first (sbt compile).
set -euo pipefail
Q="$1"; MULT="${2:-1}"; CPUS="${3:-8}"; RUNS="${4:-3}"
SF="${5:-/root/testdata/sf0.1}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
cd /root/repo
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_BENCH_MULT="$MULT" SPARK_GRAFT_BENCH_RUNS="$RUNS" \
SPARK_GRAFT_BENCH_ONLY="$Q" \
exec java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench
