#!/bin/bash
# Order-permutation experiment (VERDICT r13 task #2): the same code,
# the same sf0.1 data, three full-surface sweeps back-to-back in three
# query orders. If inflation follows sweep POSITION -> cumulative JVM
# state; if it follows the QUERY -> stale budgets.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
for spec in forward reverse shuffled:20260816; do
  tag=${spec/:/_}
  echo "=== sweep order=$spec $(date +%T) ===" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_ORDER=$spec \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_order_$tag.json \
  java $AO -Xmx32g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench > /tmp/bench_order_$tag.stdout 2> /tmp/bench_order_$tag.stderr
  echo "=== done order=$spec rc=$? $(date +%T) ===" >&2
done
