#!/bin/bash
# One-JVM-per-query 100x ScaleSmoke runner (round-15 harness shape:
# 24 threads, 48g heap, JDK-17 module opens, per-query GC inside
# ScaleSmoke.time). Usage: scale100.sh <outlog> <query1> [query2 ...]
# Env passthrough: SPARK_GRAFT_SHUFFLE_PARTITIONS (default = CPUS).
# pipefail: without it `java ... | tee` records tee's exit status and a
# crashed/OOM'd JVM logs as exit=0
set -u -o pipefail
OUT="$1"; shift
CPUS="${SPARK_GRAFT_CPUS:-24}"
HEAP="${SPARK_GRAFT_HEAP:-48g}"
BIG="${SPARK_GRAFT_BIG_DIR:-/tmp/graft_scale_big100}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for q in "$@"; do
  echo "=== $q $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
  SPARK_GRAFT_REPLICAS=100 SPARK_GRAFT_BIG_DIR="$BIG" \
  SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_SMOKE_ONLY="$q" \
  java -Xmx"$HEAP" $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.ScaleSmoke 2>>"$OUT.err" | tee -a "$OUT"
  echo "--- exit=$? $(date -u +%H:%M:%S)" | tee -a "$OUT"
done
