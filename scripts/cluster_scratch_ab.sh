#!/bin/bash
# A/B scratch-high-water measurement: the same per-query sf10 Verify
# dump under (a) one local[32] JVM and (b) local-cluster[2,8,24g] real
# executor JVMs with their own shuffle dirs — the instrument behind
# SCALING.md r12's multi-executor validation (r11 verdict item 2).
# Per query and mode: fresh scratch dir, own JVM(s), du sampled every
# 3 s, one "RESULT mode query wall_s highwater_KB" line. Sampling
# granularity caveat: a spill burst living <3 s can under-report the
# true peak — fine for the multi-GB shuffle accumulation this measures
# (which persists for whole stages), not for micro-spills.
# Usage: cluster_scratch_ab.sh <sfDir> <outRoot> <mode:sj|lcl> <query...>
set -u
SF=$1; ROOT=$2; MODE=$3; shift 3
ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect \
    java.io java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
    sun.security.action sun.util.calendar; do
  printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"; done)
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
for Q in "$@"; do
  SCR="$ROOT/scratch-$MODE-$Q"; OUT="$ROOT/out-$MODE-$Q"
  rm -rf "$SCR" "$OUT"; mkdir -p "$SCR"
  ( HW=0
    while :; do
      KB=$(du -sk "$SCR" 2>/dev/null | awk '{print $1+0}')
      [ "${KB:-0}" -gt "$HW" ] && HW=$KB && echo "$HW" > "$SCR.hw"
      sleep 3
    done ) & W=$!
  T0=$(date +%s)
  if [ "$MODE" = sj ]; then
    java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Dspark.local.dir="$SCR" \
      -cp "$CP" graft.Verify "$SF" "$OUT" "$Q" \
      > "$ROOT/log-$MODE-$Q.txt" 2>&1
  else
    # real executor JVMs: 2 workers x 8 cores x 24 GiB; classes and
    # the JDK17 opens must reach the executor command lines
    SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    SPARK_GRAFT_MASTER='local-cluster[2,8,24576]' \
    java $ADD_OPENS -Xmx16g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Dspark.local.dir="$SCR" \
      -Dspark.executor.memory=22g \
      -Dspark.executor.extraClassPath=/root/repo/target/scala-2.13/classes \
      -Dspark.executor.extraJavaOptions="$ADD_OPENS" \
      -cp "$CP" graft.Verify "$SF" "$OUT" "$Q" \
      > "$ROOT/log-$MODE-$Q.txt" 2>&1
  fi
  RC=$?; T1=$(date +%s)
  kill $W 2>/dev/null
  echo "RESULT $MODE $Q rc=$RC wall=$((T1-T0))s highwater=$(cat "$SCR.hw" 2>/dev/null || echo 0)KB"
  rm -rf "$SCR" "$SCR.hw"
done
