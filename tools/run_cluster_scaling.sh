#!/bin/bash
# N vs 4N EXECUTORS on a local standalone Spark cluster — the literal
# north-rule form ("spark-submit on a multi-executor cluster at N and 4N
# executors"). One Worker advertises 16 cores; spark.cores.max selects
#   N  = 1 executor  × 4 cores ( 4 total)
#   4N = 4 executors × 4 cores (16 total)
# Each executor is its own JVM with its own heap and shuffle server — the
# real multi-executor memory topology (local[N] shares one heap/allocator
# across all task threads, which a cluster does not).
#
# Usage: tools/run_cluster_scaling.sh <docs> <repeats> <outlog>
set -u
DOCS=$1; REPS=$2; OUT=$3
SPARK=/opt/spark
JAR=/root/repo/target/scala-2.13/dedupspark_2.13-0.1.0.jar
MASTER=spark://localhost:7077

export SPARK_LOCAL_DIRS=/dev/shm/spark-local
export SPARK_MASTER_HOST=localhost
export SPARK_LOG_DIR=/tmp/spark-cluster-logs
export SPARK_WORKER_DIR=/tmp/spark-cluster-work

cleanup() {
  "$SPARK/sbin/stop-worker.sh" >/dev/null 2>&1
  "$SPARK/sbin/stop-master.sh" >/dev/null 2>&1
}
trap cleanup EXIT
cleanup
"$SPARK/sbin/start-master.sh" >/dev/null 2>&1
sleep 3
SPARK_WORKER_CORES=16 SPARK_WORKER_MEMORY=64g "$SPARK/sbin/start-worker.sh" "$MASTER" >/dev/null 2>&1
sleep 3

run() { # total_cores
  local CORES=$1
  echo "== executors $((CORES / 4))x4c $(date +%H:%M:%S) ==" >> "$OUT"
  SPARK_GRAFT_MASTER=$MASTER "$SPARK/bin/spark-submit" \
    --master "$MASTER" \
    --class dedup.ScalingBench \
    --driver-memory 8g \
    --conf spark.executor.cores=4 \
    --conf spark.executor.memory=12g \
    --conf spark.cores.max="$CORES" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    "$JAR" "$DOCS" "$CORES" "$CORES" 2>/dev/null | grep -E "^\{" >> "$OUT"
}

for i in $(seq 1 "$REPS"); do
  run 4
  run 16
done
echo "== done $(date +%H:%M:%S) ==" >> "$OUT"
