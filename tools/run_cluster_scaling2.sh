#!/bin/bash
# N vs 4N EXECUTORS on a local standalone Spark cluster — generalized:
#   tools/run_cluster_scaling2.sh <docs> <reps> <exec_cores> <coresA> <coresB> <outlog>
# e.g. "1000000 2 1 1 4 out.jsonl" = 1 executor×1c vs 4 executors×1c.
# Executor count = total_cores / exec_cores; each executor is its own JVM
# (own heap, shuffle server) — the real multi-executor topology.
# SPARK_GRAFT_SHUFFLE_PARTITIONS pins the partition count so both levels
# run the IDENTICAL physical plan; only the executor count differs.
set -u
DOCS=$1; REPS=$2; EXEC_CORES=$3; CORES_A=$4; CORES_B=$5; OUT=$6
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
SPARK_WORKER_CORES=$((CORES_B > CORES_A ? CORES_B : CORES_A)) \
  SPARK_WORKER_MEMORY=96g "$SPARK/sbin/start-worker.sh" "$MASTER" >/dev/null 2>&1
sleep 3

run() { # total_cores
  local CORES=$1
  echo "== executors $((CORES / EXEC_CORES))x${EXEC_CORES}c $(date +%H:%M:%S) ==" >> "$OUT"
  SPARK_GRAFT_MASTER=$MASTER \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=${SPARK_GRAFT_SHUFFLE_PARTITIONS:-16} \
  "$SPARK/bin/spark-submit" \
    --master "$MASTER" \
    --class dedup.ScalingBench \
    --driver-memory 8g \
    --conf spark.executor.cores="$EXEC_CORES" \
    --conf spark.executor.memory=12g \
    --conf spark.cores.max="$CORES" \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    "$JAR" "$DOCS" "$CORES" "$CORES" 2>/dev/null | grep -E "^\{" >> "$OUT"
}

for i in $(seq 1 "$REPS"); do
  run "$CORES_A"
  run "$CORES_B"
done
echo "== done $(date +%H:%M:%S) ==" >> "$OUT"
