#!/bin/bash
# Local-mode N vs 4N scaling measurement (BASELINE.md protocol) in the
# host's linear-frequency region: local[1] vs local[4], interleaved
# A/B/A/B in one pre-touched JVM (dedup.ScalingBench), per-run /proc/stat
# steal share recorded so every measurement is self-attributing.
#   tools/run_local_scaling_1v4.sh <docs> <outfile> [repeats]
set -u
DOCS=$1; OUT=$2; REPS=${3:-1}
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED"
for i in $(seq 1 "$REPS"); do
  echo "== repeat $i start $(date +%H:%M:%S) ==" >> "$OUT"
  java -Xms16g -Xmx16g -XX:+AlwaysPreTouch $OPENS -Dspark.ui.enabled=false \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    dedup.ScalingBench "$DOCS" 1 4 2>/dev/null | grep -E "^\{" >> "$OUT"
done
echo "== done $(date +%H:%M:%S) ==" >> "$OUT"
