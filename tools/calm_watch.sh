#!/bin/bash
# Watch for a calm host window, then fire the scaling measurement.
# Canary: wall time of a fixed 32-way CPU busy loop (python). On a quiet
# 32-core host it takes ~2.5-4 s; under the observed steal/throttle it
# takes 3-10x longer. When two consecutive canaries come in under the
# threshold, launch the measurement and exit.
set -u
THRESH=${CALM_THRESH:-5.0}   # seconds
CMD=${1:?measurement command}
OUT=${2:?log file}
canary() {
  python3 - <<'EOF'
import multiprocessing as mp, time
def burn(_):
    s = 0
    for i in range(6_000_000):
        s += i * i
    return s
t0 = time.time()
with mp.Pool(32) as p:
    p.map(burn, range(32))
print(f"{time.time()-t0:.2f}")
EOF
}
ok=0
while true; do
  c=$(canary)
  echo "$(date +%H:%M:%S) canary=${c}s" >> "$OUT"
  if python3 -c "import sys; sys.exit(0 if float('$c') < $THRESH else 1)"; then
    ok=$((ok+1))
  else
    ok=0
  fi
  if [ "$ok" -ge 2 ]; then
    echo "$(date +%H:%M:%S) calm window — launching measurement" >> "$OUT"
    bash -c "$CMD" >> "$OUT" 2>&1
    echo "$(date +%H:%M:%S) measurement finished" >> "$OUT"
    exit 0
  fi
  sleep 120
done
