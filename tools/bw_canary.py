#!/usr/bin/env python3
"""Memory-bandwidth canary: per-core streaming throughput at N workers.

Attribution tool for the scaling measurements (BENCH/BASELINE.md): if
per-worker bandwidth drops as workers increase, the host's shared memory
controller — not the engine — is inflating per-core CPU time at higher
parallelism. A real N->4N *executor* scale-up adds sockets/nodes (each
with its own memory controller), so that component does not transfer.

Usage: python3 tools/bw_canary.py [workers ...]   (default: 1 2 8 32)
"""
import multiprocessing as mp
import sys
import time

import numpy as np

ARR_MB = 256
REPS = 6


def stream(_):
    a = np.ones(ARR_MB * 1024 * 1024 // 8, dtype=np.float64)
    t0 = time.time()
    s = 0.0
    for _ in range(REPS):
        s += float(a.sum())  # streaming read of ARR_MB per rep
    dt = time.time() - t0
    return (ARR_MB * REPS / 1024.0) / dt  # GB/s per worker


def main():
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    for n in counts:
        with mp.Pool(n) as p:
            per = p.map(stream, range(n))
        print(
            f'{{"workers":{n},"per_worker_gbps":{sum(per)/n:.2f},'
            f'"total_gbps":{sum(per):.2f}}}'
        )


if __name__ == "__main__":
    main()
