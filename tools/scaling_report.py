#!/usr/bin/env python3
"""Aggregate ScalingBench JSONL logs into per-level minima + efficiency.

Usage: python3 tools/scaling_report.py <log.jsonl> [...]

Groups runs by (docs, cores); reports per-level best wall / throughput,
all raw repeats, cpuSec where present, and pairwise N->4N efficiency
(thB/thA)/(coresB/coresA) between every 4x-apart core pair at the same
doc count. Protocol per BENCH/BASELINE.md: per-level minimum across
interleaved repeats — the engine's scaling, not the host's weather.
"""
import json
import sys
from collections import defaultdict

runs = defaultdict(list)  # (docs, cores) -> [dict]
for path in sys.argv[1:]:
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "cores" in d:
            runs[(d["docs"], d["cores"])].append(d)

print(f"{'docs':>9} {'cores':>5} {'n':>2} {'best s':>8} {'best d/s':>9} "
      f"{'cpu@best':>8} {'raw secs':<40}")
best = {}
for (docs, cores), rs in sorted(runs.items()):
    b = min(rs, key=lambda r: r["sec"])
    best[(docs, cores)] = b
    raws = ",".join(f"{r['sec']:.0f}" for r in sorted(rs, key=lambda r: r['sec']))
    cpu = f"{b.get('cpuSec', float('nan')):.0f}" if 'cpuSec' in b else "-"
    print(f"{docs:>9} {cores:>5} {len(rs):>2} {b['sec']:>8.2f} "
          f"{b['docsPerSec']:>9.1f} {cpu:>8} [{raws}]")

print()
for (docs, ca) in sorted(best):
    cb = ca * 4
    if (docs, cb) in best:
        a, b = best[(docs, ca)], best[(docs, cb)]
        eff = (b["docsPerSec"] / a["docsPerSec"]) / 4
        cpu_note = ""
        if "cpuSec" in a and "cpuSec" in b:
            infl = b["cpuSec"] / a["cpuSec"]
            ua = a["cpuSec"] / (ca * a["sec"])
            ub = b["cpuSec"] / (cb * b["sec"])
            cpu_note = (f"  cpu-inflation {infl:.2f}x, slot-util "
                        f"{ua:.2f}->{ub:.2f}")
        print(f"docs {docs}: {ca}->{cb} cores  eff {eff:.3f}"
              f"  ({a['docsPerSec']:.0f} -> {b['docsPerSec']:.0f} d/s){cpu_note}")
