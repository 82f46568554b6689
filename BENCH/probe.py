#!/usr/bin/env python3
"""16-process CPU probe used to bracket scaling-bench runs (BENCH/BASELINE.md).

Prints total wall and per-process seconds for a fixed deterministic burn.
"Clean" window = wall close to the best reading recorded in BASELINE.md;
a slow probe (>1.5x) means the host is contended and the bracketed run is
not comparable. NOTE (round 3): the converse does not hold — the host has
a throttle mode these short probes do not detect; use the pipeline's
deterministic span_wall_ms as the in-run throttle index.
"""
import multiprocessing as mp
import sys
import time


def burn(_):
    t = time.time()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.time() - t


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    t0 = time.time()
    with mp.Pool(n) as p:
        per = p.map(burn, range(n))
    wall = time.time() - t0
    print(f"probe n={n} wall={wall:.2f}s per-proc avg={sum(per)/len(per):.2f}s max={max(per):.2f}s")
