#!/usr/bin/env python
"""Host-regime calibration probe (round-5 verdict item 1, adapted to the
frozen-bench constraint: bench.py cannot change this round, so the probe
lives here and its reading is recorded NEXT TO each ledger/bench entry).

Two fixed single-process workloads whose absolute times depend only on
the host's CPU + memory-bandwidth regime, never on repo code:

* mem_bw_gbps  — big-array copy bandwidth (the shared host's documented
  failure mode is a noisy-neighbor memory-bandwidth wall; this is the
  direct signal).
* cpu_hash_s   — a pinned-seed single-core integer hash fold (pure ALU;
  distinguishes "CPU stolen" from "bandwidth stolen").

Healthy readings observed on this sandbox: mem_bw ≳ 9 GB/s, cpu_hash
≲ 1.3 s. Readings far off mark a depressed regime: bench numbers taken
then understate the engine and must not be compared across regimes.

Usage: python tools/regime_probe.py   -> one JSON line
"""
from __future__ import annotations

import json
import time

import numpy as np


def mem_bw() -> float:
    a = np.empty(256 * 1024 * 1024 // 8, dtype=np.int64)  # 256 MB
    a[:] = 1
    b = np.empty_like(a)
    # warm
    np.copyto(b, a)
    t0 = time.perf_counter()
    n = 8
    for _ in range(n):
        np.copyto(b, a)
    dt = time.perf_counter() - t0
    # copy reads + writes 256 MB each pass
    return (2 * 256 / 1024) * n / dt  # GB/s


def cpu_hash() -> float:
    t0 = time.perf_counter()
    h = 0x9E3779B97F4A7C15
    for i in range(5_000_000):
        h = (h ^ i) * 0xBF58476D1CE4E5B9 % (1 << 64)
    return time.perf_counter() - t0


if __name__ == "__main__":
    print(
        json.dumps(
            {
                "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
                "mem_bw_gbps": round(mem_bw(), 2),
                "cpu_hash_s": round(cpu_hash(), 3),
            }
        )
    )
