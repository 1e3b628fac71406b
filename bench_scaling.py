#!/usr/bin/env python
"""N→4N scaling evidence (BASELINE.md protocol): run the identical CDC
apply job at two local parallelism levels on the SAME input and report
throughput@N, throughput@4N and scaling efficiency = (tp4N/tpN)/4.

Local mode stands in for the two cluster sizes (no real cluster in this
sandbox); each level runs in its own JVM/process so the core count is
honored. Results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
N = int(os.environ.get("SCALE_N", "8"))
N4 = 4 * N


def run_at(cpus: int) -> dict:
    # scaling evidence only needs the CDC apply job; skip the operator suite
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), BENCH_SKIP_OPERATORS="1")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r_n = run_at(N)
    r_4n = run_at(N4)
    tp_n = r_n["cdc"]["events_per_sec"]
    tp_4n = r_4n["cdc"]["events_per_sec"]
    eff = round((tp_4n / tp_n) / 4, 3)
    summary = {
        "cores_n": N, "cores_4n": N4,
        "events_per_sec_n": tp_n, "events_per_sec_4n": tp_4n,
        "scaling_efficiency": eff,
        "n_log_records": r_n["cdc"]["n_log_records"],
    }
    print(json.dumps(summary))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Scaling run {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
            f"- input: {summary['n_log_records']} changefeed records "
            f"(BENCH_EVENTS={os.environ.get('BENCH_EVENTS', '400000')}, "
            f"hot-key {os.environ.get('BENCH_HOT_PCT', '10')}%)\n"
            f"- throughput @ local[{N}]: **{tp_n:,.0f} events/s**\n"
            f"- throughput @ local[{N4}]: **{tp_4n:,.0f} events/s**\n"
            f"- scaling efficiency (tp4N/tpN)/4: **{eff}**\n"
            f"- config: shuffle.partitions=cores, 64 buckets, "
            f"maxFilesPerTrigger=4, CoW merge, AQE on\n"
            f"- full JSON N: `{json.dumps(r_n)}`\n"
            f"- full JSON 4N: `{json.dumps(r_4n)}`\n"
        )


if __name__ == "__main__":
    main()
