"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule requires ≥0.8 throughput-scaling efficiency from N to 4N
executors. No real cluster exists in this sandbox, so — per driver
instruction — the same job runs at two parallelism levels (local[N] vs
local[4N], fresh JVM each) on the SAME input size, and we report
events/sec at both plus efficiency = (tput_4N / tput_N) / 4.

Writes BENCH/BASELINE.md. Usage: python bench_scaling.py [N] [EVENTS]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_at(cpus: int, n_events: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_CDC_EVENTS=str(n_events),
        SPARK_GRAFT_BENCH_MODE="cdc",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    n_big = n_small * 4

    r_small = run_at(n_small, n_events)
    r_big = run_at(n_big, n_events)
    eff = (r_big["events_per_sec"] / r_small["events_per_sec"]) / 4.0

    md = f"""# BENCH — measured numbers

## Scaling efficiency (north rule: ≥ 0.8 from N → 4N)

Same job (CDC merge-apply of a deterministic {n_events:,}-event change
stream, seed 42, 8 files, maxFilesPerTrigger=2, merge-on-read + final
compaction), same input, two parallelism levels. Sandbox proxy for
cluster sizes per driver instruction: `local[{n_small}]` vs
`local[{n_big}]`, fresh JVM each. Warmup batches excluded from timing.

| Parallelism | events/sec | wall sec | batches |
|---|---|---|---|
| local[{n_small}] (N) | {r_small["events_per_sec"]:,} | {r_small["cdc_sec"]} | {r_small["cdc_batches"]} |
| local[{n_big}] (4N) | {r_big["events_per_sec"]:,} | {r_big["cdc_sec"]} | {r_big["cdc_batches"]} |

**Scaling efficiency: {eff:.3f}** (target ≥ 0.8)

Caveats (honest proxy): a single JVM shares one driver, one local disk
for shuffle, and OS page cache between "executors"; per-micro-batch
fixed costs (streaming trigger, snapshot commit, driver aggregation of
file stats) do not parallelize and bound small-batch scaling. On a real
4N-executor cluster those costs stay constant while scan/shuffle/write
bandwidth scales with executors.

## Raw bench output

N: `{json.dumps(r_small)}`

4N: `{json.dumps(r_big)}`
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(json.dumps({"efficiency": round(eff, 3), "n": r_small, "4n": r_big}))


if __name__ == "__main__":
    main()
