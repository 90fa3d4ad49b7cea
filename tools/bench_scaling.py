"""Two-parallelism scaling evidence for the north rule.

Runs the flagship CDC replay (via bench.py, STCS_BENCH_ONLY=cdc_replay) at
local[N] and local[4N] in separate subprocesses (one JVM each) on the SAME
input, reports both throughputs and the scaling efficiency
``(T_4N / T_N) / 4`` into BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [sf_dir] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(sf_dir: str, cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        STCS_BENCH_ONLY="cdc_replay",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = run_once(sf_dir, n)
    hi = run_once(sf_dir, 4 * n)
    eps_lo = lo["extra"]["events_per_sec"]
    eps_hi = hi["extra"]["events_per_sec"]
    eff = round(eps_hi / eps_lo / 4.0, 3)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    report = f"""# BENCH — scaling evidence ({stamp})

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors, evidenced in this sandbox by the same CDC-replay job at two
local parallelism levels on identical input (`{sf_dir}`,
{lo['extra']['events']} change events, 4 micro-batches, fresh lake each run,
separate JVMs).

| parallelism | wall (s) | events/sec |
| --- | --- | --- |
| local[{n}] | {lo['queries']['cdc_replay']} | {eps_lo} |
| local[{4*n}] | {hi['queries']['cdc_replay']} | {eps_hi} |

**speedup {n}->{4*n} cores: {round(eps_hi/eps_lo, 2)}x,
scaling efficiency: {eff}** (criterion: >= 0.8)

Raw bench lines:

```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    out = os.path.join(ROOT, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(report)
    print(report)


if __name__ == "__main__":
    main()
