#!/usr/bin/env python3
"""Min-across-runs bench floor — the round gate procedure (BASELINE.md).

Per-query min WITHIN one run (the bench's min-of-2) still carries
+-0.3s/query of box noise, the same magnitude as the per-query ratchet
it polices (round-14 verdict, finding #3). The floor across the
round's archived full runs is the stable statistic: shared-tenancy
spikes almost never hit the same query in every run.

Usage:
    python3 tools/bench_floor.py bench_runs/bench-A.json bench-B.json ...

Prints the per-query floor total, each run's value/sentinel_median,
and the per-query floor map (worst 15 shown); exits non-zero if the
runs disagree on the query set (comparing unlike rounds).
"""
import json
import statistics
import sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p, json.load(f)))
    if not runs:
        print("usage: bench_floor.py <bench.json> ...", file=sys.stderr)
        return 2
    keys = set(runs[0][1]["queries"])
    for p, r in runs[1:]:
        if set(r["queries"]) != keys:
            print(f"query-set mismatch in {p} "
                  f"(+{sorted(set(r['queries']) - keys)[:3]} "
                  f"-{sorted(keys - set(r['queries']))[:3]})",
                  file=sys.stderr)
            return 1
    for p, r in runs:
        med = r.get("sentinel_median") or statistics.median(
            float(x) for x in r["sentinel"])
        print(f"run {p}: value={r['value']:.1f} sentinel_median={med:.3f}")
    floor = {k: min(r["queries"][k] for _, r in runs) for k in keys}
    total = sum(floor.values())
    print(f"floor_total={total:.2f} over {len(keys)} queries "
          f"across {len(runs)} runs")
    worst = sorted(floor.items(), key=lambda kv: -kv[1])[:15]
    for k, v in worst:
        print(f"  {k:36s} {v:.3f}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv[1:]))
    except BrokenPipeError:  # piped into head — not an error
        sys.exit(0)
