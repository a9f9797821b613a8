#!/usr/bin/env python3
"""Stamp the round's clean bench artifact with a drift-resistant min map.

Round-13 verdict "What's wrong #4": a single stamped run carries the
box's afternoon — the official r13 artifact had a 1.136 median
per-query drift on UNTOUCHED queries purely from background
interference, and a uniform smear is invisible to the in-run rerun
defense. The judge's own adjudication used min-of-N across the round's
stamped runs as the interference-free plan-cost number, so the round
artifact now carries BOTH readings:

  queries      - the primary run (the FIRST file argument), untouched
  queries_min  - per-query min across the round's N runs
  value_min    - sum of queries_min over queries timed in the primary
                 run (so totals stay comparable run-to-run)
  min_runs     - the exact run files the min was taken over (N recorded)

min() across full honest runs is legitimate for PLAN-cost comparison:
every number in it is a measured wall time of the same build; the min
simply discards interference, which is a property of the box, not the
plan. It is NOT legitimate across different builds - the script
refuses to mix runs whose query catalogs differ (a changed catalog
means a changed build).

Usage: python3 scripts/stamp_bench.py <out.json> <run1.json> [run2.json ...]
The FIRST run file is the primary (its full JSON is the artifact base);
order the rest oldest-to-newest or not - only the min is taken.
"""
import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            runs.append((p, json.load(f)))
    primary_path, primary = runs[0]
    names = set(primary["queries"])
    for p, r in runs[1:]:
        if set(r["queries"]) != names:
            extra = set(r["queries"]) ^ names
            print(f"REFUSED: {p} has a different query catalog than "
                  f"{primary_path} (symmetric diff: {sorted(extra)[:6]}"
                  f"{'...' if len(extra) > 6 else ''}) - min across "
                  "different builds is not a plan-cost number")
            return 1
    qmin = {}
    for n in primary["queries"]:
        vals = [r["queries"][n] for _, r in runs if r["queries"][n] >= 0]
        qmin[n] = min(vals) if vals else -1.0
    artifact = dict(primary)
    artifact["queries_min"] = qmin
    # same query set as the primary's "value": a query that crashed in
    # the primary run (-1) is excluded even when an older run timed it,
    # so value and value_min stay comparable (review r14)
    artifact["value_min"] = sum(
        v for n, v in qmin.items()
        if v >= 0 and primary["queries"][n] >= 0)
    artifact["min_runs"] = [p for p, _ in runs]
    with open(out_path, "w") as f:
        json.dump(artifact, f)
    print(f"stamped {out_path}: {len(qmin)} queries, "
          f"value={artifact['value']:.1f}s (primary {primary_path}), "
          f"value_min={artifact['value_min']:.1f}s over {len(runs)} runs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
