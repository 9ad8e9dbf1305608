"""Sustained-fitness metrics for equal-fitness comparisons.

VERDICT r3 weak #2: taking ``min(diffV)`` over a whole trajectory as
"final fitness" and *first crossing* as time-to-fitness flatters
non-monotone runs — a single transient dip counts as "reached the
target" even if the run spends the rest of its life above it. These
helpers implement the stricter rule:

- target fitness = min over the FINAL QUARTILE of logged rows (a level
  the run holds at the end, not a dip), and
- attainment = SUSTAINED: diffV <= target for >= ``k`` consecutive
  logged rows, or held through end-of-run.

Used by scripts/analyze_real.py and scripts/bench_pp_e2e.py.
"""

from __future__ import annotations

import numpy as np


def _finite(rows, key="diffV"):
    return [r for r in rows if np.isfinite(r[key])]


def sustained_fitness(rows, key="diffV", fraction=0.25):
    """min of the final ``fraction`` of logged rows (>= 1 row)."""
    vals = [r[key] for r in _finite(rows, key)]
    if not vals:
        return float("inf")
    tail = vals[int(len(vals) * (1.0 - fraction)):] or vals[-1:]
    return min(tail)


def final_row_fitness(rows, key="diffV"):
    """The actual last logged value — reported alongside the target so a
    reader sees where the run ENDED, not only what it held."""
    vals = [r[key] for r in _finite(rows, key)]
    return vals[-1] if vals else float("inf")


def time_to_sustained(rows, target, key="diffV", k=3):
    """(dtime, iter) of the first row of the first stretch where
    ``rows[key] <= target`` holds for >= ``k`` consecutive logged rows or
    through end-of-run; (None, None) if never sustained."""
    rows = list(rows)
    n = len(rows)
    run = 0
    start = None
    for idx, r in enumerate(rows):
        ok = np.isfinite(r[key]) and r[key] <= target
        if ok:
            if run == 0:
                start = idx
            run += 1
            if run >= k or idx == n - 1:
                return rows[start]["dtime"], rows[start].get("iter")
        else:
            run = 0
            start = None
    return None, None
