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


def first_crossing(rows, target, key="diffV"):
    """(dtime, iter) of the first row at/below ``target``; (None, None)
    if never. The right attainment notion for MONOTONE trajectories
    (no plateau to sustain)."""
    for r in rows:
        if np.isfinite(r[key]) and r[key] <= target:
            return r["dtime"], r.get("iter")
    return None, None


def equal_fitness_times(rows_a, rows_b, key="diffV", k=3, slack=1.001):
    """TOTAL equal-fitness comparison of two trajectories (VERDICT r4
    weak #5): returns ``(t_a, t_b, target, rule)``.

    Primary rule ("sustained"): target = the worse of the two
    final-quartile sustained-fitness levels; attainment = >= ``k``
    consecutive logged rows at/below target.

    Fallback rule ("monotone"), used when EITHER run never sustains the
    primary target — the signature of a monotone descent to the
    arithmetic floor (the reference's exact-rank 'r' family,
    test_ALS.cxx:33-40, oscillates > 0.1% row-to-row at the floor so no
    plateau exists): target = the worse of the two FINAL-ROW fitness
    values, attainment = first crossing. Total by construction — the
    target is at/above where both runs end."""
    target = max(sustained_fitness(rows_a, key),
                 sustained_fitness(rows_b, key)) * slack
    t_a, _ = time_to_sustained(rows_a, target, key, k)
    t_b, _ = time_to_sustained(rows_b, target, key, k)
    if t_a is not None and t_b is not None:
        return t_a, t_b, target, "sustained"
    target = max(final_row_fitness(rows_a, key),
                 final_row_fitness(rows_b, key)) * slack
    t_a, _ = first_crossing(rows_a, target, key)
    t_b, _ = first_crossing(rows_b, target, key)
    return t_a, t_b, target, "monotone"


def improvement_times(rows_a, rows_b, frac=0.9, key="diffV", k=3):
    """Time for each run to cover ``frac`` of the SHARED achievable
    fitness improvement: target = init - frac * (init - worse_final),
    where init is the worse of the two starting values (identical inits
    in practice) and worse_final the worse of the two final rows.

    Robust where equal-fitness targets degenerate: runs whose init is
    already near the final level (e.g. Tucker from an HOSVD init) put
    the sustained/final-row target WITHIN NOISE OF THE START, so any
    run "attains" at row 0 and the comparison measures threshold
    jitter. Returns (t_a, t_b, target, degenerate) — ``degenerate`` is
    True when the total improvement is < 0.1% of init (no fitness
    progress to race over)."""
    av = [r[key] for r in _finite(rows_a, key)]
    bv = [r[key] for r in _finite(rows_b, key)]
    if not av or not bv:
        return None, None, float("inf"), True
    init = max(av[0], bv[0])
    final = max(av[-1], bv[-1])
    degenerate = not (init > final and (init - final) > 1e-3 * init)
    target = init - frac * (init - final)
    t_a, _ = time_to_sustained(rows_a, target, key, k)
    t_b, _ = time_to_sustained(rows_b, target, key, k)
    if t_a is None or t_b is None:
        # SYMMETRIC fallback: if either run never sustains the target,
        # BOTH are scored by first crossing — crediting one run at a
        # transient dip while holding the other to the sustained rule
        # would manufacture speedups
        t_a, _ = first_crossing(rows_a, target, key)
        t_b, _ = first_crossing(rows_b, target, key)
    return t_a, t_b, target, degenerate


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
