"""Unit tests for the sustained / total equal-fitness rules
(scripts/fitness.py; VERDICT r4 weak #5: the metric must be TOTAL —
monotone-to-floor trajectories like the reference's exact-rank 'r'
family, test_ALS.cxx:33-40, must report a number, not n/a)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from fitness import (equal_fitness_times, first_crossing,  # noqa: E402
                     sustained_fitness, time_to_sustained)


def _rows(vals, dt=1.0):
    return [dict(iter=i, diffV=v, dtime=(i + 1) * dt)
            for i, v in enumerate(vals)]


def test_sustained_rule_when_both_plateau():
    a = _rows([10, 5, 2, 1, 1, 1, 1, 1])
    b = _rows([10, 8, 6, 4, 2, 1.1, 1.1, 1.1])
    t_a, t_b, target, rule = equal_fitness_times(a, b)
    assert rule == "sustained"
    assert t_a is not None and t_b is not None
    assert target >= 1.1          # worse of the two sustained levels
    assert t_a < t_b              # a reaches the shared level earlier


def test_sustained_ignores_transient_dip():
    # one dip below the plateau must not count as attainment
    a = _rows([10, 9, 0.5, 8, 7, 5, 5, 5])
    target = sustained_fitness(a) * 1.001
    t, _ = time_to_sustained(a, target)
    dip_t = first_crossing(a, 0.6)[0]
    assert t is not None and t > dip_t


def test_monotone_fallback_is_total():
    # monotone descent to an oscillating arithmetic floor: the final
    # quartile's min is a floor DIP below the final row, never
    # 3-sustained (the 'r' family signature) -> the fallback fires
    a = _rows([10, 5, 3, 2, 1.45, 1.44, 1.43, 1.42,
               1.41, 1.37, 1.43, 1.41])
    b = _rows([100, 80, 60, 40, 20, 10, 5, 2,
               1.46, 1.39, 1.44, 1.41])
    assert time_to_sustained(
        a, max(sustained_fitness(a), sustained_fitness(b)) * 1.001)[0] \
        is None
    t_a, t_b, target, rule = equal_fitness_times(a, b)
    assert rule == "monotone"
    assert t_a is not None and t_b is not None   # TOTAL by construction
    # target = worse of the two final rows (with slack)
    assert target >= max(a[-1]["diffV"], b[-1]["diffV"])
    # a first reaches the shared floor level at row 8, b at row 9
    assert abs(t_a - a[8]["dtime"]) < 1e-9
    assert abs(t_b - b[9]["dtime"]) < 1e-9
    assert t_a < t_b


def test_improvement_times_robust_to_flat_runs():
    from fitness import improvement_times
    # genuine improvement race: a reaches 90% level first
    a = _rows([100, 40, 20, 12, 11, 11, 11, 11])
    b = _rows([100, 90, 70, 50, 30, 20, 12, 11])
    t_a, t_b, target, degen = improvement_times(a, b)
    assert not degen and t_a is not None and t_b is not None
    assert t_a < t_b
    # target = init - 0.9 * (init - worse_final) = 100 - 0.9*89 = 19.9
    assert abs(target - 19.9) < 1e-9
    # flat run (init ~= final): flagged degenerate, no fake speedups
    c = _rows([100.0, 99.99, 99.98, 99.98])
    d = _rows([100.0, 99.99, 99.99, 99.98])
    _, _, _, degen2 = improvement_times(c, d)
    assert degen2
