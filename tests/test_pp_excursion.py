"""Regression tests for the round-1 "PP excursion" (results/tpu_cp_pp.csv
iter 30: diffV 34 -> 264 inside a PP phase).

Diagnosis (reproduced in f64 on the 64^4 rank-8 'r' config): the true
residual is MONOTONE through the PP phase; the jump was the device loop's
per-sweep diffV *estimate*, which used the exact-solve shortcut
||V||^2 - sum(S o G) — invalid during PP's damped, W_init-anchored solves
(als_CP.cxx:739-758) — and drifted upward with ||dW|| until the next
exact sweep snapped it back. The estimator now uses the norm identity
with the PP-corrected MTTKRP (cp._pp_sweep_norm_stats), first-order
accurate in dW.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract
from pairwise_perturbation_tpu.utils import synth


@pytest.fixture(scope="module")
def fixture64():
    # scaled-down version of the recorded excursion config (r, order 4,
    # rank 8) — f64 so norm-identity cancellation cannot mask anything
    V = synth.make_tensor("r", 4, 24, 8, dtype=np.float64)
    return jnp.asarray(V)


def test_pp_logged_rows_are_exact(fixture64):
    """With resprint set, the PP device phase computes the diffV of
    logged rows EXACTLY (fresh-MTTKRP norm identity via lax.cond) — the
    final hist row must equal the exact reconstruction residual of the
    returned factors to round-off."""
    V = fixture64
    Ws = cp.init_factors(V.shape, 8, dtype=jnp.float64)
    lam = jnp.asarray(0.0, dtype=V.dtype)
    for _ in range(10):
        Ws, _ = cp.dt_sweep(V, Ws, lam, solver="svd")
    n, Ws2, dWs, gn, hist = cp.pp_phase_device(
        V, Ws, lam, jnp.asarray(1.0), jnp.asarray(0.5), jnp.asarray(0.0),
        jnp.asarray(6), jnp.asarray(0), solver="svd", max_sweeps=15,
        resprint=1)
    n = int(n)
    assert n >= 1
    est = float(hist[n - 1, 1])
    exact = float(contract.cp_residual_exact(V, [w for w in Ws2]))
    assert abs(est - exact) / max(exact, 1e-12) < 1e-8, (est, exact)


def test_pp_true_residual_bounded_before_restart(fixture64):
    """The solver invariant behind the excursion report: the TRUE residual
    must not grow materially within a PP phase before the restart
    tolerance fires."""
    V = fixture64
    Ws = cp.init_factors(V.shape, 8, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=1e-2, maxiter=40, resprint=1)
    res = cp.als_cp_pp(V, Ws, cfg)   # host driver: exact diagnostics
    hist = res.history
    assert any(h["pp"] for h in hist)
    prev = None
    for h in hist:
        if h["iter"] < 3:   # first sweeps from random init may wobble
            prev = h["diffV"]
            continue
        assert h["diffV"] <= prev * 1.05 + 1e-9, (h, prev)
        prev = h["diffV"]


def test_device_loop_history_has_no_excursion(fixture64):
    """End-to-end: the device phase machine's logged diffV (the quantity
    recorded in round 1's CSV) stays monotone-ish through PP phases."""
    V = fixture64
    Ws = cp.init_factors(V.shape, 8, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=1e-2, maxiter=40, resprint=1)
    res = cp.als_cp_pp_device(V, Ws, cfg)
    hist = [h for h in res.history if h["iter"] >= 3]
    assert any(h["pp"] for h in hist)
    for a, b in zip(hist, hist[1:]):
        assert b["diffV"] <= a["diffV"] * 1.10 + 1e-9, (a, b)
