"""Device-resident phase loop tests: while_loop DT/PP phases must match the
host-driven drivers' semantics and fits."""

import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract


def problem(rng, shape=(6, 6, 6, 6), R=3):
    Ws_true = [rng.random((s, R)) for s in shape]
    V = np.asarray(contract.build_dense([jnp.asarray(W) for W in Ws_true]))
    W0 = cp.init_factors(shape, R, dtype=jnp.float64)
    return jnp.asarray(V), W0


def test_dt_phase_device_matches_host(rng):
    V, W0 = problem(rng)
    lam = jnp.asarray(0.0)
    tol_init = jnp.asarray(0.05)
    # device phase
    n, Ws_dev, dWs_dev, gn, quiet, hist, *_snap = cp.dt_phase_device(
        V, [jnp.array(w) for w in W0], lam, tol_init, jnp.asarray(0.0),
        jnp.asarray(200), solver="svd", max_sweeps=200)
    n = int(n)
    assert bool(quiet)
    # host equivalent: sweep until all ratios < tol_init
    Ws = [jnp.array(w) for w in W0]
    W_prev = [jnp.zeros_like(w) for w in Ws]
    k = 0
    while True:
        Ws, grads = cp.dt_sweep(V, Ws, lam, solver="svd")
        dWs = [a - b for a, b in zip(Ws, W_prev)]
        W_prev = [w for w in Ws]
        k += 1
        ratios = np.asarray(cp.factor_norm_ratios(Ws, dWs))
        if np.all(np.abs(ratios) < 0.05) or k > 200:
            break
    assert k == n
    for a, b in zip(Ws_dev, Ws):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_pp_phase_device_runs_and_caps(rng):
    V, W0 = problem(rng)
    lam = jnp.asarray(0.0)
    # warm start near a solution so PP doesn't instantly restart
    Ws = [jnp.array(w) for w in W0]
    for _ in range(8):
        Ws, _ = cp.dt_sweep(V, Ws, lam, solver="svd")
    n, Ws2, dWs, gn, hist, *_snap = cp.pp_phase_device(
        V, Ws, lam, jnp.asarray(1.0), jnp.asarray(0.5), jnp.asarray(0.0),
        jnp.asarray(15), solver="svd", max_sweeps=15)
    n = int(n)
    assert 1 <= n <= 15
    h = np.asarray(hist[:n])
    assert np.all(np.isfinite(h))


def test_als_cp_pp_device_converges(rng):
    V, W0 = problem(rng)
    Vn = float(jnp.linalg.norm(V.ravel()))
    cfg = cp.CPConfig(tol=1e-9 * Vn, pp_res_tol=0.1, maxiter=150, resprint=5)
    res = cp.als_cp_pp_device(V, W0, cfg)
    assert res.diffV < 1e-3 * Vn
    pp_rows = [h for h in res.history if h["pp"] == 1]
    assert pp_rows, "device PP phase never entered"


def test_device_vs_host_pp_same_fit(rng):
    V, W0 = problem(rng)
    Vn = float(jnp.linalg.norm(V.ravel()))
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.1, maxiter=60, resprint=20)
    res_host = cp.als_cp_pp(V, [jnp.array(w) for w in W0], cfg)
    res_dev = cp.als_cp_pp_device(V, [jnp.array(w) for w in W0], cfg)
    assert res_dev.diffV < max(10 * res_host.diffV, 1e-5 * Vn)


def test_tucker_device_pp_converges(rng):
    from pairwise_perturbation_tpu.models import tucker
    shape, ranks = (8, 8, 8, 8), (3, 3, 3, 3)
    core = rng.standard_normal(ranks)
    Ws = [np.linalg.qr(rng.standard_normal((s, r)))[0]
          for s, r in zip(shape, ranks)]
    V = np.einsum("PQRS,aP,bQ,cR,dS->abcd", core, *Ws)
    V = V + 0.02 * np.linalg.norm(V) / (np.prod(shape) ** 0.5) \
        * rng.standard_normal(shape)
    Vn = np.linalg.norm(V)
    cfg = tucker.TuckerConfig(tol=1e-12 * Vn, pp_res_tol=0.3, maxiter=40,
                              resprint=1)
    res = tucker.als_tucker_pp_device(V, ranks, cfg)
    assert np.isfinite(res.diffV)
    # fit comparable to the host-driven machine
    res_h = tucker.als_tucker_pp(V, ranks,
                                 tucker.TuckerConfig(tol=1e-12 * Vn,
                                                     pp_res_tol=0.3,
                                                     maxiter=40, resprint=1))
    assert res.diffV < max(1.5 * res_h.diffV, 1e-5 * Vn)


def test_device_phases_mixed_bf16(rng):
    """Device-resident DT phase runs with bf16-stored V (mixed precision):
    stats/carries stay in the f32 factor dtype and sweeps converge."""
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import cp
    from pairwise_perturbation_tpu.utils import synth

    V = synth.make_tensor("r", dim=3, s=12, R=3, seed=5, dtype=np.float64)
    V16 = jnp.asarray(V, dtype=jnp.bfloat16)
    Ws = cp.init_factors(V.shape, 3, dtype=jnp.float32)
    lam = jnp.asarray(0.0, dtype=jnp.float32)
    k, Ws2, dWs, gn, quiet, hist, *_snap = cp.dt_phase_device(
        V16, Ws, lam, jnp.asarray(1e-5, jnp.float32),
        jnp.asarray(0.0, jnp.float32), jnp.asarray(20), None,
        solver="svd", max_sweeps=21)
    assert int(k) > 0
    h = np.asarray(hist[:int(k)])
    assert h.dtype == np.float32
    # gradnorm decreased over the phase
    assert h[-1, 0] < h[0, 0]
