"""CP ALS solver tests: DT == plain-ALS equivalence, convergence on the
synthetic zoo fixtures, PP trajectory agreement with DT."""

import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract


def rank_r_tensor(rng, shape, R):
    Ws = [rng.random((s, R)) for s in shape]
    V = np.asarray(contract.build_dense([jnp.asarray(W) for W in Ws]))
    return V, Ws


def test_dt_sweep_equals_simple_sweep(rng):
    """A DT sweep must produce bit-for-bit the same updates as a plain ALS
    sweep (exact MTTKRP both ways) when solved identically."""
    shape = (5, 6, 7, 8)
    V, Ws0 = rank_r_tensor(rng, shape, 3)
    Ws0 = [rng.random((s, 3)) for s in shape]
    jV = jnp.asarray(V)
    jWs = [jnp.asarray(W) for W in Ws0]
    lam = jnp.asarray(0.0)
    Ws_dt, g_dt = cp.dt_sweep(jV, jWs, lam, solver="svd")
    Ws_si, g_si = cp.simple_sweep(jV, jWs, lam, solver="svd")
    for a, b in zip(Ws_dt, Ws_si):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)
    for a, b in zip(g_dt, g_si):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


@pytest.mark.parametrize("solver", ["svd", "chol"])
def test_dt_converges_exact_rank(rng, solver):
    """Tensor 'r' fixture: exact rank-R ground truth -> residual ~ 0."""
    shape = (6, 6, 6, 6)
    V, _ = rank_r_tensor(rng, shape, 3)
    Ws = cp.init_factors(shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=1e-8 * np.linalg.norm(V), maxiter=120, resprint=10,
                      solver=solver)
    res = cp.als_cp_dt(V, Ws, cfg)
    assert res.diffV < 1e-4 * np.linalg.norm(V)
    # gradnorm decreased monotonically-ish
    gns = [h["gradnorm"] for h in res.history if np.isfinite(h["gradnorm"])]
    assert gns[-1] < gns[0] * 1e-2


def test_pp_converges_and_uses_pp_phase(rng):
    shape = (6, 6, 6, 6)
    V, _ = rank_r_tensor(rng, shape, 3)
    Ws = cp.init_factors(shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=1e-9 * np.linalg.norm(V), pp_res_tol=0.1,
                      maxiter=200, resprint=5)
    res = cp.als_cp_pp(V, Ws, cfg)
    pp_rows = [h for h in res.history if h["pp"] == 1]
    dt_rows = [h for h in res.history if h["pp"] == 0]
    assert pp_rows, "PP phase never entered"
    assert dt_rows, "DT preconditioning phase never ran"
    assert res.diffV < 1e-3 * np.linalg.norm(V)


def test_pp_matches_dt_trajectory(rng):
    """PP must reach (approximately) the same fitness as pure DT from the
    same init — the reference's correctness oracle (SURVEY.md section 4)."""
    shape = (6, 6, 6, 6)
    V, _ = rank_r_tensor(rng, shape, 3)
    Vn = np.linalg.norm(V)
    Ws = cp.init_factors(shape, 3, dtype=jnp.float64)
    cfg_dt = cp.CPConfig(tol=0.0, maxiter=60, resprint=60)
    cfg_pp = cp.CPConfig(tol=0.0, maxiter=60, resprint=60, pp_res_tol=0.05)
    res_dt = cp.als_cp_dt(V, [W for W in Ws], cfg_dt)
    res_pp = cp.als_cp_pp(V, [W for W in Ws], cfg_pp)
    # both should fit the exact-rank tensor well; PP within 10x of DT or
    # both tiny
    assert res_pp.diffV < max(10 * res_dt.diffV, 1e-5 * Vn)


def test_pp_partupdate_reduces_gradient(rng):
    """partupdate with update_percentage < 1 updates only the most-perturbed
    modes per sweep; like the reference's experimental variant it may stall
    at a stationary point, so assert gradient reduction, not global fit."""
    shape = (5, 5, 5, 5)
    V, _ = rank_r_tensor(rng, shape, 2)
    Ws = cp.init_factors(shape, 2, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=1e-9 * np.linalg.norm(V), pp_res_tol=0.1,
                      maxiter=100, resprint=5, update_percentage=0.5)
    res = cp.als_cp_pp(V, Ws, cfg, partial_update=True)
    gns = [h["gradnorm"] for h in res.history if np.isfinite(h["gradnorm"])]
    assert gns[-1] < 1e-2 * gns[0]


def test_pp_partupdate_full_percentage_matches_standard_pp(rng):
    """update_percentage=1.0 partupdate sweeps all modes and must land on
    the same solution as standard PP from the same init."""
    shape = (5, 5, 5, 5)
    V, _ = rank_r_tensor(rng, shape, 2)
    Ws = cp.init_factors(shape, 2, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=1e-9 * np.linalg.norm(V), pp_res_tol=0.1,
                      maxiter=150, resprint=5, update_percentage=1.0)
    res = cp.als_cp_pp(V, [W for W in Ws], cfg, partial_update=True)
    res_std = cp.als_cp_pp(V, [W for W in Ws], cfg)
    np.testing.assert_allclose(res.diffV, res_std.diffV, rtol=1e-4)


def test_plain_als_runs(rng):
    shape = (5, 6, 7)
    V, _ = rank_r_tensor(rng, shape, 3)
    Ws = cp.init_factors(shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, maxiter=100, resprint=10)
    res = cp.als_cp(V, Ws, cfg)
    assert res.diffV < 5e-3 * np.linalg.norm(V)


def test_regularization_lambda(rng):
    """lambda > 0 adds ridge to S; solver should still reduce residual."""
    shape = (6, 6, 6)
    V, _ = rank_r_tensor(rng, shape, 3)
    Ws = cp.init_factors(shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, maxiter=40, resprint=10, lam=1e-6)
    res = cp.als_cp_dt(V, Ws, cfg)
    assert res.diffV < 1e-2 * np.linalg.norm(V)


def test_pp_order3(rng):
    """Order-3 PP: pair caches are the whole first-contraction level
    (BASELINE config 2: order-3 rank-10 PP)."""
    shape = (12, 13, 14)
    V, _ = rank_r_tensor(rng, shape, 4)
    Ws = cp.init_factors(shape, 4, dtype=jnp.float64)
    Vn = np.linalg.norm(V)
    cfg = cp.CPConfig(tol=1e-9 * Vn, pp_res_tol=0.1, maxiter=120, resprint=5)
    res = cp.als_cp_pp(V, Ws, cfg)
    assert res.diffV < 1e-3 * Vn
    assert any(h["pp"] == 1 for h in res.history)


def test_layouts_do_not_change_results(rng):
    """Mode-minor layout copies must be numerically transparent."""
    shape = (5, 6, 7, 8)
    V, _ = rank_r_tensor(rng, shape, 3)
    jV = jnp.asarray(V)
    Ws = [jnp.asarray(rng.random((s, 3))) for s in shape]
    lam = jnp.asarray(0.0)
    modes = sorted(set(contract.chain_root_modes_dt(shape))
                   | set(contract.chain_root_modes_pp(shape)))
    layouts = contract.prepare_layouts(jV, modes)
    a, ga = cp.dt_sweep(jV, list(Ws), lam, None, solver="svd")
    b, gb = cp.dt_sweep(jV, list(Ws), lam, layouts, solver="svd")
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-10)
    s1, p1 = cp.pp_build_caches(jV, list(Ws))
    s2, p2 = cp.pp_build_caches(jV, list(Ws), layouts)
    for i in s1:
        np.testing.assert_allclose(np.asarray(s1[i]), np.asarray(s2[i]),
                                   rtol=1e-10)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]),
                                   rtol=1e-10)


def test_pp_device_with_layouts_converges(rng):
    shape = (6, 6, 6, 6)
    V, _ = rank_r_tensor(rng, shape, 3)
    Ws = cp.init_factors(shape, 3, dtype=jnp.float64)
    Vn = np.linalg.norm(V)
    cfg = cp.CPConfig(tol=1e-9 * Vn, pp_res_tol=0.1, maxiter=100, resprint=5,
                      precompute_layouts=True)
    res = cp.als_cp_pp_device(V, Ws, cfg)
    assert res.diffV < 1e-3 * Vn


def test_pp_partupdate_sweep_device_matches_host_loop(rng):
    """The device-resident partupdate sweep (lax.switch ranking + top-k
    solves) reproduces the reference host loop (als_CP.cxx:992-1053)."""
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.ops import contract, solve

    shape, R, k = (8, 9, 10, 11), 3, 2
    V = jnp.asarray(rng.standard_normal(shape))
    Ws = [jnp.asarray(rng.standard_normal((s, R))) for s in shape]
    order = len(shape)
    lam = jnp.asarray(0.0, dtype=V.dtype)
    single, pair = cp.pp_build_caches(V, list(Ws))
    W_init = [w for w in Ws]

    # host reference loop (the pre-device implementation)
    hWs = [w for w in Ws]
    hdWs = [jnp.zeros_like(w) for w in Ws]
    hdMs = [jnp.zeros_like(w) for w in Ws]
    hMs = [None] * order
    hrel = np.zeros(order)
    for _ in range(3):
        sorted_idx = list(np.argsort(-hrel, kind="stable"))
        for i in [int(x) for x in sorted_idx[:k]]:
            M = single[i] + hdMs[i]
            S = contract.hadamard_gram(hWs, skip_mode=i, regul=lam)
            hMs[i] = M
            hWs[i], hdWs[i] = solve.svd_solve_mod(M, W_init[i], S, 1.0)
            hdMs[i] = jnp.zeros_like(hdMs[i])
            for ii in range(order):
                if ii == i:
                    continue
                a, b = min(i, ii), max(i, ii)
                cache = pair[(a, b)]
                if ii < i:
                    hdMs[ii] = hdMs[ii] + jnp.einsum("Zab,bZ->aZ", cache,
                                                     hdWs[i])
                else:
                    hdMs[ii] = hdMs[ii] + jnp.einsum("Zab,aZ->bZ", cache,
                                                     hdWs[i])
        for i in range(order):
            if hMs[i] is not None:
                hrel[i] = float(jnp.linalg.norm(hdMs[i].ravel())
                                / jnp.linalg.norm(hMs[i].ravel()))
        hWs = contract.normalize_factors(hWs)

    # device sweep
    dWs = [jnp.zeros_like(w) for w in Ws]
    dMs = [jnp.zeros_like(w) for w in Ws]
    Ms = [jnp.zeros_like(w) for w in Ws]
    ms_set = jnp.zeros(order, dtype=bool)
    rel = jnp.zeros(order, dtype=V.dtype)
    grads = [jnp.zeros_like(w) for w in Ws]
    cur = [w for w in Ws]
    for _ in range(3):
        (cur, dWs, dMs, Ms, ms_set, rel, grads) = cp.pp_partupdate_sweep(
            single, pair, cur, W_init, dWs, dMs, Ms, ms_set, rel, grads,
            lam, 1.0, update_size=k, solver="svd")
    for a, b in zip(hWs, cur):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(rel), hrel, rtol=1e-6, atol=1e-12)
