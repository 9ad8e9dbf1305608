"""Tucker solver tests: HOSVD exactness, HOOI==DT equivalence, PP trajectory."""

import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.models import tucker
from pairwise_perturbation_tpu.ops import contract


def low_rank_tucker_tensor(rng, shape, ranks):
    core = rng.standard_normal(ranks)
    Ws = [np.linalg.qr(rng.standard_normal((s, r)))[0]
          for s, r in zip(shape, ranks)]
    V = np.einsum("PQR,aP,bQ,cR->abc", core, *Ws) if len(shape) == 3 else \
        np.einsum("PQRS,aP,bQ,cR,dS->abcd", core, *Ws)
    return V, core, Ws


def test_hosvd_exact_recovery(rng):
    shape, ranks = (8, 9, 10), (3, 4, 5)
    V, _, _ = low_rank_tucker_tensor(rng, shape, ranks)
    core, Ws = tucker.hosvd(V, ranks)
    # factors orthonormal
    for W in Ws:
        np.testing.assert_allclose(np.asarray(W.T @ W), np.eye(W.shape[1]),
                                   atol=1e-8)
    # exact low-rank tensor: HOSVD reconstruction is exact
    recon = np.asarray(contract.ttmc(core, Ws, skip_mode=-1, transpose=True))
    np.testing.assert_allclose(recon, V, atol=1e-8)


def test_hooi_equals_dt_sweep(rng):
    shape, ranks = (6, 7, 8, 9), (2, 3, 2, 3)
    V = rng.standard_normal(shape)
    jV = jnp.asarray(V)
    core, Ws = tucker.hosvd(jV, ranks)
    Ws_dt, core_dt = tucker.tucker_dt_sweep(jV, Ws, Ws, ranks=ranks,
                                            use_sign=False)
    Ws_ho, core_ho = tucker.tucker_hooi_sweep(jV, Ws, ranks=ranks)
    for a, b in zip(Ws_dt, Ws_ho):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)
    np.testing.assert_allclose(np.asarray(core_dt), np.asarray(core_ho),
                               atol=1e-7)


def test_tucker_dt_converges_exact(rng):
    shape, ranks = (8, 8, 8), (3, 3, 3)
    V, _, _ = low_rank_tucker_tensor(rng, shape, ranks)
    cfg = tucker.TuckerConfig(tol=1e-10 * np.linalg.norm(V), maxiter=50,
                              resprint=1)
    res = tucker.als_tucker(V, ranks, cfg)
    assert res.diffV < 1e-6 * np.linalg.norm(V)


def test_tucker_random_truncated(rng):
    """Random tensor (r2 fixture, fill_random(0.5,1)): truncated Tucker
    captures most of the mass."""
    shape, ranks = (8, 8, 8), (3, 3, 3)
    V = rng.uniform(0.5, 1.0, size=shape)
    cfg = tucker.TuckerConfig(tol=1e-8 * np.linalg.norm(V), maxiter=30,
                              resprint=1)
    res = tucker.als_tucker(V, ranks, cfg)
    assert res.diffV < 0.2 * np.linalg.norm(V)


def test_tucker_pp_runs_and_matches_dt(rng):
    shape, ranks = (8, 8, 8, 8), (3, 3, 3, 3)
    V, _, _ = low_rank_tucker_tensor(rng, shape, ranks)
    V = V + 0.02 * np.linalg.norm(V) / (np.prod(shape) ** 0.5) \
        * rng.standard_normal(shape)
    Vn = np.linalg.norm(V)
    cfg_pp = tucker.TuckerConfig(tol=1e-12 * Vn, pp_res_tol=0.3, maxiter=40,
                                 resprint=2)
    res_pp = tucker.als_tucker_pp(V, ranks, cfg_pp)
    pp_rows = [h for h in res_pp.history if h["pp"] == 1]
    assert pp_rows, "Tucker PP phase never entered"
    cfg_dt = tucker.TuckerConfig(tol=1e-12 * Vn, maxiter=40, resprint=2)
    res_dt = tucker.als_tucker(V, ranks, cfg_dt)
    assert res_pp.diffV < max(10 * res_dt.diffV, 1e-5 * Vn)


def test_sign_fix_keeps_dw_small(rng):
    """With sign alignment, successive DT sweeps on a converged problem give
    tiny dW; without it, eigenvector sign flips would make dW ~ ||W||."""
    shape, ranks = (8, 8, 8), (3, 3, 3)
    V, _, _ = low_rank_tucker_tensor(rng, shape, ranks)
    jV = jnp.asarray(V)
    core, Ws = tucker.hosvd(jV, ranks)
    W_prev = Ws
    Ws1, _ = tucker.tucker_dt_sweep(jV, Ws, W_prev, ranks=ranks, use_sign=True)
    Ws2, _ = tucker.tucker_dt_sweep(jV, Ws1, Ws1, ranks=ranks, use_sign=True)
    for a, b in zip(Ws1, Ws2):
        rel = float(jnp.linalg.norm((a - b).ravel()) / jnp.linalg.norm(a.ravel()))
        assert rel < 1e-6


def test_tucker_mixed_bf16_converges(rng):
    """Tucker DT<->PP with bf16-stored V (mixed precision): factors stay
    f32-orthonormal and the relative residual tracks the f32 run."""
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import tucker

    V = rng.standard_normal((10, 12, 14)).astype(np.float64)
    ranks = (3, 4, 4)
    cfg = tucker.TuckerConfig(tol=0.0, maxiter=15, resprint=15)
    r32 = tucker.als_tucker_pp(jnp.asarray(V, jnp.float32), ranks, cfg)
    r16 = tucker.als_tucker_pp(jnp.asarray(V, jnp.bfloat16), ranks, cfg)
    assert r16.factors[0].dtype == jnp.float32
    Vn = float(np.linalg.norm(V))
    assert abs(r16.diffnorm - r32.diffnorm) / Vn < 0.05


def test_tucker_subspace_iters_matches_exact(rng):
    """Warm-started subspace-iteration factor extraction reaches the same
    fitness as the exact eigh path (opt-in TuckerConfig.subspace_iters)."""
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import tucker

    V = rng.standard_normal((12, 10, 14)).astype(np.float64)
    ranks = (4, 3, 5)
    cfg0 = tucker.TuckerConfig(tol=0.0, maxiter=15, resprint=15)
    cfg2 = tucker.TuckerConfig(tol=0.0, maxiter=15, resprint=15,
                               subspace_iters=2)
    r0 = tucker.als_tucker_pp(jnp.asarray(V), ranks, cfg0)
    r2 = tucker.als_tucker_pp(jnp.asarray(V), ranks, cfg2)
    Vn = float(np.linalg.norm(V))
    assert abs(r2.diffV - r0.diffV) / Vn < 0.02


def test_factor_from_y_rank_exceeds_small_side(rng):
    """ranks[i] > product of other modes' ranks: the extraction must fall
    back to the mode-side eigh whose orthonormal completion supplies the
    extra columns (code-review regression)."""
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import tucker

    V = jnp.asarray(rng.standard_normal((20, 6, 6)).astype(np.float32))
    ranks = (10, 2, 2)   # Y for mode 0 is (20, 2, 2): m=4 < r=10
    Ws, core = tucker.tucker_hooi_sweep(
        V, [jnp.asarray(rng.standard_normal((s, r)).astype(np.float32))
            for s, r in zip(V.shape, ranks)], ranks=ranks)
    assert Ws[0].shape == (20, 10)
    # orthonormal columns
    G = np.asarray(Ws[0].T @ Ws[0])
    np.testing.assert_allclose(G, np.eye(10), atol=1e-4)


def test_pp_quiet_skip_semantics(rng):
    """Quiet-mode extraction skip (VERDICT r4 weak #2): with all-zero
    dWs and age > 0, every extraction is skipped (factors unchanged);
    with age == 0 (first sweep after a build) the sweep always
    extracts; quiet_tol = 0 reproduces reference semantics."""
    shape, ranks = (8, 9, 10, 11), (3, 3, 3, 3)
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    core, Ws = tucker.hosvd(V, ranks)
    single, pair = tucker.tucker_build_caches(V, list(Ws))
    zeros = [jnp.zeros_like(w) for w in Ws]

    # reference sweep (quiet off)
    Ws_ref, dWs_ref, _, stat_ref = tucker.tucker_pp_sweep(
        single, pair, list(Ws), list(Ws), zeros, 0.0, 1, ranks=ranks)
    # age > 0 and dWs == 0 -> all modes quiet -> factors kept verbatim
    Ws_q, dWs_q, _, stat_q = tucker.tucker_pp_sweep(
        single, pair, list(Ws), list(Ws), zeros, 1e-3, 1, ranks=ranks)
    for w, wq in zip(Ws, Ws_q):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(wq))
    # a fully-skipped sweep reports stationary (callers exit the phase)
    assert bool(stat_q) and not bool(stat_ref)
    # the reference sweep DOES move the factors (skip is a real change)
    moved = sum(float(jnp.linalg.norm(a - b))
                for a, b in zip(Ws_ref, Ws))
    assert moved > 1e-4
    # age == 0: first sweep after a build always extracts
    Ws_a0, _, _, stat_a0 = tucker.tucker_pp_sweep(
        single, pair, list(Ws), list(Ws), zeros, 1e-3, 0, ranks=ranks)
    for a, b in zip(Ws_a0, Ws_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    assert not bool(stat_a0)


def test_pp_quiet_skip_fitness_parity(rng):
    """End-to-end: the quiet-skip PP solver reaches the same fitness as
    the always-extract solver on a truncated-rank tensor."""
    shape, ranks = (12, 13, 14, 15), (3, 3, 3, 3)
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cfg_on = tucker.TuckerConfig(maxiter=40, resprint=5, pp_res_tol=0.1,
                                 pp_quiet_frac=0.2)
    cfg_off = tucker.TuckerConfig(maxiter=40, resprint=5, pp_res_tol=0.1,
                                  pp_quiet_frac=0.0)
    res_on = tucker.als_tucker_pp(V, ranks, cfg_on)
    res_off = tucker.als_tucker_pp(V, ranks, cfg_off)
    assert np.isfinite(res_on.diffV) and res_on.diffV > 0
    # equal fitness within 0.2% (skip is first-order exact)
    assert abs(res_on.diffV - res_off.diffV) / res_off.diffV < 2e-3
