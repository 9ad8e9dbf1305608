"""Fused device-resident DT<->PP solver tests (cp.als_cp_pp_fused).

The fused machine must reproduce the host-driven phase machine's
semantics: converge to the same fit, alternate phases, respect the
15-sweep cache cap and restart tolerance, and emit exact logged rows.
"""

import numpy as np
import jax.numpy as jnp

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract


def problem(rng, shape=(6, 6, 6, 6), R=3):
    Ws_true = [rng.random((s, R)) for s in shape]
    V = np.asarray(contract.build_dense([jnp.asarray(W) for W in Ws_true]))
    W0 = cp.init_factors(shape, R, dtype=jnp.float64)
    return jnp.asarray(V), W0


def test_fused_converges(rng):
    V, W0 = problem(rng)
    Vn = float(jnp.linalg.norm(V.ravel()))
    cfg = cp.CPConfig(tol=1e-9 * Vn, pp_res_tol=0.1, maxiter=150, resprint=5)
    res = cp.als_cp_pp_fused(V, W0, cfg, chunk=32)
    assert res.diffV < 1e-3 * Vn
    pp_rows = [h for h in res.history if h["pp"] == 1]
    assert pp_rows, "fused machine never entered the PP phase"
    # logged rows are exact: recompute the final residual independently
    exact = float(contract.cp_residual_exact(
        V, [jnp.asarray(w) for w in res.factors]))
    assert abs(exact - res.diffV) <= max(1e-6 * Vn, 0.1 * exact + 1e-9)


def test_fused_matches_host_fit(rng):
    V, W0 = problem(rng)
    Vn = float(jnp.linalg.norm(V.ravel()))
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.1, maxiter=60, resprint=10)
    res_host = cp.als_cp_pp(V, [jnp.array(w) for w in W0], cfg)
    res_fused = cp.als_cp_pp_fused(V, [jnp.array(w) for w in W0], cfg,
                                   chunk=16)
    assert res_fused.diffV < max(10 * res_host.diffV, 1e-5 * Vn)


def test_fused_history_labels_and_rows(rng):
    V, W0 = problem(rng)
    Vn = float(jnp.linalg.norm(V.ravel()))
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.2, maxiter=40, resprint=5)
    res = cp.als_cp_pp_fused(V, W0, cfg, chunk=8)
    labels = [h["iter"] for h in res.history]
    assert labels[0] == 0
    assert labels == sorted(labels)
    for lab in labels:
        assert lab % cfg.resprint == 0 or lab == cfg.maxiter
    # dtime monotone
    dts = [h["dtime"] for h in res.history]
    assert all(b >= a for a, b in zip(dts, dts[1:]))


def test_fused_logged_rows_exact_from_snapshots(rng):
    """Logged rows get EXACT diagnostics computed host-side from the
    carry's factor snapshots (excluded window), not the in-loop
    estimates: re-running the deterministic machine directly and
    evaluating an independent dense-residual oracle on the pulled
    snapshots must reproduce the driver's logged diffV."""
    V, W0 = problem(rng)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.2, maxiter=20, resprint=5)
    res = cp.als_cp_pp_fused(V, [jnp.array(w) for w in W0], cfg, chunk=64)

    # drive the machine directly with the driver's exact parameters
    dtype = W0[0].dtype
    max_hist = cfg.maxiter + 2
    n_slots = (cfg.maxiter // cfg.resprint) + 4
    carry = cp.pp_fused_init(V, [jnp.array(w) for w in W0], max_hist,
                             n_slots)
    carry = cp.pp_fused_chunk(
        V, carry, jnp.asarray(cfg.lam, dtype),
        jnp.asarray(cfg.ratio_step, dtype),
        jnp.asarray(cfg.pp_res_tol, dtype), jnp.asarray(cfg.tol, dtype),
        jnp.asarray(cfg.maxiter), None, solver=cfg.solver, chunk=64,
        resprint=cfg.resprint, pp_cap=cfg.pp_cache_sweeps,
        max_hist=max_hist, root_split=cfg.tree_split, n_slots=n_slots)
    labels = np.asarray(carry[13])
    by_iter = {h["iter"]: h for h in res.history}
    checked = 0
    for slot in range(int(carry[14])):
        lab = int(labels[slot])
        if lab not in by_iter or lab > cfg.maxiter:
            continue
        Ws_s = [s[slot] for s in carry[12]]
        exact = float(contract.cp_residual_exact(V, Ws_s))
        logged = by_iter[lab]["diffV"]
        assert abs(logged - exact) <= 1e-8 * max(exact, 1.0), (lab, logged,
                                                               exact)
        checked += 1
    assert checked >= 3


def test_fused_bf16_no_zero_diffV():
    from pairwise_perturbation_tpu.utils import synth
    V = synth.make_tensor("r", dim=4, s=10, R=3, seed=11, dtype=np.float64)
    V16 = jnp.asarray(V, dtype=jnp.bfloat16)
    Vn = float(np.linalg.norm(V))
    W0 = cp.init_factors(V.shape, 3, dtype=jnp.float32)
    cfg = cp.CPConfig(tol=1e-9 * Vn, pp_res_tol=0.1, maxiter=50, resprint=5)
    res = cp.als_cp_pp_fused(V16, W0, cfg, chunk=16)
    assert res.history
    for row in res.history:
        assert row["diffV"] > 0.0
        assert np.isfinite(row["gradnorm"])


def test_tucker_fused_converges(rng):
    from pairwise_perturbation_tpu.models import tucker
    shape, ranks = (8, 8, 8, 8), (3, 3, 3, 3)
    core = rng.standard_normal(ranks)
    Wt = [np.linalg.qr(rng.standard_normal((s, r)))[0]
          for s, r in zip(shape, ranks)]
    V = np.einsum("PQRS,aP,bQ,cR,dS->abcd", core, *Wt)
    V = V + 0.02 * np.linalg.norm(V) / (np.prod(shape) ** 0.5) \
        * rng.standard_normal(shape)
    Vn = np.linalg.norm(V)
    # tol=0: run to maxiter so the machine demonstrably cycles DT -> PP
    # (this HOOI problem converges in ~2 sweeps otherwise)
    cfg = tucker.TuckerConfig(tol=0.0, pp_res_tol=0.3, maxiter=40,
                              resprint=1)
    res = tucker.als_tucker_pp_fused(V, ranks, cfg, chunk=16)
    assert np.isfinite(res.diffV)
    assert any(h["pp"] == 1 for h in res.history), "no PP rows"
    # fit comparable to the per-phase device machine
    res_d = tucker.als_tucker_pp_device(
        V, ranks, tucker.TuckerConfig(tol=1e-12 * Vn, pp_res_tol=0.3,
                                      maxiter=40, resprint=2))
    assert res.diffV < max(1.5 * res_d.diffV, 1e-5 * Vn)
    # labels well-formed and dtime monotone
    labels = [h["iter"] for h in res.history]
    assert labels == sorted(labels) and labels[0] == 0
    dts = [h["dtime"] for h in res.history]
    assert all(b >= a for a, b in zip(dts, dts[1:]))
