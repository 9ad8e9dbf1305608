"""Trajectory parity against a direct numpy transcription of the reference
semantics (als_CP.cxx), written independently of the framework code paths.

The oracle implements, in plain numpy:
- sequential Gauss-Seidel ALS sweeps with SVD pseudo-inverse solves and
  geometric-mean normalization (== alsCP_DT's tree sweep: the binary-tree
  cache staleness is exactly Gauss-Seidel ordering);
- PP sweeps with pairwise caches built from W_init, cumulative dW, damped
  solves, and post-sweep normalization (alsCP_PP_sub:753-825).

Factor trajectories must match the framework's jitted sweeps to f64
round-off for several sweeps.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract


def np_mttkrp(V, Ws, mode):
    order = V.ndim
    letters = "abcdefgh"[:order]
    terms, ops = [letters], [V]
    for j in range(order):
        if j == mode:
            continue
        terms.append(letters[j] + "z")
        ops.append(Ws[j])
    return np.einsum(",".join(terms) + "->" + letters[mode] + "z", *ops,
                     optimize=True)


def np_S(Ws, skip, lam=0.0):
    S = None
    for j, W in enumerate(Ws):
        if j == skip:
            continue
        G = W.T @ W
        S = G if S is None else S * G
    if lam:
        S = S + lam * np.eye(S.shape[0])
    return S


def np_svd_solve(M, S):
    return M @ np.linalg.pinv(S)


def np_normalize(Ws):
    norms = [np.linalg.norm(W) for W in Ws]
    target = np.prod(norms) ** (1.0 / len(Ws))
    return [W * (target / n) for W, n in zip(Ws, norms)]


def np_dt_sweep(V, Ws):
    """One Gauss-Seidel ALS sweep (== tree sweep), SVD solve, normalize."""
    Ws = [W.copy() for W in Ws]
    grads = []
    for i in range(V.ndim):
        M = np_mttkrp(V, Ws, i)
        S = np_S(Ws, i)
        grads.append(-M + Ws[i] @ S)
        Ws[i] = np_svd_solve(M, S)
    return np_normalize(Ws), grads


def np_pp_caches(V, Ws):
    order = V.ndim
    letters = "abcdefgh"[:order]
    single, pair = {}, {}
    for i in range(order):
        single[i] = np_mttkrp(V, Ws, i)
    for i in range(order):
        for j in range(i + 1, order):
            terms, ops = [letters], [V]
            for m in range(order):
                if m in (i, j):
                    continue
                terms.append(letters[m] + "z")
                ops.append(Ws[m])
            pair[(i, j)] = np.einsum(
                ",".join(terms) + "->" + letters[i] + letters[j] + "z", *ops,
                optimize=True)
    return single, pair


def np_pp_sweep(single, pair, Ws, W_init, dWs, ratio):
    order = len(Ws)
    Ws = [W.copy() for W in Ws]
    dWs = [d.copy() for d in dWs]
    for i in range(order):
        M = single[i].copy()
        for j in range(order):
            if j == i:
                continue
            if j < i:
                M += np.einsum("abz,az->bz", pair[(j, i)], dWs[j])
            else:
                M += np.einsum("abz,bz->az", pair[(i, j)], dWs[j])
        S = np_S(Ws, i)
        W_new = np_svd_solve(M, S)
        dWs[i] = ratio * (W_new - W_init[i])
        Ws[i] = W_init[i] + dWs[i]
    return np_normalize(Ws), dWs


@pytest.fixture
def fixture(rng):
    shape, R = (5, 6, 7, 8), 3
    Ws_true = [rng.random((s, R)) for s in shape]
    V = np.einsum("az,bz,cz,dz->abcd", *Ws_true)
    W0 = [rng.random((s, R)) for s in shape]
    return V, W0


def test_dt_trajectory_parity(fixture):
    V, W0 = fixture
    Ws_np = [W.copy() for W in W0]
    Ws_fw = [jnp.asarray(W) for W in W0]
    lam = jnp.asarray(0.0)
    for sweep in range(4):
        Ws_np, grads_np = np_dt_sweep(V, Ws_np)
        Ws_fw, grads_fw = cp.dt_sweep(jnp.asarray(V), Ws_fw, lam, solver="svd")
        for i, (a, b) in enumerate(zip(Ws_np, Ws_fw)):
            np.testing.assert_allclose(a, np.asarray(b), rtol=1e-8,
                                       atol=1e-10,
                                       err_msg=f"sweep {sweep} mode {i}")
        for i, (a, b) in enumerate(zip(grads_np, grads_fw)):
            np.testing.assert_allclose(a, np.asarray(b), rtol=1e-7,
                                       atol=1e-9)


def test_pp_trajectory_parity(fixture):
    V, W0 = fixture
    # warm start so PP is in its region of validity
    Ws = [W.copy() for W in W0]
    for _ in range(5):
        Ws, _ = np_dt_sweep(V, Ws)
    W_init = [W.copy() for W in Ws]
    single_np, pair_np = np_pp_caches(V, Ws)
    single_fw, pair_fw = cp.pp_build_caches(jnp.asarray(V),
                                            [jnp.asarray(W) for W in Ws])
    for i in single_np:
        np.testing.assert_allclose(single_np[i], np.asarray(single_fw[i]),
                                   rtol=1e-8)
    for k in pair_np:
        # framework caches are rank-major (R, s_i, s_j)
        np.testing.assert_allclose(pair_np[k],
                                   np.asarray(pair_fw[k]).transpose(1, 2, 0),
                                   rtol=1e-8)
    dWs_np = [np.zeros_like(W) for W in Ws]
    dWs_fw = [jnp.zeros_like(jnp.asarray(W)) for W in Ws]
    Ws_np = [W.copy() for W in Ws]
    Ws_fw = [jnp.asarray(W) for W in Ws]
    lam = jnp.asarray(0.0)
    for sweep in range(3):
        Ws_np, dWs_np = np_pp_sweep(single_np, pair_np, Ws_np, W_init,
                                    dWs_np, 1.0)
        Ws_fw, dWs_fw, _ = cp.pp_sweep(single_fw, pair_fw, Ws_fw,
                                       [jnp.asarray(W) for W in W_init],
                                       dWs_fw, lam, 1.0, solver="svd")
        for i, (a, b) in enumerate(zip(Ws_np, Ws_fw)):
            np.testing.assert_allclose(a, np.asarray(b), rtol=1e-7,
                                       atol=1e-9,
                                       err_msg=f"sweep {sweep} mode {i}")
