import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.ops import solve


def spd(rng, R):
    A = rng.standard_normal((R, R))
    return A @ A.T + R * np.eye(R)


def test_svd_solve(rng):
    R = 6
    S = spd(rng, R)
    W_true = rng.standard_normal((10, R))
    M = W_true @ S
    W = solve.svd_solve(jnp.asarray(M), jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(W), W_true, rtol=1e-8)


def test_cholesky_solve(rng):
    R = 5
    S = spd(rng, R)
    W_true = rng.standard_normal((8, R))
    M = W_true @ S
    W = solve.cholesky_solve(jnp.asarray(M), jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(W), W_true, rtol=1e-8)


def test_svd_solve_mod_damping(rng):
    R = 4
    S = spd(rng, R)
    W_true = rng.standard_normal((7, R))
    M = W_true @ S
    W_init = rng.standard_normal((7, R))
    # ratio 1: full step
    W, dW = solve.svd_solve_mod(jnp.asarray(M), jnp.asarray(W_init),
                                jnp.asarray(S), 1.0)
    np.testing.assert_allclose(np.asarray(W), W_true, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(dW), W_true - W_init, rtol=1e-8)
    # ratio 0.5: half step
    W, dW = solve.svd_solve_mod(jnp.asarray(M), jnp.asarray(W_init),
                                jnp.asarray(S), 0.5)
    np.testing.assert_allclose(np.asarray(W), W_init + 0.5 * (W_true - W_init),
                               rtol=1e-8)


def test_truncated_eigh_top_subspace(rng):
    G = spd(rng, 8)
    U, w = solve.truncated_eigh(jnp.asarray(G), 3)
    lam, Q = np.linalg.eigh(G)
    np.testing.assert_allclose(np.asarray(w), lam[::-1][:3], rtol=1e-10)
    # subspace match (up to sign)
    want = Q[:, ::-1][:, :3]
    overlap = np.abs(np.asarray(U).T @ want)
    np.testing.assert_allclose(overlap, np.eye(3), atol=1e-8)


def test_sign_match():
    U = jnp.asarray(np.array([[1.0, -2.0], [0.5, 1.0]]))
    W_ref = jnp.asarray(np.array([[-1.0, -2.0], [-0.5, 1.0]]))
    out = np.asarray(solve.sign_match(U, W_ref))
    # col 0: diag = -1-0.25 <0 -> flip; col 1: 4+1>0 -> keep
    np.testing.assert_allclose(out[:, 0], [-1.0, -0.5])
    np.testing.assert_allclose(out[:, 1], [-2.0, 1.0])


def test_randomized_svd_low_rank(rng):
    m, n, r = 30, 20, 4
    A = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    U, s, VT = solve.randomized_svd(jnp.asarray(A), r, n_iter=2)
    recon = np.asarray(U) * np.asarray(s) @ np.asarray(VT)
    np.testing.assert_allclose(recon, A, atol=1e-6)


def test_rankR_update_cholesky(rng):
    R = 5
    S = spd(rng, R)
    A = rng.standard_normal((12, R))
    W_target = rng.standard_normal((12, R))
    M = W_target @ S
    # full-rank update: U s VT must reconstruct dW = W_target - A
    U, s, VT = solve.rankR_update_cholesky(jnp.asarray(M), jnp.asarray(A),
                                           jnp.asarray(S), R)
    dW = np.asarray(U) * np.asarray(s) @ np.asarray(VT)
    np.testing.assert_allclose(dW, W_target - A, atol=1e-7)


def test_gauss_seidel_converges(rng):
    R = 4
    Gamma = spd(rng, R)
    A_true = rng.standard_normal((6, R))
    F = A_true @ Gamma
    A0 = jnp.zeros((6, R))
    A = solve.gauss_seidel(A0, jnp.asarray(F), jnp.asarray(Gamma), 200)
    np.testing.assert_allclose(np.asarray(A), A_true, atol=1e-6)
