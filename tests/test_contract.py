"""Unit tests for ops.contract against numpy oracles.

Test strategy per SURVEY.md section 4: every contraction verified against a
naive einsum oracle; PP caches verified against direct partial contractions.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.ops import contract


def random_problem(rng, shape, R, dtype=np.float64):
    V = rng.standard_normal(shape).astype(dtype)
    Ws = [rng.standard_normal((s, R)).astype(dtype) for s in shape]
    return V, Ws


def naive_mttkrp(V, Ws, mode):
    order = V.ndim
    letters = "abcdefgh"[:order]
    terms = [letters]
    ops = [V]
    for j in range(order):
        if j == mode:
            continue
        terms.append(letters[j] + "z")
        ops.append(Ws[j])
    return np.einsum(",".join(terms) + "->" + letters[mode] + "z", *ops)


@pytest.mark.parametrize("shape", [(6, 7, 8), (4, 5, 6, 7), (3, 4, 3, 4, 3)])
def test_mttkrp_matches_oracle(rng, shape):
    V, Ws = random_problem(rng, shape, R=5)
    for mode in range(len(shape)):
        got = contract.mttkrp(jnp.asarray(V), [jnp.asarray(W) for W in Ws], mode)
        want = naive_mttkrp(V, Ws, mode)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_partial_mttkrp_and_pp_caches(rng):
    shape = (4, 5, 6, 7)
    V, Ws = random_problem(rng, shape, R=3)
    jV = jnp.asarray(V)
    jWs = [jnp.asarray(W) for W in Ws]
    single, pair = contract.build_pp_caches(jV, jWs)
    order = len(shape)
    letters = "abcd"
    for i in range(order):
        np.testing.assert_allclose(np.asarray(single[i]),
                                   naive_mttkrp(V, Ws, i), rtol=1e-10)
    for i in range(order):
        for j in range(i + 1, order):
            terms, ops = [letters], [V]
            for m in range(order):
                if m in (i, j):
                    continue
                terms.append(letters[m] + "z")
                ops.append(Ws[m])
            want = np.einsum(",".join(terms) + "->z" + letters[i] + letters[j],
                             *ops)  # caches are rank-major (R, s_i, s_j)
            np.testing.assert_allclose(np.asarray(pair[(i, j)]), want, rtol=1e-10)


def test_pp_correction_first_order(rng):
    """PP-corrected MTTKRP == exact MTTKRP when only ONE other factor moved,
    and the perturbation enters linearly (first-order exactness,
    the core PP property from arXiv:1811.10573)."""
    shape = (4, 5, 6, 7)
    V, Ws = random_problem(rng, shape, R=3)
    jV = jnp.asarray(V)
    jWs = [jnp.asarray(W) for W in Ws]
    single, pair = contract.build_pp_caches(jV, jWs)
    # perturb exactly one mode j; correction for any i != j must be exact
    j = 2
    dW = rng.standard_normal(Ws[j].shape)
    dWs = [jnp.zeros_like(W) for W in jWs]
    dWs[j] = jnp.asarray(dW)
    Ws_new = [W.copy() for W in Ws]
    Ws_new[j] = Ws[j] + dW
    for i in range(len(shape)):
        if i == j:
            continue
        got = contract.pp_correct_mttkrp(single[i], pair, dWs, i)
        want = naive_mttkrp(V, Ws_new, i)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9)


def test_hadamard_gram_and_residual_identity(rng):
    shape = (5, 6, 7)
    V, Ws = random_problem(rng, shape, R=4)
    jV = jnp.asarray(V)
    jWs = [jnp.asarray(W) for W in Ws]
    # residual identity vs explicit reconstruction
    Vns = float(np.sum(V * V))
    M_last = contract.mttkrp(jV, jWs, len(shape) - 1)
    fast = contract.cp_residual_norm(Vns, M_last, jWs)
    exact = contract.cp_residual_exact(jV, jWs)
    np.testing.assert_allclose(float(fast), float(exact), rtol=1e-8)


def test_build_dense_oracle(rng):
    _, Ws = random_problem(rng, (4, 5, 6), R=3)
    got = contract.build_dense([jnp.asarray(W) for W in Ws])
    want = np.einsum("az,bz,cz->abc", *Ws)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)


def test_normalize_factors(rng):
    _, Ws = random_problem(rng, (4, 5, 6), R=3)
    out = contract.normalize_factors([jnp.asarray(W) for W in Ws])
    norms = [float(jnp.linalg.norm(W.ravel())) for W in out]
    assert np.allclose(norms, norms[0], rtol=1e-10)
    # reconstruction unchanged? Normalize rescales columns jointly only by
    # overall factor norms, so the product of norms is preserved:
    before = np.prod([np.linalg.norm(W) for W in Ws])
    after = np.prod(norms)
    np.testing.assert_allclose(after, before, rtol=1e-10)


def test_ttmc_and_caches(rng):
    shape = (4, 5, 6)
    ranks = (2, 3, 4)
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, r)) for s, r in zip(shape, ranks)]
    jV, jWs = jnp.asarray(V), [jnp.asarray(W) for W in Ws]
    # full TTMc (core)
    want = np.einsum("abc,aP,bQ,cR->PQR", V, *Ws)
    got = contract.ttmc(jV, jWs, skip_mode=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-10)
    # skip one mode
    want1 = np.einsum("abc,aP,cR->PbR", V, Ws[0], Ws[2])
    got1 = contract.ttmc(jV, jWs, skip_mode=1)
    np.testing.assert_allclose(np.asarray(got1), want1, rtol=1e-10)
    # transpose reconstruction: core x W^T
    core = got
    recon_want = np.einsum("PQR,aP,bQ,cR->abc", np.asarray(core), *Ws)
    recon = contract.ttmc(core, [W.T for W in jWs], skip_mode=-1,
                          transpose=False)
    # ttmc with transposed matrices maps rank->size
    np.testing.assert_allclose(np.asarray(
        contract.ttmc(core, jWs, skip_mode=-1, transpose=True)),
        recon_want, rtol=1e-10)
    # caches
    single, pairc = contract.build_ttmc_caches(jV, jWs)
    np.testing.assert_allclose(np.asarray(single[1]), want1, rtol=1e-10)
    want_pair = np.einsum("abc,cR->abR", V, Ws[2])
    np.testing.assert_allclose(np.asarray(pairc[(0, 1)]), want_pair, rtol=1e-10)


def test_pp_correct_ttmc_first_order(rng):
    shape = (4, 5, 6, 7)
    ranks = (2, 3, 2, 3)
    V = rng.standard_normal(shape)
    Ws = [rng.standard_normal((s, r)) for s, r in zip(shape, ranks)]
    jV, jWs = jnp.asarray(V), [jnp.asarray(W) for W in Ws]
    single, pairc = contract.build_ttmc_caches(jV, jWs)
    j = 3
    dW = rng.standard_normal(Ws[j].shape)
    dWs = [jnp.zeros_like(W) for W in jWs]
    dWs[j] = jnp.asarray(dW)
    Ws_new = [W.copy() for W in Ws]
    Ws_new[j] = Ws[j] + dW
    i = 1
    got = contract.pp_correct_ttmc(single[i], pairc, dWs, i)
    want = np.einsum("abcd,aP,cR,dS->PbRS", V, Ws_new[0], Ws_new[2], Ws_new[3])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-9)


def test_mode_gram(rng):
    T = rng.standard_normal((4, 5, 6))
    got = contract.mode_gram(jnp.asarray(T), 1)
    unf = T.transpose(1, 0, 2).reshape(5, -1)
    np.testing.assert_allclose(np.asarray(got), unf @ unf.T, rtol=1e-10)
