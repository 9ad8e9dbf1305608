"""R x R and low-rank linear-algebra kit.

TPU-native replacements for the reference's ScaLAPACK-backed solves. The
Gram matrices S are tiny (R x R) so they are replicated and solved on-chip
with ``jax.lax.linalg`` primitives — there is no distributed dense LA layer
to port (SURVEY.md section 2.6).

- :func:`svd_solve`         <-> ``SVD_solve`` (common.cxx:710-725): W = M pinv(S),
                                via symmetric eigh instead of full SVD (S is
                                symmetric PSD, eigh == svd and is faster on TPU).
- :func:`svd_solve_mod`     <-> ``SVD_solve_mod`` (common.cxx:739-758): damped PP solve.
- :func:`cholesky_solve`    <-> ``cholesky_solve`` (common.cxx:727-737).
- :func:`randomized_svd`    <-> ``randomized_svd`` (common.cxx:691-708).
- :func:`rankR_update_cholesky` / :func:`rankR_update_svd`
                            <-> ``get_rankR_update_*`` (common.cxx:768-813):
                                rank-R factorization of the factor update
                                dW = M pinv(S) - A, used by the LR optimizers.
- :func:`apply_rankR_update` consumer lives in models/optimizers.py.
- :func:`gauss_seidel`      <-> ``Gauss_Seidel`` (common.cxx:840-868).
- :func:`truncated_eigh`    <-> the Gram + truncated-SVD trick used by Tucker
                                (als_Tucker.cxx:12-23, common.cxx:205-223).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pairwise_perturbation_tpu import config


def _prec(precision):
    return config.default_precision() if precision is None else precision


def _psd_pinv(S, rcond: Optional[float] = None, precision=None):
    """Pseudo-inverse of a symmetric PSD matrix via eigh.

    The reference takes raw reciprocals of singular values
    (common.cxx:720-722); ``rcond`` adds an f32-safe relative cutoff.
    """
    if rcond is None:
        rcond = config.get().rcond
    lam, Q = jnp.linalg.eigh(S)
    cutoff = rcond * jnp.max(jnp.abs(lam))
    inv = jnp.where(jnp.abs(lam) > cutoff, 1.0 / lam, 0.0)
    return jnp.einsum("ik,k,jk->ij", Q, inv, Q, precision=_prec(precision))


def svd_solve(M, S, rcond: Optional[float] = None, precision=None):
    """Solve W S = M for W (S symmetric PSD): W = M pinv(S)."""
    return jnp.matmul(M, _psd_pinv(S, rcond, precision),
                      precision=_prec(precision))


def svd_solve_mod(M, W_init, S, ratio_step: float, rcond: Optional[float] = None,
                  precision=None):
    """Damped PP solve. Returns (W_new, dW) with

    dW = ratio_step * (M pinv(S) - W_init),  W_new = W_init + dW

    (identical to the reference for ratio_step == 1, common.cxx:752-756).
    """
    W_solved = svd_solve(M, S, rcond, precision)
    dW = ratio_step * (W_solved - W_init)
    return W_init + dW, dW


def cholesky_solve(M, S, precision=None):
    """Solve W S = M via Cholesky of S (common.cxx:727-737)."""
    L = jnp.linalg.cholesky(S)
    # S = L L^T; W S = M  =>  S W^T = M^T  =>  two triangular solves.
    y = jax.scipy.linalg.solve_triangular(L, M.T, lower=True)
    Wt = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    return Wt.T


def auto_solve(M, S, rcond: Optional[float] = None, precision=None):
    """Cholesky solve with an on-device pseudo-inverse fallback when S is
    numerically not positive definite (the collinearity fixtures are built
    to make S near-singular — the reason SVD_solve exists in the reference,
    common.cxx:710-725). Both branches compile; runtime picks via cond."""
    L = jnp.linalg.cholesky(S)
    ok = jnp.all(jnp.isfinite(L))
    return jax.lax.cond(
        ok,
        lambda _: cholesky_solve(M, S, precision),
        lambda _: svd_solve(M, S, rcond, precision),
        None)


def solve(M, S, method: str = "chol", rcond: Optional[float] = None,
          precision=None):
    if method == "chol":
        return cholesky_solve(M, S, precision)
    if method == "auto":
        return auto_solve(M, S, rcond, precision)
    return svd_solve(M, S, rcond, precision)


def truncated_eigh(G, k: int):
    """Top-``k`` eigenvectors of a symmetric PSD matrix, descending.

    Used for leading singular vectors of an unfolding via its Gram matrix
    (the reference's MTM.svd(U, S, VT, rank) path, als_Tucker.cxx:12-23).
    Returns (U[s, k], lam[k]).
    """
    lam, Q = jnp.linalg.eigh(G)
    U = Q[:, ::-1][:, :k]
    w = lam[::-1][:k]
    return U, w


def fix_sign_columns(U):
    """Deterministic column sign convention: largest-|.| entry positive.

    eigh/SVD column signs are arbitrary; this makes runs reproducible
    before the reference's explicit sign-fix vs the previous factors
    (als_Tucker.cxx:632-643) is applied.
    """
    idx = jnp.argmax(jnp.abs(U), axis=0)
    signs = jnp.sign(U[idx, jnp.arange(U.shape[1])])
    signs = jnp.where(signs == 0, 1.0, signs)
    return U * signs


def sign_match(U, W_ref, precision=None):
    """Flip column signs of U to align with W_ref: U <- U diag(sign(diag(U^T W_ref))).

    Reference: als_Tucker.cxx:632-643 / 874-885. Without this the Tucker dW
    is meaningless across sweeps (subspaces equal up to column sign).
    """
    d = jnp.sum(U * W_ref, axis=0)
    s = jnp.where(d > 0, 1.0, -1.0).astype(U.dtype)
    return U * s


def randomized_svd(A, r: int, n_iter: int = 1, key=None, precision=None):
    """Randomized range-finder truncated SVD (common.cxx:691-708).

    Returns (U[m, r], s[r], VT[r, n]).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    m, n = A.shape
    X = jax.random.uniform(key, (n, r), dtype=A.dtype)
    Q, _ = jnp.linalg.qr(X)
    for _ in range(n_iter):
        # X = A^T A Q  (power iteration on the Gram)
        X = jnp.matmul(A.T, jnp.matmul(A, Q, precision=_prec(precision)),
                       precision=_prec(precision))
        Q, _ = jnp.linalg.qr(X)
    B = jnp.matmul(A, Q, precision=_prec(precision))
    U, s, VT_small = jnp.linalg.svd(B, full_matrices=False)
    U, s, VT_small = U[:, :r], s[:r], VT_small[:r, :]
    VT = jnp.matmul(VT_small, Q.T, precision=_prec(precision))
    return U, s, VT


def truncated_svd(A, r: int):
    """Exact truncated SVD."""
    U, s, VT = jnp.linalg.svd(A, full_matrices=False)
    return U[:, :r], s[:r], VT[:r, :]


def rankR_update_cholesky(M, A, S, r: int, random: bool = False, key=None,
                          precision=None):
    """Rank-``r`` factorization (U, s, VT) of dW = M pinv(S) - A.

    Equivalent to the reference's ``get_rankR_update_cholesky``
    (common.cxx:768-786): there X = (M - A S) L^{-T} is factorized and the
    right factor is mapped back through L^{-1}; the composition equals a
    truncated factorization of (M - A S) S^{-1} = M S^{-1} - A. We compute
    dW directly with a Cholesky solve, then truncate.
    """
    rhs = M - jnp.matmul(A, S, precision=_prec(precision))
    dW = cholesky_solve(rhs, S, precision)
    if random:
        return randomized_svd(dW, r, n_iter=1, key=key, precision=precision)
    return truncated_svd(dW, r)


def rankR_update_svd(M, A, S, r: int, random: bool = False, key=None,
                     precision=None):
    """Same as :func:`rankR_update_cholesky` but whitening through the
    eigendecomposition of S (common.cxx:788-813)."""
    rhs = M - jnp.matmul(A, S, precision=_prec(precision))
    dW = jnp.matmul(rhs, _psd_pinv(S, precision=precision),
                    precision=_prec(precision))
    if random:
        return randomized_svd(dW, r, n_iter=1, key=key, precision=precision)
    return truncated_svd(dW, r)


def gauss_seidel(A, F, Gamma, maxits: int, precision=None):
    """Gauss-Seidel relaxation for A Gamma = F (common.cxx:840-868).

    A is iterated: A <- A + (F - A Gamma) (L^{-1})^T with L the lower
    triangle (incl. diagonal) of Gamma.
    """
    L = jnp.tril(Gamma)

    def body(A, _):
        Rres = F - jnp.matmul(A, Gamma, precision=_prec(precision))
        # solve X L^T = Rres  => L X^T = Rres^T
        Xt = jax.scipy.linalg.solve_triangular(L, Rres.T, lower=True)
        return A + Xt.T, None
    A, _ = jax.lax.scan(body, A, None, length=maxits)
    return A
