"""Sparse (COO) CP engine tests: kernels vs dense oracles, solver
convergence parity, CLI flag surface (-issparse, test_ALS.cxx:126-131)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.models import cp, sparse_cp
from pairwise_perturbation_tpu.ops import contract, sparse as spo
from pairwise_perturbation_tpu.utils import synth


def _sparse_problem(rng, shape=(7, 6, 8, 5), density=0.15, R=3):
    V = np.zeros(shape)
    nnz = int(density * V.size)
    flat = rng.choice(V.size, size=nnz, replace=False)
    V.ravel()[flat] = rng.standard_normal(nnz)
    st = spo.from_dense(V)
    Ws = [jnp.asarray(rng.standard_normal((s, R))) for s in shape]
    return V, st, Ws


def test_from_to_dense_roundtrip(rng):
    V, st, _ = _sparse_problem(rng)
    np.testing.assert_allclose(np.asarray(spo.to_dense(st)), V, rtol=1e-12)
    assert st.nnz < V.size


def test_sparse_mttkrp_matches_dense(rng):
    V, st, Ws = _sparse_problem(rng)
    for mode in range(V.ndim):
        got = spo.mttkrp(st, Ws, mode)
        want = contract.mttkrp(jnp.asarray(V), Ws, mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-9, atol=1e-12)


def test_sparse_pair_caches_match_dense(rng):
    V, st, Ws = _sparse_problem(rng)
    single_s, pair_s = spo.build_pp_caches(st, Ws)
    single_d, pair_d = contract.build_pp_caches(jnp.asarray(V), list(Ws))
    for i in single_d:
        np.testing.assert_allclose(np.asarray(single_s[i]),
                                   np.asarray(single_d[i]),
                                   rtol=1e-9, atol=1e-12)
    for k in pair_d:
        np.testing.assert_allclose(np.asarray(pair_s[k]),
                                   np.asarray(pair_d[k]),
                                   rtol=1e-9, atol=1e-12)


def test_sparse_diagnostics_match_dense(rng):
    V, st, Ws = _sparse_problem(rng)
    Vj = jnp.asarray(V)
    Vn2 = contract.norm_sq(Vj)
    gn_s, dv_s = sparse_cp.sparse_diagnostics(spo.norm_sq(st), st, Ws)
    gn_d, dv_d = cp.cp_diagnostics(Vn2, Vj, list(Ws))
    np.testing.assert_allclose(float(gn_s), float(gn_d), rtol=1e-8)
    np.testing.assert_allclose(float(dv_s), float(dv_d), rtol=1e-8)


def test_sparse_als_matches_dense_trajectory(rng):
    """Plain sparse ALS == plain dense ALS (same math, same iterates)."""
    V, st, _ = _sparse_problem(rng, shape=(6, 7, 5, 6))
    W0 = cp.init_factors(V.shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, maxiter=10, resprint=5)
    res_s = sparse_cp.als_cp_sparse(st, [jnp.array(w) for w in W0], cfg)
    res_d = cp.als_cp(jnp.asarray(V), [jnp.array(w) for w in W0], cfg)
    np.testing.assert_allclose(res_s.diffV, res_d.diffV, rtol=1e-6)
    for a, b in zip(res_s.factors, res_d.factors):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-9)


def test_sparse_pp_converges_on_laplacian():
    """The designed-for case: the Poisson/laplacian tensor is sparse, and
    sparse PP converges like the dense engine."""
    # dim=8 folds to an order-4 (25,25,25,25) Poisson tensor
    V = synth.make_tensor("p", dim=8, s=5, R=3, seed=3, dtype=np.float64)
    density = np.count_nonzero(V) / V.size
    assert density < 0.3, density
    st = spo.from_dense(V)
    Vn = float(np.linalg.norm(V))
    W0 = cp.init_factors(V.shape, 3, dtype=jnp.float64)
    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.3, maxiter=40, resprint=10)
    res_s = sparse_cp.als_cp_pp_sparse(st, [jnp.array(w) for w in W0], cfg)
    res_d = cp.als_cp_pp(jnp.asarray(V), [jnp.array(w) for w in W0], cfg)
    assert np.isfinite(res_s.diffV)
    assert res_s.diffV < max(2.0 * res_d.diffV, 1e-6 * Vn)
    assert any(h["pp"] == 1 for h in res_s.history), "PP phase never ran"


def test_cli_issparse(tmp_path):
    from pairwise_perturbation_tpu import cli
    out = tmp_path / "s.csv"
    rc = cli.main(["test_als", "-model", "CP", "-tensor", "p", "-pp", "1",
                   "-dim", "8", "-size", "5", "-rank", "3", "-maxiter",
                   "15", "-resprint", "5", "-issparse", "1", "-quiet",
                   "-filename", str(out)])
    assert rc == 0
    rows = out.read_text().strip().splitlines()
    assert len(rows) > 2
    first, last = rows[1].split(","), rows[-1].split(",")
    assert float(last[5]) <= float(first[5])  # diffV decreased


def test_cli_issparse_out_of_scope_rejected():
    from pairwise_perturbation_tpu import cli
    with pytest.raises(SystemExit):
        cli.main(["test_als", "-model", "Tucker", "-tensor", "r2",
                  "-issparse", "1", "-quiet"])
    with pytest.raises(SystemExit):
        cli.main(["run", "-tensor", "r", "-issparse", "1", "-quiet"])
