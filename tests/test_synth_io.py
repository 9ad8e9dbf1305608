import os

import numpy as np
import pytest

from pairwise_perturbation_tpu.utils import io as ppio
from pairwise_perturbation_tpu.utils import synth


def test_laplacian_matches_kron_sum():
    s, dim = 3, 4
    V = synth.laplacian_tensor(dim, s, symmetric=True)
    D = synth.laplacian_matrix(s)
    I = np.eye(s)
    # reference layout: V[a,b,c,d] = D[a,b] I[c,d] + I[a,b] D[c,d]
    # (mode-pair k holds D's index pair adjacent, common.cxx:538, 550)
    want = np.multiply.outer(D, I) + np.multiply.outer(I, D)
    np.testing.assert_allclose(V, want)


def test_poisson_folded_is_exact_low_rank():
    V = synth.poisson_folded(6, 4)  # order-3, modes 16, CP rank <= 3
    for mode in range(3):
        unf = np.moveaxis(V, mode, 0).reshape(V.shape[mode], -1)
        rank = np.linalg.matrix_rank(unf)
        assert rank <= 3


def test_gen_collinearity_in_range(rng):
    col_min, col_max = 0.5, 0.9
    V = synth.gen_collinearity([10, 10, 10], 3, col_min, col_max, rng)
    assert V.shape == (10, 10, 10)
    assert np.all(np.isfinite(V))


def test_gen_collinearity_factors_match_tensor():
    """gen_collinearity == sum_i lam_i outer(Ws[:, i]) with the factors
    from gen_collinearity_factors under the same rng stream, and every
    same-mode factor pair respects the collinearity bounds
    (Gen_collinearity, common.cxx:361-423)."""
    col_min, col_max = 0.5, 0.9
    V = synth.gen_collinearity([6, 7, 8], 3, col_min, col_max,
                               np.random.default_rng(0))
    Ws, lams = synth.gen_collinearity_factors(
        [6, 7, 8], 3, col_min, col_max, np.random.default_rng(0))
    V2 = np.zeros((6, 7, 8))
    for i in range(3):
        V2 += lams[i] * np.einsum("a,b,c->abc", Ws[0][:, i], Ws[1][:, i],
                                  Ws[2][:, i])
    np.testing.assert_allclose(V, V2, rtol=1e-12)
    for j in range(3):
        for i in range(1, 3):
            for k in range(i):
                c = synth.collinearity(Ws[j][:, i], Ws[j][:, k])
                assert col_min <= c <= col_max


def test_unit_tensor_formula():
    s = 4
    V = synth.unit_tensor(3, s)
    assert V.sum() == s * s
    for c in range(s):
        for r in range(s):
            assert V[c, r, (r + c * (s - 1)) % s] == 1.0


def test_make_tensor_dispatch(rng):
    for name in ["p", "p2", "c", "r", "r2"]:
        V = synth.make_tensor(name, dim=4, s=4, R=2, seed=0)
        assert np.all(np.isfinite(V))
        assert V.dtype == np.float32


def test_binary_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    V = rng.standard_normal((3, 4, 5))
    p = str(tmp_path / "t.bin")
    ppio.write_dense_binary(p, V)
    back = ppio.read_dense_binary(p, (3, 4, 5), out_dtype=np.float64)
    np.testing.assert_allclose(back, V)
    back32 = ppio.read_dense_binary(p, (3, 4, 5), out_dtype=np.float32)
    np.testing.assert_allclose(back32, V.astype(np.float32))


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    Ws = [rng.random((5, 2)), rng.random((6, 2))]
    core = rng.random((2, 2))
    p = str(tmp_path / "ckpt")
    ppio.save_checkpoint(p, Ws, iteration=17, core=core, meta={"model": "CP"})
    back = ppio.load_checkpoint(p)
    assert back["iteration"] == 17
    assert back["meta"] == {"model": "CP"}
    np.testing.assert_allclose(back["core"], core)
    for a, b in zip(back["factors"], Ws):
        np.testing.assert_allclose(a, b)
