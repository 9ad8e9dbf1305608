"""Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pairwise_perturbation_tpu.ops import contract
from pairwise_perturbation_tpu.ops.kernels import mttkrp_pallas


def test_mttkrp3_matches_einsum(rng):
    I, J, K, R = 40, 17, 23, 5
    V = rng.standard_normal((I, J, K)).astype(np.float32)
    B = rng.standard_normal((J, R)).astype(np.float32)
    C = rng.standard_normal((K, R)).astype(np.float32)
    got = mttkrp_pallas.mttkrp3(jnp.asarray(V), jnp.asarray(B),
                                jnp.asarray(C), tile_i=16, interpret=True)
    want = np.einsum("ijk,jz,kz->iz", V, B, C)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=1e-4)


def test_mttkrp3_mode_transposed(rng):
    shape, R = (12, 14, 16), 4
    V = rng.standard_normal(shape).astype(np.float32)
    Ws = [rng.standard_normal((s, R)).astype(np.float32) for s in shape]
    jV = jnp.asarray(V)
    jWs = [jnp.asarray(W) for W in Ws]
    for mode in range(3):
        got = mttkrp_pallas.mttkrp3_mode(jV, jWs, mode, tile_i=8,
                                         interpret=True)
        want = contract.mttkrp(jV, jWs, mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("shape,mode", [
    ((3, 16, 24, 50), 1),     # order-4 middle mode (coil-100 structure)
    ((3, 16, 24, 50), 2),
    ((3, 16, 24, 50), 0),
    ((16, 24, 50), 0),        # order-3 leading mode
    ((16, 24, 50), 1),
    ((8, 8, 8, 8, 8, 8), 2),  # order-6 (synthetic fixtures)
])
def test_mid_contract_matches_einsum(rng, shape, mode):
    R = 5
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((shape[mode], R)).astype(np.float32))
    got = mttkrp_pallas.mid_contract(V, W, mode, interpret=True)
    want, rem = contract.contract_mode_kr(
        V, tuple(range(len(shape))), False, W, mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_mid_contract_ragged_lane_tile(rng):
    # M = 150 is not a multiple of the 128-lane tile: exercises the
    # out-of-bounds padded last block + slice-off path.
    shape, mode, R = (16, 10, 15), 0, 3
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((shape[mode], R)).astype(np.float32))
    got = mttkrp_pallas.mid_contract(V, W, mode, interpret=True)
    want = jnp.einsum("abc,aZ->bcZ", V, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_first_contraction_pallas_route(rng):
    # M = 16*2048 = 32768 exercises the eligible (long merged trailing
    # dim) kernel route rather than the XLA fallback.
    shape, R = (2, 16, 16, 2048), 5
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((shape[1], R)).astype(np.float32))
    from pairwise_perturbation_tpu.ops.kernels import mttkrp_pallas
    assert mttkrp_pallas.mid_contract_eligible(shape, 1, V.dtype, R)
    got, rem = contract.first_contraction(V, None, W, 1, use_pallas=True,
                                          interpret=True)
    want, rem2 = contract.first_contraction(V, None, W, 1, use_pallas=False)
    assert rem == rem2 == (0, 2, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_build_pp_caches_pallas_route(rng):
    shape, R = (6, 16, 24, 130), 4
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    Ws = [jnp.asarray(rng.standard_normal((s, R)).astype(np.float32))
          for s in shape]
    s_p, p_p = contract.build_pp_caches(V, Ws, use_pallas=True,
                                        interpret=True)
    s_x, p_x = contract.build_pp_caches(V, Ws, use_pallas=False)
    for i in s_x:
        np.testing.assert_allclose(np.asarray(s_p[i]), np.asarray(s_x[i]),
                                   rtol=2e-4, atol=1e-3)
    for ij in p_x:
        np.testing.assert_allclose(np.asarray(p_p[ij]), np.asarray(p_x[ij]),
                                   rtol=2e-4, atol=1e-3)


def test_mttkrp3_bf16_inputs(rng):
    """bf16-stored V: the fused kernel computes with f32 accumulation and
    returns f32, matching the mixed-precision einsum path."""
    I, J, K, R = 32, 24, 40, 5
    V = jnp.asarray(rng.standard_normal((I, J, K)), dtype=jnp.bfloat16)
    B = jnp.asarray(rng.standard_normal((J, R)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((K, R)).astype(np.float32))
    got = mttkrp_pallas.mttkrp3(V, B, C, interpret=True)
    assert got.dtype == jnp.float32
    want = contract.mttkrp(V, [None, B, C], 0, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_mttkrp3_bf16_ragged_j(rng):
    """bf16 requires 16-row J tiles; J=20 exercises the zero-pad path."""
    I, J, K, R = 16, 20, 40, 4
    V = jnp.asarray(rng.standard_normal((I, J, K)), dtype=jnp.bfloat16)
    B = jnp.asarray(rng.standard_normal((J, R)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((K, R)).astype(np.float32))
    got = mttkrp_pallas.mttkrp3(V, B, C, interpret=True)
    want = contract.mttkrp(V, [None, B, C], 0, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("mode", [1, 2])
@pytest.mark.parametrize("shape", [(24, 16, 40), (13, 20, 17)])
def test_mttkrp3_mode_specialized_ragged(rng, shape, mode):
    """Modes 1/2 run in V's native layout (no transposed copy); ragged
    I and J exercise the zero-pad paths of both specialized kernels."""
    R = 5
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    Ws = [jnp.asarray(rng.standard_normal((s, R)).astype(np.float32))
          for s in shape]
    got = mttkrp_pallas.mttkrp3_mode(V, Ws, mode, interpret=True)
    want = contract.mttkrp(V, Ws, mode, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("mode", [1, 2])
def test_mttkrp3_mode_specialized_bf16(rng, mode):
    I, J, K, R = 16, 20, 40, 4
    V = jnp.asarray(rng.standard_normal((I, J, K)), dtype=jnp.bfloat16)
    Ws = [jnp.asarray(rng.standard_normal((s, R)).astype(np.float32))
          for s in (I, J, K)]
    got = mttkrp_pallas.mttkrp3_mode(V, Ws, mode, interpret=True)
    assert got.dtype == jnp.float32
    want = contract.mttkrp(V, Ws, mode, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_triple_roots_oracle(rng):
    """Triple chain-root kernel vs einsum oracles (ragged lane tile)."""
    P, B1, B2, M, R = 3, 16, 24, 1200, 5
    V = rng.standard_normal((P, B1, B2, M)).astype(np.float32)
    W1 = rng.standard_normal((B1, R)).astype(np.float32)
    W2 = rng.standard_normal((B2, R)).astype(np.float32)
    W3 = rng.standard_normal((M, R)).astype(np.float32)
    o1, o2, o3 = mttkrp_pallas.triple_roots(
        jnp.asarray(V), jnp.asarray(W1), jnp.asarray(W2), jnp.asarray(W3),
        interpret=True)
    np.testing.assert_allclose(np.asarray(o1),
                               np.einsum("pabm,ar->rpbm", V, W1),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o2),
                               np.einsum("pabm,br->rpam", V, W2),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o3),
                               np.einsum("pabm,mr->rpab", V, W3),
                               rtol=2e-5, atol=1e-4)


def test_build_pp_caches_triple_matches_plain(rng):
    """build_pp_caches with the fused triple-root pass == the plain
    chain build, on an eligible coil-class shape."""
    from pairwise_perturbation_tpu import config as ppcfg
    shape, R = (3, 16, 24, 1200), 4
    V = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    Ws = [jnp.asarray(rng.standard_normal((s, R)).astype(np.float32))
          for s in shape]
    assert mttkrp_pallas.triple_roots_eligible(shape, V.dtype, R)
    s_plain, p_plain = contract.build_pp_caches(V, list(Ws))
    with ppcfg.override(use_pallas_triple=True):
        s_tri, p_tri = contract.build_pp_caches.__wrapped__(
            V, list(Ws), interpret=True) \
            if hasattr(contract.build_pp_caches, "__wrapped__") \
            else contract.build_pp_caches(V, list(Ws), interpret=True)
    for i in s_plain:
        np.testing.assert_allclose(np.asarray(s_tri[i]),
                                   np.asarray(s_plain[i]),
                                   rtol=3e-5, atol=1e-4)
    for k in p_plain:
        np.testing.assert_allclose(np.asarray(p_tri[k]),
                                   np.asarray(p_plain[k]),
                                   rtol=3e-5, atol=1e-4)


def test_coo_mttkrp_pallas_matches_segment(rng):
    """Fused one-hot COO MTTKRP kernel (ops/kernels/coo_pallas.py) ==
    segment_sum oracle, every mode, interpret mode."""
    from pairwise_perturbation_tpu.ops import sparse as spo
    from pairwise_perturbation_tpu.ops.kernels import coo_pallas
    shape, R, nnz = (37, 50, 29, 61), 5, 3000
    idx = jnp.asarray(np.stack(
        [rng.integers(0, s, nnz) for s in shape], 1).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
    Ws = [jnp.asarray(rng.standard_normal((s, R)).astype(np.float32))
          for s in shape]
    st = spo.SparseTensor(idx, vals, shape)
    for mode in range(len(shape)):
        want = np.asarray(spo.mttkrp(st, Ws, mode, method="segment"))
        got = np.asarray(coo_pallas.coo_mttkrp(idx, vals, Ws, mode,
                                               block=512, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)


def test_coo_mttkrp_pallas_nnz_padding(rng):
    """nnz not a multiple of the block: padded entries (value 0) are
    exact zeros through the matmuls."""
    from pairwise_perturbation_tpu.ops import sparse as spo
    from pairwise_perturbation_tpu.ops.kernels import coo_pallas
    shape, R, nnz = (20, 31, 17), 4, 777   # 777 % 512 != 0
    idx = jnp.asarray(np.stack(
        [rng.integers(0, s, nnz) for s in shape], 1).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal(nnz).astype(np.float32))
    Ws = [jnp.asarray(rng.standard_normal((s, R)).astype(np.float32))
          for s in shape]
    st = spo.SparseTensor(idx, vals, shape)
    want = np.asarray(spo.mttkrp(st, Ws, 1, method="segment"))
    got = np.asarray(coo_pallas.coo_mttkrp(idx, vals, Ws, 1,
                                           block=512, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)
