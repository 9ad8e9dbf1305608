"""Non-interpret Pallas parity on real TPU hardware.

Covers the ADVICE round-1 findings: ragged shapes (e.g. (13, 20, 17))
must compile under Mosaic now that block sublane tiles are aligned, and
the bf16 kernels must match the mixed-precision einsum reference within
bf16 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_perturbation_tpu.ops import contract
from pairwise_perturbation_tpu.ops.kernels import mttkrp_pallas


def _ref_mttkrp(V, Ws, mode):
    # pure-XLA reference at HIGHEST precision
    return np.asarray(contract.mttkrp(
        jnp.asarray(V), [jnp.asarray(W) for W in Ws], mode,
        use_pallas=False))


SHAPES = [
    (64, 64, 64),      # aligned
    (13, 20, 17),      # ragged everywhere (the ADVICE repro shape)
    (200, 200, 200),   # the BASELINE minimum-slice config
    (7, 130, 33),      # ragged + non-multiple J
]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_mttkrp3_f32_parity(shape, mode):
    rng = np.random.default_rng(0)
    R = 10
    V = rng.standard_normal(shape).astype(np.float32)
    Ws = [rng.standard_normal((s, R)).astype(np.float32) for s in shape]
    ref = _ref_mttkrp(V, Ws, mode)
    out = np.asarray(mttkrp_pallas.mttkrp3_mode(
        jnp.asarray(V), [jnp.asarray(W) for W in Ws], mode))
    assert out.shape == ref.shape
    # scale-relative: kernel and XLA chain accumulate in different orders
    # (both are within ~2e-6 of f64 truth at 200^3; the old 2.5e-3
    # DEFAULT-precision bug fails this at 100x margin)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-5)


@pytest.mark.parametrize("shape", [(64, 64, 64), (13, 20, 17)])
@pytest.mark.parametrize("mode", [0, 1, 2])
def test_mttkrp3_bf16_parity(shape, mode):
    rng = np.random.default_rng(1)
    R = 8
    V = rng.standard_normal(shape).astype(np.float32)
    Ws = [rng.standard_normal((s, R)).astype(np.float32) for s in shape]
    Vb = jnp.asarray(V).astype(jnp.bfloat16)
    ref = _ref_mttkrp(V, Ws, mode)
    out = np.asarray(mttkrp_pallas.mttkrp3_mode(
        Vb, [jnp.asarray(W) for W in Ws], mode))
    assert out.dtype == np.float32
    # bf16 inputs: ~8-bit mantissa rounding relative to the f32 reference
    scale = np.maximum(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-2)


def test_m2_vmem_guard_fallback():
    # K*R beyond the resident-output budget must route to the
    # transposed-copy path and still be correct.
    rng = np.random.default_rng(2)
    R = 16
    old = mttkrp_pallas._M2_RESIDENT_BYTES
    mttkrp_pallas._M2_RESIDENT_BYTES = 1 << 10  # force the fallback
    try:
        shape = (24, 24, 64)
        V = rng.standard_normal(shape).astype(np.float32)
        Ws = [rng.standard_normal((s, R)).astype(np.float32) for s in shape]
        ref = _ref_mttkrp(V, Ws, 2)
        out = np.asarray(mttkrp_pallas.mttkrp3_mode(
            jnp.asarray(V), [jnp.asarray(W) for W in Ws], 2))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out / scale, ref / scale, atol=3e-5)
    finally:
        mttkrp_pallas._M2_RESIDENT_BYTES = old


def test_mid_contract_parity():
    rng = np.random.default_rng(3)
    shape = (8, 128, 1024)  # eligible: B=128, M=1024*? -> M=1024... needs M>=2^15
    # use an eligible shape: mode 1 of (8, 128, 32768) merged M = 32768
    shape = (4, 128, 256, 128)
    V = rng.standard_normal(shape).astype(np.float32)
    W = rng.standard_normal((shape[1], 10)).astype(np.float32)
    if not mttkrp_pallas.mid_contract_eligible(shape, 1, jnp.float32, 10):
        pytest.skip("shape not eligible for mid_contract")
    out = np.asarray(mttkrp_pallas.mid_contract(jnp.asarray(V),
                                                jnp.asarray(W), 1))
    ref = np.asarray(contract.contract_mode_kr(
        jnp.asarray(V), (0, 1, 2, 3), False, jnp.asarray(W), 1)[0])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=3e-5)


def test_triple_roots_parity_tpu():
    """Triple chain-root kernel vs XLA on the real chip (coil-class
    shape, ragged lane tile)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pairwise_perturbation_tpu.ops.kernels import mttkrp_pallas as mp

    key = jax.random.PRNGKey(3)
    kv, k1, k2, k3 = jax.random.split(key, 4)
    P, B1, B2, M, R = 3, 64, 64, 1500, 6
    V = jax.random.uniform(kv, (P, B1, B2, M), dtype=jnp.float32)
    W1 = jax.random.uniform(k1, (B1, R), dtype=jnp.float32)
    W2 = jax.random.uniform(k2, (B2, R), dtype=jnp.float32)
    W3 = jax.random.uniform(k3, (M, R), dtype=jnp.float32)
    assert mp.triple_roots_eligible((P, B1, B2, M), jnp.float32, R)
    o1, o2, o3 = mp.triple_roots(V, W1, W2, W3)
    e1 = jnp.einsum("pabm,ar->rpbm", V, W1,
                    precision=jax.lax.Precision.HIGHEST)
    e2 = jnp.einsum("pabm,br->rpam", V, W2,
                    precision=jax.lax.Precision.HIGHEST)
    e3 = jnp.einsum("pabm,mr->rpab", V, W3,
                    precision=jax.lax.Precision.HIGHEST)
    for got, want in ((o1, e1), (o2, e2), (o3, e3)):
        err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
        assert err < 5e-5, err


def test_coo_mttkrp_pallas_parity_tpu():
    """Fused one-hot COO MTTKRP kernel (ops/kernels/coo_pallas.py) ==
    segment_sum oracle, compiled by Mosaic on the real chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pairwise_perturbation_tpu.ops import sparse as spo
    from pairwise_perturbation_tpu.ops.kernels import coo_pallas

    shape, R, nnz = (64, 80, 96, 50), 6, 40_000
    key = jax.random.PRNGKey(9)
    idx = jnp.stack(
        [jax.random.randint(jax.random.fold_in(key, i), (nnz,), 0, s)
         for i, s in enumerate(shape)], axis=1).astype(jnp.int32)
    vals = jax.random.uniform(jax.random.fold_in(key, 99), (nnz,),
                              dtype=jnp.float32, minval=-1.0)
    Ws = [jax.random.uniform(jax.random.fold_in(key, 50 + i), (s, R),
                             dtype=jnp.float32)
          for i, s in enumerate(shape)]
    st = spo.SparseTensor(idx, vals, shape)
    assert coo_pallas.coo_mttkrp_eligible(shape, R, nnz, block=1024)
    for mode in (0, 2, 3):
        want = np.asarray(spo.mttkrp(st, Ws, mode, method="segment"))
        got = np.asarray(coo_pallas.coo_mttkrp(idx, vals, Ws, mode,
                                               block=1024))
        np.testing.assert_allclose(got, want, rtol=2e-4,
                                   atol=1e-3 * np.abs(want).max())


def test_scatter_gather_onehot_parity_tpu():
    """_scatter_rows / _gather_rows one-hot MXU paths == native paths on
    the real chip (HIGHEST precision: gathers exact, scatter within f32
    summation-order noise)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pairwise_perturbation_tpu.ops import sparse as spo

    key = jax.random.PRNGKey(4)
    n, s, R = 30_000, 160, 8
    idx = jax.random.randint(key, (n,), 0, s).astype(jnp.int32)
    W = jax.random.uniform(jax.random.fold_in(key, 1), (s, R),
                           dtype=jnp.float32)
    prod = jax.random.uniform(jax.random.fold_in(key, 2), (n, R),
                              dtype=jnp.float32, minval=-1.0)
    g_native = np.asarray(spo._gather_rows(W, idx, method="native"))
    g_onehot = np.asarray(spo._gather_rows(W, idx, method="onehot"))
    np.testing.assert_array_equal(g_native, g_onehot)  # EXACT rows
    s_seg = np.asarray(spo._scatter_rows(prod, idx, s, method="segment"))
    s_oh = np.asarray(spo._scatter_rows(prod, idx, s, method="onehot"))
    np.testing.assert_allclose(s_oh, s_seg, rtol=2e-4,
                               atol=1e-4 * np.abs(s_seg).max())
