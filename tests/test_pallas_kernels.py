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
