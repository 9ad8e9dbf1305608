"""Global numeric configuration for the framework.

The reference computes everything in float64 (CTF ``Tensor<>`` = double).
TPUs emulate f64 slowly, so the default compute dtype here is float32 with
``Precision.HIGHEST`` matmuls (6-pass bfloat16 on the MXU, ~f32 accurate).
Tests run on CPU with x64 enabled and pass float64 explicitly to validate
the algebra against the reference semantics.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass
class NumericConfig:
    # Compute dtype for tensors/factors.
    dtype: object = jnp.float32
    # Matmul/einsum precision: HIGHEST keeps R x R Gram solves stable in f32.
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    # Relative eigenvalue cutoff for pseudo-inverse solves. The reference
    # takes raw reciprocals of ScaLAPACK singular values (common.cxx:720-722);
    # a tiny relative cutoff is the f32-safe equivalent. ops/solve.py
    # additionally floors this at the dtype's eigenvalue noise level
    # (R * eps) so f32 never reciprocates eigh noise.
    rcond: float = 1e-12
    # Iterative-refinement passes for f32/bf16 R x R solves (f64 skips).
    # Restores backward stability of ill-conditioned solves — the f32
    # equivalent of the reference's f64 ScaLAPACK solves (ops/solve.py).
    solve_refine: int = 2
    # Use fused Pallas kernels on TPU where available (order-3 MTTKRP).
    use_pallas: bool = True
    # Route first-level (chain-root) contractions through the Pallas
    # mid_contract kernel. Off by default: measured slower than XLA's
    # einsum on v5e for the coil-100 shapes (see NOTES_ROUND1.md).
    use_pallas_first: bool = False
    # Fuse the PP cache build's three chain roots into ONE pass over V
    # (kernels/mttkrp_pallas.triple_roots) on eligible order-4 shapes
    # (axis 0 smallest). MEASURED NEGATIVE on v5e coil-100: the fused
    # kernel costs 11-12 ms vs the XLA 3-pass chain's 7.4 ms — serving
    # three different-axis contractions from one tile forces small
    # strided DMA chunks (<= 1 KB contiguous per lane tile) and
    # R=10-wide GEMMs, which cost more than the two saved V reads.
    # Kept as a tested experimental path; default OFF.
    use_pallas_triple: bool = False


_cfg = NumericConfig()


def get() -> NumericConfig:
    return _cfg


def override(**kwargs):
    """Context manager temporarily overriding config fields.

    NOTE: jitted functions cache on traced Python state only through their
    arguments; functions that read the config at trace time must be
    re-jitted (or take the flag as a static argument) to observe changes.
    """
    from contextlib import contextmanager

    @contextmanager
    def _ctx():
        old = {k: getattr(_cfg, k) for k in kwargs}
        try:
            for k, v in kwargs.items():
                setattr(_cfg, k, v)
            yield _cfg
        finally:
            for k, v in old.items():
                setattr(_cfg, k, v)

    return _ctx()


def set_dtype(dtype) -> None:
    _cfg.dtype = dtype


def set_precision(precision) -> None:
    _cfg.precision = precision


def default_dtype():
    return _cfg.dtype


def default_precision():
    return _cfg.precision


def cpu_test_mode() -> bool:
    return os.environ.get("JAX_PLATFORMS", "") == "cpu"
