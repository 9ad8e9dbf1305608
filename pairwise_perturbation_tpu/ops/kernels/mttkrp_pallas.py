"""Fused order-3 MTTKRP Pallas kernel.

M[i, r] = sum_{j,k} V[i,j,k] B[j,r] C[k,r]

The XLA chain (V x C -> (I,J,R) intermediate -> x B) writes and re-reads an
intermediate R/K times the size of V's per-(i,j) fiber; this kernel keeps
the accumulator in VMEM and reads V exactly once from HBM:

    for each grid step (i_tile, j):
        G = V[i_tile, j, :] @ C            # MXU: (TI, K) @ (K, R)
        acc[i_tile] += G * B[j, :]          # VPU broadcast multiply

Order-3 is the reference's minimum-slice benchmark configuration
(BASELINE.json config 1: dim 200^3 rank 10) and the folded Poisson 'p'
fixture; higher-order MTTKRPs bottom out in these order-3 chains after
dimension-tree contraction of the other modes.

Grid iteration: j is the innermost grid dimension, so the output block
(indexed only by i_tile) stays resident in VMEM across the j-reduction —
the standard Pallas accumulation pattern.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; interpret mode works without them
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel(v_ref, b_ref, c_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = v_ref[:]                             # (TI, JB, K)
    ti, jb, k = v.shape
    g = jnp.dot(v.reshape(ti * jb, k), c_ref[:],
                preferred_element_type=jnp.float32)       # (TI*JB, R)
    g = g.reshape(ti, jb, -1) * b_ref[:][None, :, :]       # KR weight
    out_ref[:] += jnp.sum(g, axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_i", "tile_j", "interpret"))
def mttkrp3(V, B, C, tile_i: int = 256, tile_j: int = 8,
            interpret: bool = False):
    """Fused MTTKRP for the first mode of an order-3 tensor.

    V: (I, J, K); B: (J, R); C: (K, R) -> M: (I, R).
    For other modes, transpose V first (cheap relative to the contraction).
    ``tile_j`` must satisfy TPU sublane tiling (multiple of 8 for f32).
    """
    I, J, K = V.shape
    R = B.shape[1]
    tile_i = min(tile_i, I)
    tile_j = min(tile_j, J)
    # zero-pad J to a tile multiple: input-block padding contents are
    # unspecified in Pallas, and zero rows contribute nothing to the sum.
    if J % tile_j != 0:
        Jp = ((J + tile_j - 1) // tile_j) * tile_j
        V = jnp.pad(V, ((0, 0), (0, Jp - J), (0, 0)))
        B = jnp.pad(B, ((0, Jp - J), (0, 0)))
        J = Jp
    grid = (pl.cdiv(I, tile_i), J // tile_j)

    def vmem(spec_args, index_map):
        if _VMEM is not None and not interpret:
            return pl.BlockSpec(spec_args, index_map, memory_space=_VMEM)
        return pl.BlockSpec(spec_args, index_map)

    in_specs = [
        vmem((tile_i, tile_j, K), lambda i, j: (i, j, 0)),
        vmem((tile_j, R), lambda i, j: (j, 0)),
        vmem((K, R), lambda i, j: (0, 0)),
    ]
    out_specs = vmem((tile_i, R), lambda i, j: (i, 0))

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=jax.ShapeDtypeStruct((I, R), V.dtype),
        interpret=interpret,
    )(V, B, C)


def mttkrp3_mode(V, factors, mode: int, tile_i: int = 256,
                 interpret: bool = False):
    """Fused order-3 MTTKRP for any mode (transposes V so ``mode`` leads)."""
    perm = (mode,) + tuple(m for m in range(3) if m != mode)
    Vt = jnp.transpose(V, perm)
    others = [factors[m] for m in range(3) if m != mode]
    return mttkrp3(Vt, others[0], others[1], tile_i=tile_i,
                   interpret=interpret)
