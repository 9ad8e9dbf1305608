"""Sparse (COO) tensor kernels for CP-ALS.

TPU-native replacement for the reference's ``-issparse`` path, which
threads a sparsity flag into every CTF tensor constructor
(test_ALS.cxx:126-131, 229; run.cxx:137-140) and lets CTF's sparse
contraction engine do the rest. Here the sparse path is explicit:

- storage is static-shape COO (``indices[nnz, N]`` int32, ``values[nnz]``),
  the natural TPU layout — nnz is a static dimension, so every kernel
  compiles once per tensor;
- the MTTKRP is a gather of factor rows + a Khatri-Rao product on the
  nonzeros + one ``segment_sum`` scatter-add (XLA lowers this to a sorted
  segmented reduction on TPU — no dynamic shapes anywhere);
- PP pair caches contract the same nonzeros with a fused output index
  (i * s_j + j), yielding the standard dense rank-major caches
  (R, s_i, s_j) — PP sweeps downstream are IDENTICAL to the dense engine
  (als_CP.cxx:753-825), because the caches and factors are dense either
  way. Only cache *builds* touch the sparse tensor.

The natural fit is the Poisson/laplacian tensor family (``-tensor p``),
which is extremely sparse (sum of I x..x D x..x I stencils,
common.cxx:575-642).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class SparseTensor:
    """Static-shape COO tensor: ``indices[nnz, order]``, ``values[nnz]``."""
    indices: jnp.ndarray
    values: jnp.ndarray
    shape: Tuple[int, ...]

    @property
    def ndim(self):
        return len(self.shape)

    @property
    def nnz(self):
        return self.values.shape[0]

    @property
    def dtype(self):
        return self.values.dtype

    def tree_flatten(self):
        return (self.indices, self.values), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(children[0], children[1], tuple(shape))


def from_dense(V, tol: float = 0.0) -> SparseTensor:
    """COO from a dense host/device array (entries with |v| > tol)."""
    Vh = np.asarray(V)
    idx = np.argwhere(np.abs(Vh) > tol).astype(np.int32)
    vals = Vh[tuple(idx.T)]
    return SparseTensor(jnp.asarray(idx), jnp.asarray(vals), Vh.shape)


def to_dense(st: SparseTensor):
    out = jnp.zeros(st.shape, st.dtype)
    return out.at[tuple(st.indices.T)].add(st.values)


def norm_sq(st: SparseTensor):
    acc = jnp.float32 if st.dtype == jnp.bfloat16 else st.dtype
    return jnp.dot(st.values, st.values, preferred_element_type=acc)


def _gathered_kr(st: SparseTensor, Ws: Sequence, skip: Tuple[int, ...]):
    """values * prod_{j not in skip} W_j[idx_j, :]  -> (nnz, R)."""
    R = Ws[0].shape[1]
    prod = st.values[:, None] * jnp.ones((1, R), Ws[0].dtype)
    for j in range(st.ndim):
        if j in skip:
            continue
        prod = prod * Ws[j][st.indices[:, j], :]
    return prod


def mttkrp(st: SparseTensor, Ws: Sequence, mode: int):
    """Exact sparse MTTKRP: M[i, r] = sum_nnz v * prod_{j != mode} W_j.

    Reference semantics: KhatriRao_contract on a sparse CTF tensor
    (common.cxx:931-997 with V sparse).
    """
    prod = _gathered_kr(st, Ws, (mode,))
    return jax.ops.segment_sum(prod, st.indices[:, mode],
                               num_segments=st.shape[mode])


def pair_cache(st: SparseTensor, Ws: Sequence, i: int, j: int):
    """PP pair cache T_{ij} (rank-major, (R, s_i, s_j)) from the nonzeros:
    one fused-index segment_sum per pair (Build_mttkrp_map semantics,
    als_CP.cxx:352-409, with V sparse)."""
    prod = _gathered_kr(st, Ws, (i, j))
    fused = st.indices[:, i].astype(jnp.int32) * st.shape[j] \
        + st.indices[:, j].astype(jnp.int32)
    flat = jax.ops.segment_sum(prod, fused,
                               num_segments=st.shape[i] * st.shape[j])
    return jnp.transpose(flat.reshape(st.shape[i], st.shape[j], -1),
                         (2, 0, 1))


def build_pp_caches(st: SparseTensor, Ws: Sequence):
    """All PP caches from the sparse tensor: singles M_i (s_i, R) and
    rank-major pairs T_{ij} (R, s_i, s_j) — the same cache layout as
    contract.build_pp_caches, so PP sweeps are shared with the dense
    engine."""
    order = st.ndim
    single = {i: mttkrp(st, Ws, i) for i in range(order)}
    pair = {(i, j): pair_cache(st, Ws, i, j)
            for i in range(order) for j in range(i + 1, order)}
    return single, pair


def cp_gradnorm(st: SparseTensor, Ws: Sequence, regul=None):
    """Exact CP gradient norm against the sparse tensor."""
    from pairwise_perturbation_tpu.ops import contract
    total = 0.0
    for i in range(st.ndim):
        M = mttkrp(st, Ws, i)
        S = contract.hadamard_gram(Ws, skip_mode=i, regul=regul)
        g = contract.gradsubprob(M, S, Ws[i])
        total = total + jnp.vdot(g, g)
    return jnp.sqrt(total)


def cp_residual_norm(V_norm_sq, st: SparseTensor, Ws: Sequence):
    """||V - [[W]]|| via the norm identity with a fresh sparse MTTKRP."""
    from pairwise_perturbation_tpu.ops import contract
    M_last = mttkrp(st, Ws, st.ndim - 1)
    return contract.cp_residual_norm(V_norm_sq, M_last, list(Ws))
