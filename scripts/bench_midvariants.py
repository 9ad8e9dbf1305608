"""Diagnose mid_contract performance: DMA-only kernel, tile sweeps,
dimension_semantics, cost estimates."""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pull(x):
    import numpy as np
    return np.asarray(x.ravel()[:1])


def timeit(name, fn, n=20):
    try:
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        pull(leaves[0])
    except Exception as e:
        print(f"{name:46s} FAILED: {repr(e)[:160]}")
        return None
    t0 = time.perf_counter()
    for _ in range(3):
        pull(leaves[0])
    po = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    pull(leaves[0])
    dt = max((time.perf_counter() - t0 - po) / n, 1e-9)
    print(f"{name:46s} {dt*1e3:9.3f} ms")
    return dt


# --- copy kernel: measures pure HBM->VMEM->HBM block throughput ----------

def _copy_kernel(v_ref, o_ref):
    o_ref[0] = jnp.sum(v_ref[0], axis=0, keepdims=True)  # (1, L) reduce


@functools.partial(jax.jit, static_argnames=("L", "sem"))
def reduce_pass(V3, L, sem=None):
    P, B, M = V3.shape
    nl = pl.cdiv(M, L)
    params = {}
    if sem:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=sem)
    return pl.pallas_call(
        _copy_kernel,
        grid=(P, nl),
        in_specs=[pl.BlockSpec((1, B, L), lambda p, l: (p, 0, l),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, L), lambda p, l: (p, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 1, nl * L), V3.dtype),
        **params,
    )(V3)


# --- matmul kernel variants ----------------------------------------------

def _mm_kernel(wt_ref, v_ref, o_ref):
    g = jax.lax.dot_general(wt_ref[:], v_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = g.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("L", "sem", "cost"))
def mid_v(V3, WT, L, sem=None, cost=False):
    P, B, M = V3.shape
    R = WT.shape[0]
    nl = pl.cdiv(M, L)
    params = {}
    if sem:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=sem)
    if cost:
        params["cost_estimate"] = pl.CostEstimate(
            flops=2 * P * B * M * R,
            bytes_accessed=V3.size * 4 + P * R * M * 4,
            transcendentals=0)
    return pl.pallas_call(
        _mm_kernel,
        grid=(P, nl),
        in_specs=[
            pl.BlockSpec((R, B), lambda p, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, L), lambda p, l: (p, 0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, L), lambda p, l: (p, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, R, nl * L), V3.dtype),
        **params,
    )(WT, V3)


def main():
    shape = (3, 128, 128, 7200)
    R = 10
    kV, kW = jax.random.split(jax.random.PRNGKey(0))
    V = jax.random.uniform(kV, shape, dtype=jnp.float32)
    W = jax.random.uniform(kW, (128, R), dtype=jnp.float32)
    WT = W.T.copy()
    print("device:", jax.devices()[0])
    pull(V)

    V3m1 = V.reshape(3, 128, 128 * 7200)
    V3m2 = V.reshape(3 * 128, 128, 7200)

    gb = V.size * 4 / 1e9
    for L in (2048, 4096, 8192):
        dt = timeit(f"reduce-pass m1 L={L}", lambda L=L: reduce_pass(V3m1, L))
        if dt:
            print(f"   -> {gb/dt:.0f} GB/s")
    dt = timeit("reduce-pass m1 L=4096 parallel-sem",
                lambda: reduce_pass(V3m1, 4096,
                                    sem=("parallel", "arbitrary")))
    if dt:
        print(f"   -> {gb/dt:.0f} GB/s")

    for L in (2048, 4096, 8192):
        timeit(f"matmul m1 L={L}", lambda L=L: mid_v(V3m1, WT, L))
    timeit("matmul m1 L=4096 parallel",
           lambda: mid_v(V3m1, WT, 4096, sem=("parallel", "arbitrary")))
    timeit("matmul m1 L=4096 cost",
           lambda: mid_v(V3m1, WT, 4096, cost=True))
    timeit("matmul m1 L=4096 par+cost",
           lambda: mid_v(V3m1, WT, 4096, sem=("parallel", "arbitrary"),
                         cost=True))
    timeit("matmul m2 L=4096", lambda: mid_v(V3m2, WT, 4096))
    timeit("matmul m2 L=4096 par+cost",
           lambda: mid_v(V3m2, WT, 4096, sem=("parallel", "arbitrary"),
                         cost=True))


if __name__ == "__main__":
    main()
