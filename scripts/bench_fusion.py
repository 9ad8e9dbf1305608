"""Fusion + mixed-precision benchmarks on the coil-100 shape:
- does the rank-major kernel output fuse into consumers inside one jit?
- bf16-stored V: XLA einsums and the mid kernel.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pairwise_perturbation_tpu.ops import contract, solve
from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import mid_contract
from pairwise_perturbation_tpu.models import cp
import pairwise_perturbation_tpu.config as ppcfg


def pull(x):
    import numpy as np
    return np.asarray(x.ravel()[:1])


def timeit(name, fn, n=20):
    try:
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        pull(leaves[0])
    except Exception as e:
        print(f"{name:46s} FAILED: {repr(e)[:200]}")
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


def main():
    shape = (3, 128, 128, 7200)
    R = 10
    kV, *kws = jax.random.split(jax.random.PRNGKey(0), 5)
    V = jax.random.uniform(kV, shape, dtype=jnp.float32)
    Ws = [jax.random.uniform(k, (s, R), dtype=jnp.float32)
          for k, s in zip(kws, shape)]
    V16 = V.astype(jnp.bfloat16)
    lam = jnp.asarray(0.0, dtype=jnp.float32)
    print("device:", jax.devices()[0])
    pull(V)

    # 1. standalone kernel call (pays the output transpose)
    timeit("mid_contract m1 standalone", lambda: mid_contract(V, Ws[1], 1))

    # 2. kernel + consuming tail in ONE jit (transpose should fold)
    @jax.jit
    def kernel_tail(V, W1, W0):
        C1 = mid_contract(V, W1, 1)          # (3, 128, 7200, R) logical
        out, _ = contract.contract_mode_kr(C1, (0, 2, 3), True, W0, 0)
        return out

    @jax.jit
    def xla_tail(V, W1, W0):
        C1 = jnp.einsum("abcd,bZ->acdZ", V, W1)
        out, _ = contract.contract_mode_kr(C1, (0, 2, 3), True, W0, 0)
        return out

    timeit("kernel+tail one jit", lambda: kernel_tail(V, Ws[1], Ws[0]))
    timeit("XLA+tail one jit", lambda: xla_tail(V, Ws[1], Ws[0]))

    # 3. full builds / sweeps with mode-1-only routing
    build_x = jax.jit(lambda V, Ws: contract.build_pp_caches(
        V, Ws, use_pallas=False))
    build_p = jax.jit(lambda V, Ws: contract.build_pp_caches(
        V, Ws, use_pallas=True))
    timeit("build_pp_caches XLA f32", lambda: build_x(V, list(Ws)), n=10)
    timeit("build_pp_caches pallas-m1 f32",
           lambda: build_p(V, list(Ws)), n=10)

    base = cp.dt_sweep.__wrapped__
    with ppcfg.override(use_pallas_first=False):
        f = jax.jit(lambda V, Ws, lam: base(V, Ws, lam, None, solver="svd"))
        timeit("dt_sweep XLA f32", lambda: f(V, list(Ws), lam))
    with ppcfg.override(use_pallas_first=True):
        g = jax.jit(lambda V, Ws, lam: base(V, Ws, lam, None, solver="svd"))
        timeit("dt_sweep pallas-m1 f32", lambda: g(V, list(Ws), lam))

    # 4. bf16-stored V
    xla1 = jax.jit(lambda V, W: contract.partial_mttkrp(V, [None, W, None,
                                                            None], [1]))
    timeit("XLA V16 x_1 W1 (mixed einsum)", lambda: xla1(V16, Ws[1]))
    timeit("mid_contract m1 V16 standalone",
           lambda: mid_contract(V16, Ws[1], 1))
    timeit("build_pp_caches XLA bf16", lambda: build_x(V16, list(Ws)), n=10)
    timeit("build_pp_caches pallas bf16",
           lambda: build_p(V16, list(Ws)), n=10)
    with ppcfg.override(use_pallas_first=False):
        f16 = jax.jit(lambda V, Ws, lam: base(V, Ws, lam, None,
                                              solver="svd"))
        timeit("dt_sweep XLA bf16-V", lambda: f16(V16, list(Ws), lam))
    with ppcfg.override(use_pallas_first=True):
        g16 = jax.jit(lambda V, Ws, lam: base(V, Ws, lam, None,
                                              solver="svd"))
        timeit("dt_sweep pallas bf16-V", lambda: g16(V16, list(Ws), lam))

    # accuracy spot check
    M32 = contract.mttkrp(V, Ws, 3, use_pallas=False)
    M16 = contract.mttkrp(V16, Ws, 3, use_pallas=False)
    import numpy as np
    rel = float(jnp.abs(M16 - M32).max() / jnp.abs(M32).max())
    print(f"bf16 MTTKRP max rel err: {rel:.2e}")


if __name__ == "__main__":
    main()
