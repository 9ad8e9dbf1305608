"""Benchmark mid_contract (Pallas first-level contraction) vs XLA on the
coil-100 shape, plus the PP cache build and DT sweep with/without it."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import mid_contract


def pull(x):
    import numpy as np
    return np.asarray(x.ravel()[:1])


def timeit(name, fn, n=20):
    try:
        out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        pull(leaves[0])
    except Exception as e:
        print(f"{name:42s} FAILED: {repr(e)[:200]}")
        return None
    t0 = time.perf_counter()
    for _ in range(3):
        pull(leaves[0])
    pull_overhead = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    leaves = jax.tree_util.tree_leaves(out)
    pull(leaves[0])
    dt = max((time.perf_counter() - t0 - pull_overhead) / n, 1e-9)
    print(f"{name:42s} {dt*1e3:9.3f} ms")
    return dt


def main():
    shape = (3, 128, 128, 7200)
    R = 10
    key = jax.random.PRNGKey(0)
    kV, *kws = jax.random.split(key, 5)
    V = jax.random.uniform(kV, shape, dtype=jnp.float32)
    Ws = [jax.random.uniform(k, (s, R), dtype=jnp.float32)
          for k, s in zip(kws, shape)]
    print("device:", jax.devices()[0])
    pull(V)

    from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import \
        last_contract

    xla1 = jax.jit(lambda V, W: jnp.einsum('abcd,bZ->acdZ', V, W))
    xla2 = jax.jit(lambda V, W: jnp.einsum('abcd,cZ->abdZ', V, W))
    xla3 = jax.jit(lambda V, W: jnp.einsum('abcd,dZ->abcZ', V, W))
    timeit("XLA  V x_1 W1", lambda: xla1(V, Ws[1]))
    timeit("XLA  V x_2 W2", lambda: xla2(V, Ws[2]))
    timeit("XLA  V x_3 W3", lambda: xla3(V, Ws[3]))
    t1 = timeit("mid_contract mode 1", lambda: mid_contract(V, Ws[1], 1))
    t2 = timeit("mid_contract mode 2", lambda: mid_contract(V, Ws[2], 2))
    t3 = timeit("last_contract mode 3", lambda: last_contract(V, Ws[3]))
    if t1:
        out = mid_contract(V, Ws[1], 1)
        ref = xla1(V, Ws[1])
        print("   mode1 max err:", float(jnp.abs(out - ref).max()))
    if t3:
        out = last_contract(V, Ws[3])
        ref = xla3(V, Ws[3])
        print("   mode3 max err:", float(jnp.abs(out - ref).max()))

    from pairwise_perturbation_tpu.ops import contract
    from pairwise_perturbation_tpu.models import cp

    build = jax.jit(lambda V, Ws: contract.build_pp_caches(
        V, Ws, use_pallas=False))
    build_p = jax.jit(lambda V, Ws: contract.build_pp_caches(
        V, Ws, use_pallas=True))
    timeit("build_pp_caches XLA", lambda: build(V, list(Ws)), n=10)
    timeit("build_pp_caches pallas", lambda: build_p(V, list(Ws)), n=10)

    import pairwise_perturbation_tpu.config as ppcfg
    lam = jnp.asarray(0.0, dtype=jnp.float32)
    base = cp.dt_sweep.__wrapped__
    with ppcfg.override(use_pallas_first=False):
        f = jax.jit(lambda V, Ws, lam: base(V, Ws, lam, None, solver="svd"))
        timeit("dt_sweep (XLA)", lambda: f(V, list(Ws), lam))
    with ppcfg.override(use_pallas_first=True):
        g = jax.jit(lambda V, Ws, lam: base(V, Ws, lam, None, solver="svd"))
        timeit("dt_sweep (pallas roots)", lambda: g(V, list(Ws), lam))

    # order-3 sweep path (BASELINE config 1)
    V3 = jax.random.uniform(jax.random.PRNGKey(3), (200, 200, 200),
                            dtype=jnp.float32)
    Ws3 = [jax.random.uniform(jax.random.PRNGKey(40 + i), (200, R),
                              dtype=jnp.float32) for i in range(3)]
    from pairwise_perturbation_tpu.ops import solve as ppsolve
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("up",))
    def o3_sweep(V, Ws, *, up):
        Ws = list(Ws)
        for i in range(3):
            M = contract.mttkrp(V, Ws, i, use_pallas=up)
            S = contract.hadamard_gram(Ws, skip_mode=i)
            Ws[i] = ppsolve.svd_solve(M, S)
        return contract.normalize_factors(Ws)

    timeit("order3 sweep XLA", lambda: o3_sweep(V3, list(Ws3), up=False),
           n=50)
    timeit("order3 sweep pallas", lambda: o3_sweep(V3, list(Ws3), up=True),
           n=50)


if __name__ == "__main__":
    main()
