"""Decompose PP cache-build time on the real chip (coil-100 config).

Times, with chained dispatch + single host pull per measurement:
  1. C3 = V x_3 W3    (minor-mode GEMM, natural layout)
  2. C1 = V x_1 W1    (non-minor; XLA inserts a transpose)
  3. C1 from a pre-permuted mode-minor layout
  4. layout preparation itself (moveaxis copies)
  5. full build_pp_caches without layouts
  6. full build_pp_caches with layouts (prep excluded)
  7. tails only: all second-level contractions given C1/C2/C3
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pairwise_perturbation_tpu.ops import contract


def pull(x):
    import numpy as np
    return np.asarray(x.ravel()[:1])


def timeit(name, fn, n=20):
    out = fn()  # compile + warm
    leaves = jax.tree_util.tree_leaves(out)
    pull(leaves[0])
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
    print(f"{name:45s} {dt*1e3:9.3f} ms")
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
    pull(V)  # relay warm-up

    first = jax.jit(lambda V, W, m: contract.partial_mttkrp(V, Ws, [m]),
                    static_argnums=2)
    timeit("C3 = V x_3 W3 (minor GEMM)", lambda: first(V, Ws[3], 3))
    timeit("C1 = V x_1 W1 (non-minor)", lambda: first(V, Ws[1], 1))
    timeit("C2 = V x_2 W2 (non-minor)", lambda: first(V, Ws[2], 2))

    modes = contract.chain_root_modes_pp(shape)
    print("chain roots:", modes)
    prep = jax.jit(lambda V: contract.prepare_layouts(V, modes))
    timeit("prepare_layouts", lambda: prep(V), n=5)
    layouts = prep(V)

    @jax.jit
    def first_l(V, layouts, W, m):
        return contract.first_contraction(V, layouts, W, 1)[0]
    timeit("C1 via layout", lambda: first_l(V, layouts, Ws[1], 1))

    build = jax.jit(lambda V, Ws: contract.build_pp_caches(V, Ws))
    timeit("build_pp_caches (no layouts)", lambda: build(V, list(Ws)), n=10)

    build_l = jax.jit(
        lambda V, Ws, layouts: contract.build_pp_caches(V, Ws,
                                                        layouts=layouts))
    timeit("build_pp_caches (layouts)",
           lambda: build_l(V, list(Ws), layouts), n=10)

    # tails given the three first-level tensors
    @jax.jit
    def firsts(V, Ws):
        return {m: contract.partial_mttkrp(V, Ws, [m]) for m in (1, 2, 3)}
    Cs = firsts(V, list(Ws))

    @jax.jit
    def tails(Cs, Ws):
        order, priority = 4, contract.contraction_priority(shape)
        memo = {}
        for m in (1, 2, 3):
            rem = tuple(x for x in range(4) if x != m)
            memo[(m,)] = (Cs[m], rem, True)

        def get(k):
            if k not in memo:
                T, rem, hr = get(k[:-1])
                T2, rem2 = contract.contract_mode_kr(T, rem, hr, Ws[k[-1]],
                                                     k[-1])
                memo[k] = (T2, rem2, True)
            return memo[k]

        out = []
        for i in range(order):
            for j in range(i + 1, order):
                kk = contract.order_by_priority(
                    (m for m in range(order) if m not in (i, j)), priority)
                out.append(get(kk)[0])
        for i in range(order):
            kk = contract.order_by_priority(
                (m for m in range(order) if m != i), priority)
            out.append(get(kk)[0])
        return out
    timeit("tails only (given C1,C2,C3)", lambda: tails(Cs, list(Ws)))
    timeit("firsts only (C1,C2,C3)", lambda: firsts(V, list(Ws)))


if __name__ == "__main__":
    main()
