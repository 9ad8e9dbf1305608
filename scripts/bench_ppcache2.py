"""Round-2 PP cache-build bandwidth experiments (VERDICT item 2).

Measures, on the real chip:
1. current jitted build_pp_caches (f32 + bf16) on coil / time-lapse shapes
2. per-root first contraction: XLA einsum vs Pallas mid_contract
   (rank-minor and rank-major)
3. a rank-major cache-build prototype: mid_contract rank-major output
   consumed directly by batched-Z chain tails, converting only the final
   (R, s) matrices
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.ops import contract
from pairwise_perturbation_tpu.ops.kernels import mttkrp_pallas as mp


def pull(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(name, fn, n=20):
    out = fn()
    pull(out)
    t0 = time.perf_counter()
    for _ in range(3):
        pull(out)
    po = (time.perf_counter() - t0) / 3
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        pull(out)
        dt = max((time.perf_counter() - t0 - po) / n, 1e-9)
        best = dt if best is None else min(best, dt)
    print(f"{name:48s} {best*1e3:9.3f} ms", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    shapes = {
        "coil": (3, 128, 128, 7200),
        "timelapse": (33, 9, 1344, 1024),
    }
    which = sys.argv[1] if len(sys.argv) > 1 else "coil"
    only_build = "--build-only" in sys.argv
    shape = shapes[which]
    R = 10
    key = jax.random.PRNGKey(0)
    kV, *kws = jax.random.split(key, 5)
    V = jax.random.uniform(kV, shape, dtype=jnp.float32)
    Ws = [jax.random.uniform(k, (s, R), dtype=jnp.float32)
          for k, s in zip(kws, shape)]
    pull(V)
    gb = V.size * 4 / 1e9
    print(f"{which} {shape}  V = {gb:.2f} GB  (1-pass SOL ~ {gb/800*1e3:.2f}"
          " ms at 800 GB/s)", flush=True)

    # 1. current build + steady-state PP sweep
    lam = jnp.asarray(0.0, dtype=jnp.float32)
    for vd, tag in ((V, "f32"), (V.astype(jnp.bfloat16), "bf16")):
        b = jax.jit(lambda V, Ws: contract.build_pp_caches(V, list(Ws)))
        timeit(f"build_pp_caches {tag} (current)", lambda: b(vd, Ws))
        single, pair = b(vd, Ws)
        W_init = [w for w in Ws]
        dWs = [jnp.zeros_like(w) for w in Ws]
        st = {"Ws": list(Ws), "dWs": dWs}

        def ppsweep():
            Ws2, dWs2, _ = cp.pp_sweep(single, pair, st["Ws"], W_init,
                                       st["dWs"], lam, 1.0, solver="svd")
            st["Ws"], st["dWs"] = Ws2, dWs2
            return Ws2[0]
        timeit(f"pp_sweep {tag}", ppsweep, n=50)

    # 1b. build with precomputed mode-minor layouts (memory-for-bandwidth:
    # every chain root becomes a minor-dim GEMM)
    roots_pp = contract.chain_root_modes_pp(shape)
    for vd, tag in ((V, "f32"), (V.astype(jnp.bfloat16), "bf16")):
        layouts = jax.jit(lambda V: contract.prepare_layouts(
            V, roots_pp))(vd)
        pull(layouts)
        bl = jax.jit(lambda V, Ws, L: contract.build_pp_caches(
            V, list(Ws), layouts=L))
        timeit(f"build_pp_caches {tag} (layouts)",
               lambda: bl(vd, Ws, layouts))

    if only_build:
        return
    # 2. per-root first contraction
    pr = contract.contraction_priority(shape)
    roots = sorted(set(contract.chain_root_modes_pp(shape)))
    print("chain roots:", roots, "priority:", pr, flush=True)
    for m in roots:
        f_xla = jax.jit(lambda V, W, m=m: contract.contract_mode_kr(
            V, tuple(range(4)), False, W, m)[0])
        timeit(f"root {m} XLA einsum", lambda: f_xla(V, Ws[m]))
        elig = mp.mid_contract_eligible(shape, m, jnp.float32, R)
        print(f"   mid_contract eligible: {elig}", flush=True)
        if elig:
            f_rm = jax.jit(lambda V, W, m=m: mp.mid_contract(
                V, W, m, rank_minor=False))
            f_rl = jax.jit(lambda V, W, m=m: mp.mid_contract(
                V, W, m, rank_minor=True))
            timeit(f"root {m} mid_contract rank-major", lambda: f_rm(V, Ws[m]))
            timeit(f"root {m} mid_contract rank-last ", lambda: f_rl(V, Ws[m]))


if __name__ == "__main__":
    main()
