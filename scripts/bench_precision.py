"""Precision experiment for the PP cache build (VERDICT r1 item 2 tail).

Hypothesis: the chain-root first contractions are MXU-bound at
Precision.HIGHEST (6-pass bf16 emulation of f32: ~2.8 ms per coil-sized
V pass on v5e) rather than HBM-bound (~1.7 ms).  Precision.HIGH (3-pass)
halves the MXU cost and should drop each pass under the HBM roofline.

Measures per-root `_first_contraction_rm` and the full `build_pp_caches`
at HIGHEST / HIGH, and reports the max relative error of HIGH vs a f64
CPU oracle alongside HIGHEST's own error.
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

from pairwise_perturbation_tpu.ops import contract

P = jax.lax.Precision


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
    print(f"{name:52s} {best*1e3:9.3f} ms", flush=True)
    return best


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    shapes = {"coil": (3, 128, 128, 7200),
              "timelapse": (33, 9, 1344, 1024)}
    name = sys.argv[1] if len(sys.argv) > 1 else "coil"
    if name not in shapes:
        raise SystemExit(f"unknown shape name {name!r}; "
                         f"expected one of {sorted(shapes)}")
    shape = shapes[name]
    R = 10
    rng = np.random.default_rng(0)
    V = jnp.asarray(rng.standard_normal(shape, dtype=np.float64),
                    dtype=jnp.float32)
    Ws = [jnp.asarray(rng.standard_normal((s, R)), dtype=jnp.float32)
          for s in shape]
    nbytes = V.size * 4
    print(f"{name} {shape} rank {R}; V = {nbytes/2**30:.3f} GiB; "
          f"1-pass floor @819GB/s = {nbytes/819e9*1e3:.2f} ms", flush=True)

    roots = contract.chain_root_modes_pp(shape)
    print("chain roots:", roots, flush=True)

    for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
        for m in roots:
            f = jax.jit(lambda V, W, m=m, p=prec:
                        contract._first_contraction_rm(V, None, W, m,
                                                       precision=p)[0])
            timeit(f"first_rm mode{m} {prec}",
                   lambda f=f, m=m: f(V, Ws[m]), n=30)
        fb = jax.jit(lambda V, Ws, p=prec:
                     contract.build_pp_caches(V, Ws, precision=p))
        timeit(f"build_pp_caches {prec}", lambda: fb(V, list(Ws)), n=10)

    # accuracy vs f64 CPU oracle for one mid-mode root
    mid_roots = [r for r in roots if r != len(shape) - 1]
    m = mid_roots[0] if mid_roots else roots[0]
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        V64 = jnp.asarray(np.asarray(V), dtype=jnp.float64)
        W64 = jnp.asarray(np.asarray(Ws[m]), dtype=jnp.float64)
        ref = np.asarray(contract._first_contraction_rm(
            V64, None, W64, m, precision=P.HIGHEST)[0])
    scale = np.abs(ref).max()
    for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
        out = np.asarray(jax.jit(
            lambda V, W, p=prec: contract._first_contraction_rm(
                V, None, W, m, precision=p)[0])(V, Ws[m]), dtype=np.float64)
        err = np.abs(out - ref).max() / scale
        print(f"mode{m} first_rm {prec}: max rel err vs f64 = {err:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
