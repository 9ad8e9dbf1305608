"""Tile sweep for the fused order-3 MTTKRP kernel at 200^3 and 512^3."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import mttkrp3


def pull(x):
    import numpy as np
    return np.asarray(x.ravel()[:1])


def timeit(name, fn, n=30):
    try:
        out = fn()
        pull(out)
    except Exception as e:
        print(f"{name:40s} FAILED: {repr(e)[:140]}")
        return None
    t0 = time.perf_counter()
    for _ in range(3):
        pull(out)
    po = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    pull(out)
    dt = max((time.perf_counter() - t0 - po) / n, 1e-9)
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return dt


def main():
    print("device:", jax.devices()[0])
    for s in (200, 512):
        kV, kB, kC = jax.random.split(jax.random.PRNGKey(s), 3)
        V = jax.random.uniform(kV, (s, s, s), dtype=jnp.float32)
        B = jax.random.uniform(kB, (s, 10), dtype=jnp.float32)
        C = jax.random.uniform(kC, (s, 10), dtype=jnp.float32)
        pull(V)
        gb = V.size * 4 / 1e9
        xla = jax.jit(lambda V, B, C: jnp.einsum(
            "ijk,jZ,kZ->iZ", V, B, C, optimize=True))
        dt = timeit(f"s={s} XLA chain", lambda: xla(V, B, C))
        if dt:
            print(f"   (V-pass equivalent: {gb/dt:.0f} GB/s)")
        for ti in (32, 64, 128, 256):
            for tj in (8, 16, 32):
                dt = timeit(f"s={s} mttkrp3 ti={ti} tj={tj}",
                            lambda ti=ti, tj=tj: mttkrp3(V, B, C,
                                                         tile_i=ti,
                                                         tile_j=tj))
                if dt:
                    print(f"   -> {gb/dt:.0f} GB/s")


_MODE_SPECS = {1: "ijk,iZ,kZ->jZ", 2: "ijk,iZ,jZ->kZ"}


def _mode_fixtures(s):
    keys = jax.random.split(jax.random.PRNGKey(s), 4)
    V = jax.random.uniform(keys[0], (s, s, s), dtype=jnp.float32)
    Ws = [jax.random.uniform(k, (s, 10), dtype=jnp.float32)
          for k in keys[1:]]
    pull(V)
    return V, Ws, V.size * 4 / 1e9


def _run_mode_variants(s, V, Ws, gb, variants):
    """Check-and-time each (name, builder) variant for modes 1 and 2.

    ``builder(V, mode, others)`` returns a zero-arg callable; every
    variant is parity-checked against the XLA einsum (f32
    accumulation-order differences only) before timing.
    """
    import numpy as np
    for mode in (1, 2):
        others = [Ws[m] for m in range(3) if m != mode]
        ref = np.asarray(jnp.einsum(_MODE_SPECS[mode], V, *others))
        for name, builder in variants:
            fn = builder(V, mode, others)
            out = np.asarray(fn())
            err = np.abs(out - ref).max() / np.abs(ref).max()
            assert err < 1e-3, (mode, name, err)
            dt = timeit(f"s={s} mode={mode} {name}", fn, n=30)
            if dt:
                print(f"   -> {gb/dt:.0f} GB/s")


def _time_sweep_dispatch(s, V, Ws):
    """Whole-sweep proxy: 3 MTTKRPs through the mode dispatcher."""
    from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import \
        mttkrp3_mode

    def sweep3(V, *Ws):
        outs = [mttkrp3_mode(V, list(Ws), m) for m in range(3)]
        return sum(o.sum() for o in outs).reshape(1, 1)
    f = jax.jit(sweep3)
    timeit(f"s={s} 3-mode dispatch (fused)", lambda: f(V, *Ws), n=30)


def main_modes(fast: bool = False):
    """Per-mode comparison for the middle/minor-mode kernels.

    ``fast``: only the fused-native kernels + sweep dispatch (XLA and
    transposed-copy reference timings already recorded; remote compiles
    are ~1 min each, so keep the compile count minimal).
    """
    from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import (
        mttkrp3, mttkrp3_m1, mttkrp3_m2)
    print("device:", jax.devices()[0])

    def xla_builder(V, mode, others):
        f = jax.jit(lambda V, A, B: jnp.einsum(
            _MODE_SPECS[mode], V, A, B, optimize=True))
        return lambda: f(V, *others)

    def transposed_builder(V, mode, others):
        def f(V, A, B):
            perm = (mode,) + tuple(m for m in range(3) if m != mode)
            return mttkrp3(jnp.transpose(V, perm), A, B)
        fj = jax.jit(f)
        return lambda: fj(V, *others)

    def fused_builder(V, mode, others):
        fused = mttkrp3_m1 if mode == 1 else mttkrp3_m2
        return lambda: fused(V, *others)

    variants = [("fused-native", fused_builder)] if fast else [
        ("XLA", xla_builder),
        ("transposed-kernel", transposed_builder),
        ("fused-native", fused_builder),
    ]
    for s in (200, 512):
        V, Ws, gb = _mode_fixtures(s)
        _run_mode_variants(s, V, Ws, gb, variants)
        _time_sweep_dispatch(s, V, Ws)


if __name__ == "__main__":
    import sys
    (main_modes(fast=True) if "--modes-fast" in sys.argv
     else main_modes() if "--modes" in sys.argv else main())
