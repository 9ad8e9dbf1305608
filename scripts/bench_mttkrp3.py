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


def main_modes_fast():
    """Only the new fused mode kernels + full-sweep dispatch (XLA and
    transposed-copy reference timings already recorded in
    results/BENCH_full_manual.json; remote compiles are ~1 min each, so
    keep the compile count minimal)."""
    from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import (
        mttkrp3_m1, mttkrp3_m2, mttkrp3_mode)
    import numpy as np
    print("device:", jax.devices()[0])
    for s in (200, 512):
        keys = jax.random.split(jax.random.PRNGKey(s), 4)
        V = jax.random.uniform(keys[0], (s, s, s), dtype=jnp.float32)
        Ws = [jax.random.uniform(k, (s, 10), dtype=jnp.float32)
              for k in keys[1:]]
        pull(V)
        gb = V.size * 4 / 1e9
        for mode, fused in ((1, mttkrp3_m1), (2, mttkrp3_m2)):
            others = [Ws[m] for m in range(3) if m != mode]
            want = np.asarray(jnp.einsum(
                ["ijk,iZ,kZ->jZ", "ijk,iZ,jZ->kZ"][mode - 1], V, *others))
            got = np.asarray(fused(V, *others))
            err = np.abs(got - want).max() / np.abs(want).max()
            assert err < 1e-3, (mode, err)
            dt = timeit(f"s={s} mode={mode} fused-native",
                        lambda: fused(V, *others), n=30)
            if dt:
                print(f"   -> {gb/dt:.0f} GB/s")

        def sweep3(V, *Ws):
            outs = [mttkrp3_mode(V, list(Ws), m) for m in range(3)]
            return sum(o.sum() for o in outs).reshape(1, 1)
        f = jax.jit(sweep3)
        timeit(f"s={s} 3-mode dispatch (fused)", lambda: f(V, *Ws), n=30)


def main_modes():
    """Per-mode comparison: XLA chain vs transposed-copy kernel vs the
    mode-specialized kernels (native-layout single pass)."""
    from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas import (
        mttkrp3_m1, mttkrp3_m2, mttkrp3_mode)
    import numpy as np
    print("device:", jax.devices()[0])
    for s in (200, 512):
        keys = jax.random.split(jax.random.PRNGKey(s), 4)
        V = jax.random.uniform(keys[0], (s, s, s), dtype=jnp.float32)
        Ws = [jax.random.uniform(k, (s, 10), dtype=jnp.float32)
              for k in keys[1:]]
        pull(V)
        gb = V.size * 4 / 1e9

        def xla(mode):
            specs = ["ijk,iZ,kZ->jZ", "ijk,iZ,jZ->kZ"]
            return jax.jit(lambda V, A, B: jnp.einsum(
                specs[mode - 1], V, A, B, optimize=True))

        def transposed(mode):
            def f(V, *Ws):
                perm = (mode,) + tuple(m for m in range(3) if m != mode)
                Vt = jnp.transpose(V, perm)
                others = [Ws[m] for m in range(3) if m != mode]
                from pairwise_perturbation_tpu.ops.kernels.mttkrp_pallas \
                    import mttkrp3
                return mttkrp3(Vt, others[0], others[1])
            return jax.jit(f)

        for mode, fused in ((1, mttkrp3_m1), (2, mttkrp3_m2)):
            others = [Ws[m] for m in range(3) if m != mode]
            fx, ft = xla(mode), transposed(mode)
            ref = None
            for name, fn in (
                    ("XLA", lambda: fx(V, *others)),
                    ("transposed-kernel", lambda: ft(V, *Ws)),
                    ("fused-native", lambda: fused(V, *others))):
                dt = timeit(f"s={s} mode={mode} {name}", fn, n=30)
                if dt:
                    print(f"   -> {gb/dt:.0f} GB/s")
                out = np.asarray(fn())
                if ref is None:
                    ref = out
                else:  # f32 accumulation-order differences only
                    err = np.abs(out - ref).max() / np.abs(ref).max()
                    assert err < 1e-3, (mode, name, err)
        # whole-sweep proxy: 3 MTTKRPs through the dispatcher
        def sweep3(V, *Ws):
            outs = [mttkrp3_mode(V, list(Ws), m) for m in range(3)]
            return sum(o.sum() for o in outs)
        f = jax.jit(sweep3)
        timeit(f"s={s} 3-mode dispatch (fused)",
               lambda: f(V, *Ws).reshape(1, 1), n=30)


if __name__ == "__main__":
    import sys
    (main_modes_fast() if "--modes-fast" in sys.argv
     else main_modes() if "--modes" in sys.argv else main())
