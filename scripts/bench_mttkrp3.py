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


if __name__ == "__main__":
    main()
