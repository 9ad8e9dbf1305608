"""Does consuming the Pallas kernel's rank-major output via a
rank-position-aware einsum (no transpose op) avoid the relayout cost?

Chain under test (coil-100, node(2,3) of the DT sweep):
    C1 = V x_1 W1            (kernel, physical (P, R, M))
    out = C1 x_0 W0          (tail; output rank-last (c, d, Z))
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pairwise_perturbation_tpu.ops.kernels import mttkrp_pallas as mk


def pull(x):
    import numpy as np
    return np.asarray(x.ravel()[:1])


def timeit(name, fn, n=20):
    try:
        out = fn()
        pull(out)
    except Exception as e:
        print(f"{name:44s} FAILED: {repr(e)[:160]}")
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
    print(f"{name:44s} {dt*1e3:9.3f} ms")
    return dt


def main():
    shape = (3, 128, 128, 7200)
    R = 10
    kV, k0, k1 = jax.random.split(jax.random.PRNGKey(0), 3)
    V = jax.random.uniform(kV, shape, dtype=jnp.float32)
    W0 = jax.random.uniform(k0, (shape[0], R), dtype=jnp.float32)
    W1 = jax.random.uniform(k1, (shape[1], R), dtype=jnp.float32)
    print("device:", jax.devices()[0])
    pull(V)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_phys(V, W1):
        """(P, R, M) physical output, no transpose anywhere."""
        P, B, C, D = V.shape
        M = C * D
        V3 = V.reshape(P, B, M)
        L = 2048
        nl = M // L
        out = pl.pallas_call(
            mk._mid_kernel,
            grid=(P, nl),
            in_specs=[
                pl.BlockSpec((R, B), lambda p, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, L), lambda p, l: (p, 0, l),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, L), lambda p, l: (p, 0, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, R, M), V.dtype),
        )(W1.T, V3)
        return out.reshape(P, R, C, D)

    @jax.jit
    def kernel_tail_rankpos(V, W1, W0):
        C1p = kernel_phys(V, W1)                     # (a, Z, c, d)
        return jnp.einsum("aZcd,aZ->cdZ", C1p, W0)

    @jax.jit
    def kernel_tail_rankpos_zfirst(V, W1, W0):
        C1p = kernel_phys(V, W1)
        out = jnp.einsum("aZcd,aZ->Zcd", C1p, W0)    # rank-major result
        return out

    @jax.jit
    def xla_chain(V, W1, W0):
        return jnp.einsum("abcd,bZ,aZ->cdZ", V, W1, W0, optimize=True)

    t1 = timeit("kernel + rank-pos tail (rank-last out)",
                lambda: kernel_tail_rankpos(V, W1, W0))
    t2 = timeit("kernel + rank-pos tail (rank-major out)",
                lambda: kernel_tail_rankpos_zfirst(V, W1, W0))
    t3 = timeit("XLA chain einsum", lambda: xla_chain(V, W1, W0))
    if t1 and t3:
        a = kernel_tail_rankpos(V, W1, W0)
        b = xla_chain(V, W1, W0)
        print("max err:", float(jnp.abs(a - b).max()))

    # variant: kernel emits (R, P, M) — rank MAJOR-most, exactly XLA's
    # preferred dot-operand layout (batch dims leading)
    def kernel_zmajor(V, W1):
        P, B, C, D = V.shape
        M = C * D
        V3 = V.reshape(P, B, M)
        L = 2048
        nl = M // L
        out = pl.pallas_call(
            mk._mid_kernel_zp,
            grid=(P, nl),
            in_specs=[
                pl.BlockSpec((R, B), lambda p, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, L), lambda p, l: (p, 0, l),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 1, L), lambda p, l: (0, p, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, P, M), V.dtype),
        )(W1.T, V3)
        return out.reshape(R, P, C, D)

    @jax.jit
    def kernel_zmajor_tail(V, W1, W0):
        C1z = kernel_zmajor(V, W1)                    # (Z, a, c, d)
        return jnp.einsum("Zacd,aZ->Zcd", C1z, W0)    # batch-major dot

    @jax.jit
    def kernel_zmajor_two_tails(V, W1, W0, W3):
        C1z = kernel_zmajor(V, W1)                    # (Z, a, c, d)
        n23 = jnp.einsum("Zacd,aZ->Zcd", C1z, W0)     # node(2,3), Z-major
        leaf = jnp.einsum("Zcd,dZ->cZ", n23, W3)      # M_2 (c, Z)
        return leaf

    @jax.jit
    def xla_two_tails(V, W1, W0, W3):
        return jnp.einsum("abcd,bZ,aZ,dZ->cZ", V, W1, W0, W3,
                          optimize=True)

    t4 = timeit("kernel(Z-major) + tail", lambda: kernel_zmajor_tail(
        V, W1, W0))
    W3 = jax.random.uniform(jax.random.PRNGKey(9), (shape[3], R),
                            dtype=jnp.float32)
    t5 = timeit("kernel(Z-major) + 2 tails -> leaf",
                lambda: kernel_zmajor_two_tails(V, W1, W0, W3))
    t6 = timeit("XLA chain -> leaf",
                lambda: xla_two_tails(V, W1, W0, W3))
    if t5 and t6:
        a = kernel_zmajor_two_tails(V, W1, W0, W3)
        b = xla_two_tails(V, W1, W0, W3)
        print("leaf max err:", float(jnp.abs(a - b).max()),
              "scale:", float(jnp.abs(b).max()))

    # bf16 variants
    V16 = V.astype(jnp.bfloat16)

    def kernel_phys16(V, W1):
        P, B, C, D = V.shape
        M = C * D
        V3 = V.reshape(P, B, M)
        L = 2048
        nl = M // L
        out = pl.pallas_call(
            mk._mid_kernel,
            grid=(P, nl),
            in_specs=[
                pl.BlockSpec((R, B), lambda p, l: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B, L), lambda p, l: (p, 0, l),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, R, L), lambda p, l: (p, 0, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, R, M), jnp.float32),
        )(W1.T.astype(jnp.bfloat16), V3)
        return out.reshape(P, R, C, D)

    @jax.jit
    def kernel_tail_rankpos16(V, W1, W0):
        C1p = kernel_phys16(V, W1)
        return jnp.einsum("aZcd,aZ->cdZ", C1p, W0)

    @jax.jit
    def xla_chain16(V, W1, W0):
        from pairwise_perturbation_tpu.ops import contract
        T = contract.partial_mttkrp(V, [None, W1, None, None], [1])
        out, _ = contract.contract_mode_kr(T, (0, 2, 3), True, W0, 0)
        return out

    timeit("bf16 kernel + rank-pos tail",
           lambda: kernel_tail_rankpos16(V16, W1, W0))
    timeit("bf16 XLA chain", lambda: xla_chain16(V16, W1, W0))


if __name__ == "__main__":
    main()
