"""Benchmark rank-major vs rank-trailing first-level contractions and chain
tails on the time-lapse canonical shape (33, 9, 1344, 1024).

Hypothesis: contracting a NON-MINOR mode m with output rank-major
(einsum 'abcd,aZ->Zbcd') is a natural no-transpose GEMM (contraction over
the leading axis of V, remaining axes keep V's layout), whereas the
rank-trailing convention ('abcd,aZ->bcdZ') forces XLA to transpose ~|V|
bytes. Chain tails then run as batched einsums with the rank as a leading
batch dim, which XLA GEMMs natively.
"""
import time

import jax
import jax.numpy as jnp

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
    pull_overhead = (time.perf_counter() - t0) / 3
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        leaves = jax.tree_util.tree_leaves(out)
        pull(leaves[0])
        dt = max((time.perf_counter() - t0 - pull_overhead) / n, 1e-9)
        best = dt if best is None else min(best, dt)
    print(f"{name:46s} {best*1e3:9.3f} ms")
    return best


def main():
    shape = (33, 9, 1344, 1024)
    R = 10
    key = jax.random.PRNGKey(0)
    kV, *kws = jax.random.split(key, 5)
    V = jax.random.uniform(kV, shape, dtype=jnp.float32)
    Ws = [jax.random.uniform(k, (s, R), dtype=jnp.float32)
          for k, s in zip(kws, shape)]
    print("device:", jax.devices()[0], "V bytes:", V.nbytes)
    pull(V)

    # --- first-level contraction of mode 0 (major axis) ---
    f_trail = jax.jit(lambda V, W: jnp.einsum('abcd,aZ->bcdZ', V, W))
    f_major = jax.jit(lambda V, W: jnp.einsum('abcd,aZ->Zbcd', V, W))
    # mode 1 (also non-minor)
    f1_trail = jax.jit(lambda V, W: jnp.einsum('abcd,bZ->acdZ', V, W))
    f1_major = jax.jit(lambda V, W: jnp.einsum('abcd,bZ->aZcd', V, W))
    f1_major0 = jax.jit(lambda V, W: jnp.einsum('abcd,bZ->Zacd', V, W))
    timeit("mode0 rank-trailing  abcd,aZ->bcdZ", lambda: f_trail(V, Ws[0]))
    timeit("mode0 rank-major     abcd,aZ->Zbcd", lambda: f_major(V, Ws[0]))
    timeit("mode1 rank-trailing  abcd,bZ->acdZ", lambda: f1_trail(V, Ws[1]))
    timeit("mode1 rank-inplace   abcd,bZ->aZcd", lambda: f1_major(V, Ws[1]))
    timeit("mode1 rank-leading   abcd,bZ->Zacd", lambda: f1_major0(V, Ws[1]))

    # --- chain tail step on the rank-major intermediate ---
    T_major = jax.jit(lambda V, W: jnp.einsum('abcd,aZ->Zbcd', V, W))(V, Ws[0])
    pull(T_major)
    T_trail = jax.jit(lambda V, W: jnp.einsum('abcd,aZ->bcdZ', V, W))(V, Ws[0])
    pull(T_trail)
    t_major = jax.jit(lambda T, W: jnp.einsum('Zbcd,bZ->Zcd', T, W))
    t_trail = jax.jit(lambda T, W: jnp.einsum('bcdZ,bZ->cdZ', T, W))
    timeit("tail rank-major      Zbcd,bZ->Zcd", lambda: t_major(T_major, Ws[1]))
    timeit("tail rank-trailing   bcdZ,bZ->cdZ", lambda: t_trail(T_trail, Ws[1]))

    # --- full pair-cache chain root for time-lapse: contract modes (0,1),
    #     leaving (c,d,R) pair cache ---
    chain_major = jax.jit(lambda V, W0, W1: jnp.einsum(
        'Zbcd,bZ->cdZ', jnp.einsum('abcd,aZ->Zbcd', V, W0), W1))
    chain_trail = jax.jit(lambda V, W0, W1: jnp.einsum(
        'bcdZ,bZ->cdZ', jnp.einsum('abcd,aZ->bcdZ', V, W0), W1))
    timeit("chain(0,1) major-then-trail out", lambda: chain_major(V, Ws[0], Ws[1]))
    timeit("chain(0,1) rank-trailing", lambda: chain_trail(V, Ws[0], Ws[1]))

    # bf16 variant of the winning first contraction
    Vb = V.astype(jnp.bfloat16)
    pull(Vb)
    fb = jax.jit(lambda V, W: jnp.einsum(
        'abcd,aZ->Zbcd', V, W.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))
    timeit("mode0 rank-major bf16", lambda: fb(Vb, Ws[0]))


if __name__ == "__main__":
    main()
