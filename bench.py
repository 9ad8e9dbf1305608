"""Headline benchmark: CP-ALS dimension-tree sweeps/second on the coil-100
configuration (order-4 ``3 x 128 x 128 x 7200``, rank 10 — the reference's
flagship real-data benchmark, script/script_real.py:42-44), on whatever
accelerator jax exposes (one TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extra}.

Baseline note: the reference repo publishes no numbers (BASELINE.md). The
paper's Stampede2 runs put the CTF CPU DT sweep for this config at order
~1 s/sweep on one node (8 ranks x 8 threads); BASELINE.json's target is
>=10x that. We therefore report vs_baseline = sweeps_per_sec / 1.0
(conservative CTF-1-node estimate of 1.0 sweeps/s).
"""

from __future__ import annotations

import json
import sys
import time

CTF_BASELINE_SWEEPS_PER_SEC = 1.0  # conservative 1-node CTF estimate (see above)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from pairwise_perturbation_tpu.models import cp

    shape = (3, 128, 128, 7200)
    R = 10
    dtype = jnp.float32
    extra = {}

    try:
        key = jax.random.PRNGKey(0)
        kV, *kws = jax.random.split(key, len(shape) + 1)
        # coil-100-shaped random data (values in [0, 255] like image data)
        V = jax.random.uniform(kV, shape, dtype=dtype) * 255.0
        Ws = [jax.random.uniform(k, (s, R), dtype=dtype)
              for k, s in zip(kws, shape)]
        lam = jnp.asarray(0.0, dtype=dtype)

        def one_sweep(Ws):
            Ws_new, _ = cp.dt_sweep(V, list(Ws), lam, solver="svd")
            return tuple(Ws_new)

        @jax.jit
        def n_sweeps(Ws, n):
            def body(_, Ws):
                return one_sweep(Ws)
            return jax.lax.fori_loop(0, n, body, tuple(Ws))

        # warm-up + compile
        Ws_t = tuple(Ws)
        out = n_sweeps(Ws_t, 1)
        jax.block_until_ready(out)

        n = 20
        t0 = time.perf_counter()
        out = n_sweeps(Ws_t, n)
        jax.block_until_ready(out)
        dt_sweep_time = (time.perf_counter() - t0) / n
        sweeps_per_sec = 1.0 / dt_sweep_time

        # PP steady-state sweep time (cheap corrections, no V touched)
        single, pair = cp.pp_build_caches(V, list(Ws))
        W_init = [w for w in Ws]
        dWs = [jnp.zeros_like(w) for w in Ws]
        out = cp.pp_sweep(single, pair, list(Ws), W_init, dWs, lam, 1.0,
                          solver="svd")
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = cp.pp_sweep(single, pair, list(Ws), W_init, dWs, lam, 1.0,
                              solver="svd")
            jax.block_until_ready(out)
        pp_sweep_time = (time.perf_counter() - t0) / 5

        # effective MTTKRP FLOP rate for the DT sweep: ~2 first-level
        # chains of 2*nnz*R flops each dominate
        nnz = 1
        for s in shape:
            nnz *= s
        flops_per_sweep = 2 * 2 * nnz * R
        extra = {
            "device": str(jax.devices()[0]),
            "dt_sweep_seconds": dt_sweep_time,
            "pp_sweep_seconds": pp_sweep_time,
            "dt_tflops_effective": flops_per_sweep / dt_sweep_time / 1e12,
            "config": "coil-100-shaped random, order-4 3x128x128x7200, rank 10, f32",
        }
        value = sweeps_per_sec
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": "cp_dt_sweeps_per_sec_coil100",
                          "value": 0.0, "unit": "sweeps/s",
                          "vs_baseline": 0.0, "error": repr(e)[:400]}))
        return 1

    print(json.dumps({
        "metric": "cp_dt_sweeps_per_sec_coil100",
        "value": round(value, 4),
        "unit": "sweeps/s",
        "vs_baseline": round(value / CTF_BASELINE_SWEEPS_PER_SEC, 4),
        **extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
