"""End-to-end time-to-fitness: DT vs PP, f32 vs bf16-V, coil-100 config.

Runs the device-resident DT<->PP solver on a coil-100-shaped random
tensor (the reference's flagship real-data configuration) in both
precisions and writes convergence CSVs under results/. Validates the
mixed-precision claim: the bf16-V run must reach the benchmark residual
tolerances (0.05-0.1 relative) on the same trajectory as f32.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pairwise_perturbation_tpu.models import cp
from pairwise_perturbation_tpu.utils.metrics import PlotFile


def run(tag, V, Ws, cfg):
    os.makedirs("results", exist_ok=True)
    path = f"results/e2e_{tag}.csv"
    plot = PlotFile(path, PlotFile.CP_HEADER, echo=False)
    t0 = time.perf_counter()
    res = cp.als_cp_pp_device(V, Ws, cfg, plot)
    wall = time.perf_counter() - t0
    plot.close()
    rows = [h for h in res.history]
    final = rows[-1] if rows else {}
    print(json.dumps({
        "tag": tag, "iters": res.iters, "wall_s": round(wall, 3),
        "final_gradnorm": final.get("gradnorm"),
        "final_diffV": final.get("diffV"),
        "dtime": final.get("dtime"), "csv": path}))
    return res


def main():
    shape = (3, 128, 128, 7200)
    R = 10
    key = jax.random.PRNGKey(0)
    kV, kN, *kws = jax.random.split(key, len(shape) + 2)
    # exact-rank-R ground truth + 1% noise (the 'r'-fixture structure at
    # the coil-100 shape): both precisions should drive the relative
    # residual to the noise floor.
    Gs = [jax.random.uniform(k, (s, R), dtype=jnp.float32)
          for k, s in zip(jax.random.split(kV, len(shape)), shape)]
    V = jnp.einsum("aZ,bZ,cZ,dZ->abcd", *Gs, optimize=True)
    noise = jax.random.normal(kN, shape, dtype=jnp.float32)
    V = V + noise * (0.01 * jnp.linalg.norm(V.ravel())
                     / jnp.linalg.norm(noise.ravel()))
    Ws = [jax.random.uniform(k, (s, R), dtype=jnp.float32)
          for k, s in zip(kws, shape)]
    Vn = float(jnp.linalg.norm(V.ravel()))
    print("device:", jax.devices()[0], "||V|| =", Vn)

    cfg = cp.CPConfig(tol=0.0, pp_res_tol=0.01, maxiter=120, resprint=10)
    res32 = run("coil_f32_pp", V, [w for w in Ws], cfg)
    res16 = run("coil_bf16_pp", V.astype(jnp.bfloat16), [w for w in Ws],
                cfg)
    rel32 = res32.diffV / Vn
    rel16 = res16.diffV / Vn
    print(json.dumps({"rel_residual_f32": round(rel32, 6),
                      "rel_residual_bf16v": round(rel16, 6),
                      "bf16_matches_f32_fitness":
                          bool(abs(rel16 - rel32) < 0.02),
                      "bf16_below_benchmark_restol": bool(rel16 < 0.05)}))


if __name__ == "__main__":
    main()
