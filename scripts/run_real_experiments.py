"""Real-data benchmark grid on TPU — the reference's flagship experiments.

Mirrors script/script_real.py:42-58: coil-100 and time-lapse, CP rank 10
(pp 0/1, restol {0.05, 0.1}) and Tucker ranks (3,10,10,70)/(10,100,100,5)
(pp 0/1, restol {0.1, 0.5}), maxiter 250 — plus the framework's
mixed-precision (bf16-stored V) variant for CP. One process per dataset:
the tensor uploads to the device once and every config runs against it.

Writes results/real_<dataset>_<model>_pp<pp>_rt<restol>[_bf16].csv (the
reference CSV schema) and results/real_experiments.json with final
fitness / per-sweep dtime per config.

Usage: python scripts/run_real_experiments.py [coil|timelapse] [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/pp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from pairwise_perturbation_tpu.models import cp, tucker
    from pairwise_perturbation_tpu.utils import io as ppio, layout as tlayout
    from pairwise_perturbation_tpu.utils.metrics import PlotFile

    dataset = sys.argv[1] if len(sys.argv) > 1 else "coil"
    quick = "--quick" in sys.argv
    maxiter = 30 if quick else 250
    data_dir = os.environ.get("PP_DATA_DIR", "/root/data")

    if dataset == "coil":
        V_np = ppio.load_coil100(os.path.join(data_dir, "coil-100.bin"))
        tranks = (3, 10, 10, 70)
    else:
        V_np = ppio.load_time_lapse(os.path.join(data_dir, "time-lapse.bin"))
        tranks = (10, 100, 100, 5)
    V_np, perm = tlayout.canonicalize(V_np)
    tranks = tlayout.permute_tuple(tranks, perm)
    Vnorm = float(np.linalg.norm(V_np.ravel()))
    print(f"[{dataset}] shape {V_np.shape} (perm {perm}) "
          f"norm {Vnorm:.6e}", flush=True)

    t0 = time.perf_counter()
    V = jnp.asarray(V_np)
    V = V + 0.0  # force upload
    float(V.ravel()[0])
    print(f"upload: {time.perf_counter() - t0:.1f}s", flush=True)
    V16 = V.astype(jnp.bfloat16)

    out_path = "results/real_experiments.json"
    summary = {}
    if os.path.exists(out_path):
        summary = json.load(open(out_path))
    os.makedirs("results", exist_ok=True)

    def done(name):
        if name in summary and "--overwrite" not in sys.argv:
            print(f"[{name}] already recorded, skipping", flush=True)
            return True
        return False

    def record(name, res, kind):
        hist = res.history
        entry = dict(
            final_diffV=float(hist[-1]["diffV"]) if hist else None,
            final_rel_fitness=(float(hist[-1]["diffV"]) / Vnorm
                               if hist else None),
            dtime=float(hist[-1]["dtime"]) if hist else None,
            iters=int(res.iters),
            kind=kind,
            note="STAND-IN dataset (generated, no network egress; "
                 "see scripts/make_datasets.py)",
        )
        summary[name] = entry
        with open(out_path, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"[{name}] diffV {entry['final_diffV']:.6e} "
              f"rel {entry['final_rel_fitness']:.4f} "
              f"dtime {entry['dtime']:.2f}s iters {entry['iters']}",
              flush=True)

    # ---------------- CP grid ----------------
    R = 10
    from pairwise_perturbation_tpu import native
    split, _t, _tm = native.plan_tree_split_traffic(tuple(V.shape), R)
    if split == (V.ndim - 1) // 2:
        split = None
    for vdt, tag in ((V, "f32"), (V16, "bf16")):
        for pp in (0, 1):
            restols = [0.1] if pp == 0 else [0.05, 0.1]
            for rt in restols:
                name = f"real_{dataset}_cp_pp{pp}_rt{rt}_{tag}"
                if done(name):
                    continue
                Ws = cp.init_factors(V.shape, R, dtype=jnp.float32)
                cfg = cp.CPConfig(tol=1e-10 * Vnorm, pp_res_tol=rt,
                                  maxiter=maxiter, resprint=10,
                                  solver="svd", tree_split=split)
                plot = PlotFile(f"results/{name}.csv", PlotFile.CP_HEADER,
                                echo=False)
                if pp == 0:
                    res = cp.als_cp_dt(vdt, Ws, cfg, plot)
                else:
                    # fused device-resident DT<->PP machine (one dispatch
                    # per ~64 sweeps) — the flagship PP path
                    res = cp.als_cp_pp_fused(vdt, Ws, cfg, plot)
                plot.close()
                record(name, res, "cp")

    # ---------------- Tucker grid ----------------
    for pp in (0, 1):
        for rt in ([0.5] if pp == 0 else [0.1, 0.5]):
            name = f"real_{dataset}_tucker_pp{pp}_rt{rt}"
            if done(name):
                continue
            cfg = tucker.TuckerConfig(tol=1e-10 * Vnorm, pp_res_tol=rt,
                                      maxiter=maxiter, resprint=5)
            plot = PlotFile(f"results/{name}.csv", PlotFile.TUCKER_HEADER,
                            echo=False)
            if pp == 0:
                res = tucker.als_tucker(V, tranks, cfg, plot)
            else:
                # fused device-resident Tucker DT<->PP machine (one
                # dispatch per ~chunk sweeps) — the flagship Tucker path
                res = tucker.als_tucker_pp_fused(V, tranks, cfg, plot)
            plot.close()
            record(name, res, "tucker")

    print("done:", out_path)


if __name__ == "__main__":
    main()
