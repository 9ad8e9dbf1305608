"""Sparse PP vs sparse ALS: end-to-end time-to-fitness on the COO
engine (completes the round-5 sparse performance story with an e2e row).

Fixture: the reference's natural sparse family — the folded Poisson /
laplacian tensor (`-tensor p`, common.cxx:575-642), order-4 (169,)*4
(dim 8, size 13: the reference's own synthetic sizing family,
script_synthetic.py), ~0.07% dense. CP from random init genuinely needs
many sweeps, so the fitness race is non-degenerate (unlike random COO).

DT baseline = als_cp_sparse (plain sparse ALS, the reference's
alsCP-on-sparse role) vs PP = als_cp_pp_sparse; identical seeded init,
throwaway warm runs for both engines (first-engine-in-process relay
overhead — see bench_tucker_e2e.py), 90%-improvement + equal-fitness
metrics.

Usage: python scripts/bench_sparse_e2e.py
Appends results/sparse_e2e.json + a section consumed into SPARSE_PERF
notes by hand (single config).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fitness import (equal_fitness_times, final_row_fitness,
                     improvement_times)


def main():
    from pairwise_perturbation_tpu.models import cp, sparse_cp
    from pairwise_perturbation_tpu.ops import sparse as spo
    from pairwise_perturbation_tpu.utils import synth

    V = synth.make_tensor("p", dim=8, s=13, R=4, seed=1,
                          dtype=np.float32)
    st = spo.from_dense(V)
    density = st.nnz / V.size
    Vn = float(np.linalg.norm(V))
    print(f"shape {V.shape} nnz {st.nnz:,} density {density:.5f}",
          flush=True)
    del V
    R = 4
    maxiter = 250
    W0 = cp.init_factors(st.shape, R, dtype=jnp.float32)
    common = dict(tol=1e-10 * Vn, maxiter=maxiter, resprint=5,
                  solver="svd")

    # throwaway warm runs (same statics; timelimit cuts them short)
    warm = dict(common, timelimit=0.3)
    sparse_cp.als_cp_sparse(st, [jnp.array(w) for w in W0],
                            cp.CPConfig(pp_res_tol=0.1, **warm))
    sparse_cp.als_cp_pp_sparse(st, [jnp.array(w) for w in W0],
                               cp.CPConfig(pp_res_tol=0.1, **warm))
    print("(warm runs done)", flush=True)

    res_dt = sparse_cp.als_cp_sparse(
        st, [jnp.array(w) for w in W0],
        cp.CPConfig(pp_res_tol=0.1, **common))
    print(f"ALS : final diffV {res_dt.diffV:.6e} "
          f"dtime {res_dt.history[-1]['dtime']:.3f}s", flush=True)

    out = {}
    for rt in (0.05, 0.1):
        res_pp = sparse_cp.als_cp_pp_sparse(
            st, [jnp.array(w) for w in W0],
            cp.CPConfig(pp_res_tol=rt, **common))
        t_dt, t_pp, target, rule = equal_fitness_times(
            res_dt.history, res_pp.history)
        t_d9, t_p9, tgt9, degen = improvement_times(
            res_dt.history, res_pp.history, frac=0.9)
        speedup = (t_dt / t_pp) if (t_dt and t_pp) else None
        speedup90 = (t_d9 / t_p9) \
            if (t_d9 is not None and t_p9 and not degen) else None
        out[f"pp_rt{rt}"] = dict(
            shape=list(st.shape), nnz=int(st.nnz), rank=R, restol=rt,
            als_final_diffV=float(final_row_fitness(res_dt.history)),
            pp_final_diffV=float(final_row_fitness(res_pp.history)),
            als_total_dtime=float(res_dt.history[-1]["dtime"]),
            pp_total_dtime=float(res_pp.history[-1]["dtime"]),
            equal_fitness_speedup=speedup, fitness_rule=rule,
            als_t90=t_d9, pp_t90=t_p9, speedup90=speedup90,
            degenerate=bool(degen))
        print(f"PP rt={rt}: final {out[f'pp_rt{rt}']['pp_final_diffV']:.6e} "
              f"equal-fitness {speedup} ({rule}); t90 ALS {t_d9} PP {t_p9} "
              f"-> speedup90 {speedup90}{' DEGENERATE' if degen else ''}",
              flush=True)
    os.makedirs("results", exist_ok=True)
    json.dump(out, open("results/sparse_e2e.json", "w"), indent=1,
              sort_keys=True)
    print("wrote results/sparse_e2e.json")


if __name__ == "__main__":
    main()
