"""Tucker PP vs Tucker DT: end-to-end time-to-fitness
(VERDICT r4 weak #2 / next #3).

Round 4's diagnosis: coil Tucker PP lost 0.57x because the PP sweep was
extraction-dominated. Round 5 acts on it (tucker_pp_sweep: PP-auto
1-iteration warm subspace; quiet-mode skip measured negative and
default-off) and measures honestly: throwaway warm runs for BOTH
engines (the first engine in a relay process carries ~8 ms/sweep of
dispatch overhead), the 90%-of-achievable-improvement metric
(fitness.improvement_times, degenerate-flagged), and attribution rows
(`_skip`, `_exact_extract`). Configs: coil ranks (3,10,10,70) and an
order-6 low-rank Tucker fixture (the strong-scaling shape class,
script_strongscaling.py:10, sized to one chip; the raw r2 random
tensor is degenerate for a fitness race — truncated Tucker on noise
improves ~0%).

Verdict in results/TUCKER_PP.md: PP loses 0.3-0.8x structurally — the
race from an HOSVD init is ~10 roofline DT sweeps.

Usage: python scripts/bench_tucker_e2e.py [config ...]
  configs: order6 coil all (default all); `md` rewrites the markdown
Writes results/tucker_e2e.json + results/TUCKER_PP.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fitness import (equal_fitness_times, final_row_fitness,
                     improvement_times)

OUT = "results/tucker_e2e.json"


def _configs():
    from pairwise_perturbation_tpu.utils import synth
    cfgs = {}

    def order6():
        # genuine low-rank TUCKER ground truth + 1% noise: the r2 random
        # tensor is DEGENERATE for this metric (truncated Tucker on
        # noise improves fitness ~0%, measured) — a fitness race needs
        # actual improvement to race over
        rng = np.random.default_rng(2)
        shape, ranks = (24,) * 6, (6,) * 6
        core = rng.standard_normal(ranks)
        Wt = [np.linalg.qr(rng.standard_normal((s, r)))[0]
              for s, r in zip(shape, ranks)]
        # successive tensordots (optimize=True): the naive einsum path
        # is O(|V| * prod(ranks)) single-threaded — hours on this host
        V = core
        for m, W in enumerate(Wt):
            V = np.tensordot(W, np.moveaxis(V, m, 0), axes=(1, 0))
            V = np.moveaxis(V, 0, m)
        V += 0.01 * np.linalg.norm(V) / np.sqrt(V.size) \
            * rng.standard_normal(shape)
        return jnp.asarray(V, jnp.float32), ranks, 250

    cfgs["order6_s24_r2"] = order6

    def coil():
        from pairwise_perturbation_tpu.utils import io as ppio
        from pairwise_perturbation_tpu.utils import layout as tlayout
        data_dir = os.environ.get("PP_DATA_DIR", "/root/repo/data")
        V_np = ppio.load_coil100(os.path.join(data_dir, "coil-100.bin"))
        V, perm = tlayout.canonicalize(V_np.astype(np.float32))
        ranks = tlayout.permute_tuple((3, 10, 10, 70), perm)
        return jnp.asarray(V), tuple(ranks), 250

    cfgs["coil_standin"] = coil
    return cfgs


def main():
    from pairwise_perturbation_tpu.models import tucker

    want = sys.argv[1:] or ["all"]
    if want == ["md"]:
        names = []
        cfgs = {}
    else:
        cfgs = _configs()
        names = list(cfgs) if "all" in want else \
            [n for n in cfgs
             if any(n.startswith(w) or w in n for w in want)]
        if not names:
            raise SystemExit(
                f"no config matches {want}; have {list(cfgs)}")
    summary = {}
    if os.path.exists(OUT):
        summary = json.load(open(OUT))

    for name in names:
        V, ranks, maxiter = cfgs[name]()
        Vnorm = float(jnp.linalg.norm(V.ravel()))
        print(f"== {name}: shape {V.shape} ranks {ranks}", flush=True)
        # identical init for every run: deterministic HOSVD
        core0, Ws0 = tucker.hosvd(V, ranks)
        common = dict(tol=1e-10 * Vnorm, maxiter=maxiter, resprint=5)

        # THROWAWAY warm runs of both engines: the first execution of
        # each engine in a process pays one-time relay/program costs
        # (~0.8 s) inside dtime — measured as run-order swapping the
        # attribution rows' speedups before this fix
        # maxiter is STATIC in the fused machine (max_hist), so warm
        # runs keep it and stop early via timelimit — same executables
        warm_common = dict(common, timelimit=0.25)
        tucker.als_tucker(V, ranks,
                          tucker.TuckerConfig(pp_res_tol=0.1,
                                              **warm_common),
                          Ws=[jnp.array(w) for w in Ws0])
        print("  (DT warm run done)", flush=True)

        cfg_dt = tucker.TuckerConfig(pp_res_tol=0.1, **common)
        res_dt = tucker.als_tucker(V, ranks, cfg_dt,
                                   Ws=[jnp.array(w) for w in Ws0])
        print(f"  DT : final diffV {res_dt.diffV:.6e} "
              f"dtime {res_dt.history[-1]['dtime']:.3f}s", flush=True)

        # rows: primary (PP-auto extraction, no skip), `_skip`
        # (quiet-mode skip on — attribution), `_exact_extract`
        # (subspace_iters=0 = reference extraction — attribution)
        for rt in (0.1, 0.5):
            for extra, qtag in ((dict(), ""),
                                (dict(pp_quiet_frac=0.1), "_skip"),
                                (dict(subspace_iters=0),
                                 "_exact_extract")):
                if qtag and rt != 0.1:
                    continue  # attribution runs only at one restol
                cfg_pp = tucker.TuckerConfig(pp_res_tol=rt, **common,
                                             **extra)
                # per-variant throwaway warm run (fresh statics = fresh
                # executables; their one-time load must not land in the
                # measured run's dtime)
                tucker.als_tucker_pp_fused(
                    V, ranks,
                    tucker.TuckerConfig(pp_res_tol=rt, **warm_common,
                                        **extra),
                    Ws=[jnp.array(w) for w in Ws0])
                res_pp = tucker.als_tucker_pp_fused(
                    V, ranks, cfg_pp, Ws=[jnp.array(w) for w in Ws0])
                t_dt, t_pp, target, rule = equal_fitness_times(
                    res_dt.history, res_pp.history)
                speedup = (t_dt / t_pp) if (t_dt and t_pp) else None
                # headline: time to cover 90% of the achievable fitness
                # improvement — robust where HOSVD init sits within
                # noise of the equal-fitness target (threshold-jitter
                # "speedups" otherwise)
                t_dt9, t_pp9, target9, degen = improvement_times(
                    res_dt.history, res_pp.history, frac=0.9)
                speedup90 = (t_dt9 / t_pp9) \
                    if (t_dt9 is not None and t_pp9 is not None
                        and t_pp9 > 0 and not degen) else None
                key = f"{name}_rt{rt}{qtag}"
                summary[key] = dict(
                    shape=list(V.shape), ranks=list(ranks), restol=rt,
                    variant=qtag or "primary", maxiter=maxiter,
                    dt_final_diffV=float(final_row_fitness(
                        res_dt.history)),
                    pp_final_diffV=float(final_row_fitness(
                        res_pp.history)),
                    dt_time_to_target=t_dt, pp_time_to_target=t_pp,
                    dt_total_dtime=float(res_dt.history[-1]["dtime"]),
                    pp_total_dtime=float(res_pp.history[-1]["dtime"]),
                    target_diffV=float(target), fitness_rule=rule,
                    speedup=speedup,
                    dt_time_to_90pct=t_dt9, pp_time_to_90pct=t_pp9,
                    target_90pct=float(target9), degenerate=bool(degen),
                    speedup90=speedup90)
                print(f"  PP rt={rt}{qtag}: final "
                      f"{summary[key]['pp_final_diffV']:.6e} "
                      f"target {target:.4e} ({rule}) speedup {speedup} "
                      f"| 90%-improvement target {target9:.4e} "
                      f"DT {t_dt9} s PP {t_pp9} s -> "
                      f"speedup90 {speedup90}"
                      f"{' DEGENERATE' if degen else ''}", flush=True)
                json.dump(summary, open(OUT, "w"), indent=1,
                          sort_keys=True)
        del V
    # ---- TUCKER_PP.md ----
    lines = [
        "# Tucker PP vs Tucker DT: time-to-equal-fitness "
        "(one TPU v5e chip)", "",
        "DT = als_tucker host driver (honest clock); PP = fused Tucker "
        "DT<->PP machine. Primary rows use the round-5 extraction "
        "economics (PP-auto 1-iteration warm subspace inside PP "
        "sweeps); `_exact_extract` rows force the reference's exact "
        "eigh extraction and `_skip` rows enable the (measured-"
        "negative, default-off) quiet-mode skip — both attribution "
        "runs. Identical deterministic HOSVD init.", "",
        "| config | ranks | restol | DT t90 (s) | PP t90 (s) "
        "| speedup (90% improvement) | equal-fitness speedup | "
        "DT full (s) | PP full (s) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for k in sorted(summary):
        e = summary[k]
        s9 = f"**{e['speedup90']:.2f}x**" \
            if e.get("speedup90") is not None \
            else ("degenerate" if e.get("degenerate") else "n/a")
        sp_ = f"{e['speedup']:.2f}x" \
            if e.get("speedup") is not None else "n/a"
        t9d = f"{e['dt_time_to_90pct']:.3f}" \
            if e.get("dt_time_to_90pct") is not None else "never"
        t9p = f"{e['pp_time_to_90pct']:.3f}" \
            if e.get("pp_time_to_90pct") is not None else "never"
        lines.append(
            f"| {k} | {'x'.join(map(str, e['ranks']))} | {e['restol']} "
            f"| {t9d} | {t9p} | {s9} | {sp_} "
            f"| {e['dt_total_dtime']:.3f} | {e['pp_total_dtime']:.3f} |")
    lines += [
        "", "`t90` = first time (diagnostics-excluded dtime) the "
        "trajectory covers 90% of the shared achievable fitness "
        "improvement (init -> worse final); robust where the HOSVD "
        "init already sits within noise of the equal-fitness target. "
        "`equal-fitness speedup` = the PP_WINS.md rule, shown for "
        "comparability (threshold jitter where marked degenerate). "
        "Both engines get a throwaway warm run first — without it the "
        "FIRST engine executed in a process carries ~8 ms/sweep of "
        "relay dispatch overhead and the comparison measures run "
        "order, not algorithms (observed as attribution rows swapping "
        "their speedups between sequencings).", "",
        "## Verdict: Tucker PP cannot pay on this hardware — the race "
        "is too short", "",
        "Round 4 diagnosed coil Tucker PP's 0.57x loss as "
        "extraction-dominated PP sweeps. Round 5 fixed that "
        "(PP-auto warm 1-iteration subspace extraction: PP t90 "
        "improves ~1.5x over `_exact_extract`) — and PP still loses, "
        "because the diagnosis was treating the symptom. The "
        "structural problem: Tucker-ALS from an HOSVD init covers 90% "
        "of its achievable fitness improvement in ~10 sweeps, and a "
        "DT Tucker sweep runs at the HBM roofline (~3 ms on coil) — "
        "the whole race is ~30 ms. PP must first run DT preconditioner "
        "sweeps until all factors are quiet (a large fraction of those "
        "same ~10 sweeps) and then pay a cache build before its first "
        "cheap sweep; there is nothing left to accelerate. The "
        "reference's Tucker-PP regime — CPU, seconds per sweep, "
        "hundreds of sweeps to convergence (als_Tucker.cxx, paper "
        "arXiv:1811.10573) — does not exist on a machine of this "
        "class at these sizes. CP PP wins (PP_WINS.md, 1.5-3x) "
        "because CP from random init genuinely needs hundreds of "
        "sweeps; Tucker from HOSVD does not. The PP Tucker machine "
        "remains fully implemented, reference-faithful and tested; "
        "`-model Tucker -pp 0` is the recommended production setting.",
    ]
    with open("results/TUCKER_PP.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote results/TUCKER_PP.md")


if __name__ == "__main__":
    main()
