"""Headline benchmark: CP-ALS dimension-tree sweeps/second on the coil-100
configuration (order-4 ``3 x 128 x 128 x 7200``, rank 10 — the reference's
flagship real-data benchmark, script/script_real.py:42-44), on whatever
accelerator jax exposes (one TPU chip under the driver).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extra}.

Timing method: N sweeps are dispatched back-to-back (each sweep's factors
feed the next, so execution is fully serialized on-device) and completion
is forced by pulling a tiny slice of the last result; the measured
host-pull latency is subtracted. This avoids wrapping the sweep in
lax.fori_loop, whose compile is pathological through the TPU relay.

Baseline: vs_baseline divides by a MEASURED CPU baseline when
results/baseline_cpu.json exists — the timed single-process numpy-f64
runner (scripts/baseline_cpu.py) executing the reference ALS semantics on
the same coil-100 configuration (dimension-tree FLOP structure included,
so the comparison is algorithmically fair). The reference repo itself
publishes no numbers (BASELINE.md); without the measured file we fall
back to a conservative CTF-1-node estimate of 1.0 sweeps/s (the paper's
Stampede2 runs put the CTF CPU DT sweep at order ~1 s/sweep on one node)
and say so in the output.
"""

from __future__ import annotations

import json
import os
import sys
import time

CTF_BASELINE_SWEEPS_PER_SEC = 1.0  # fallback estimate (see module docstring)


def _measured_baseline():
    """(headline_sps, headline_src, measured_sps, measured_src).

    The HEADLINE baseline is node-class-normalized: the reference ran CTF
    on Stampede2 nodes (64 threads); the conservative estimate for a CTF
    DT sweep on one such node is ~1 sweep/s (BASELINE.md). The locally
    MEASURED numpy-f64 baseline runs on a 2-core host and is ~10x slower
    than a node — honest as provenance, misleading as a headline — so
    vs_baseline divides by max(measured, CTF-node estimate) and the
    measured ratio is reported separately as vs_measured_host.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "baseline_cpu.json")
    try:
        data = json.load(open(path))
        sw = data["configs"]["coil_cp_dt"]["sweep_seconds"]
        measured = 1.0 / sw
        msrc = (f"measured: numpy-f64 DT sweep {sw:.3f}s/sweep "
                f"({data.get('note', '')})")
    except Exception:
        measured, msrc = None, "no measured baseline file"
    headline = max(measured or 0.0, CTF_BASELINE_SWEEPS_PER_SEC)
    hsrc = ("node-class-normalized: CTF 1-node (64-thread Stampede2-class) "
            "~1 sweep/s estimate; see BASELINE.md")
    if headline == measured:
        hsrc = msrc
    return headline, hsrc, measured, msrc


def _pull(x):
    import numpy as np
    return np.asarray(x[:1, :1])


def _best_of(measure, repeats=2):
    """Timing through the TPU relay varies run-to-run by 2-3x on
    millisecond scales; take the min of repeated chained measurements."""
    return min(measure() for _ in range(repeats))


def _sparse_perf_fields():
    """Measured vs_dense / roofline-fraction context from the dedicated
    sparse study (results/sparse_perf.json), keyed into the sparse
    section of the full-suite output (VERDICT r4 next #4's required
    fields). Empty when the study hasn't been run."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "sparse_perf.json")
    if not os.path.exists(path):
        return {}
    d = json.load(open(path))
    pick = {
        "mttkrp_best_ms": "sparse200_4_nnz1.6M_mttkrp_best_ms",
        "mttkrp_segment_ms": "sparse200_4_nnz1.6M_mttkrp_segment_ms",
        "mttkrp_onehot_full_roofline_frac":
            "sparse200_4_nnz1.6M_mttkrp_roofline_frac",
        "sweep_vs_dense": "sparse200_4_nnz1.6M_sweep_vs_dense",
        "dense_dt_sweep_ms": "sparse200_4_nnz1.6M_dense_sweep_ms",
        "mttkrp_vs_cpu": "sparse200_4_nnz1.6M_mttkrp_vs_cpu",
    }
    return {out: d[src] for src, out in pick.items() if src in d}


def main() -> int:
    import jax
    import jax.numpy as jnp

    try:  # persistent compile cache: repeated driver runs skip XLA compiles
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/pp_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from pairwise_perturbation_tpu.models import cp

    shape = (3, 128, 128, 7200)
    R = 10
    dtype = jnp.float32
    extra = {}

    # Full-suite sectioning: the relay keeps every loaded executable
    # (with its scratch reservation) alive for the life of the process —
    # jax.clear_caches() cannot release device program memory server-side
    # — so running every full-suite section in one process exhausts the
    # chip while loading later executables. PP_BENCH_SECTIONS selects a
    # comma-separated subset of {head,o3512,dense6,opt,tl} per process;
    # scripts/run_full_bench.sh runs the parts and merges the JSON.
    # Default (no PP_BENCH_SECTIONS): the driver's headline behavior.
    full = bool(os.environ.get("PP_BENCH_FULL"))
    _secs = set(s.strip() for s in
                os.environ.get("PP_BENCH_SECTIONS", "").split(",")
                if s.strip())

    def _sec(name):
        return full and (not _secs or name in _secs)

    # heavyweight headline sub-benches (planner/pp/msdt/o3/bf16 timings):
    # on for the driver's default run and for the "head" part; off for
    # lean parts like "opt" so their process loads few big executables
    head_on = (not _secs) or ("head" in _secs)

    try:
        key = jax.random.PRNGKey(0)
        kV, *kws = jax.random.split(key, len(shape) + 1)
        V = jax.random.uniform(kV, shape, dtype=dtype) * 255.0
        Ws = [jax.random.uniform(k, (s, R), dtype=dtype)
              for k, s in zip(kws, shape)]
        lam = jnp.asarray(0.0, dtype=dtype)

        # warm-up: compile + first pull (relay warm-up is tens of
        # seconds). Lean PP_BENCH_SECTIONS parts skip even the big
        # dt_sweep program — every loaded executable's scratch
        # reservation stays resident for the life of the process.
        if head_on:
            out, _ = cp.dt_sweep(V, Ws, lam, solver="svd")
            warm_ref = out[0]
        else:
            warm_ref = Ws[0]
        _pull(warm_ref)

        # measure host-pull latency: min of several — relay latency has a
        # heavy right tail, and overestimating the overhead clamps the
        # small per-sweep measurements it is subtracted from to ~0
        def _pull_once():
            t0 = time.perf_counter()
            _pull(warm_ref)
            return time.perf_counter() - t0
        pull_overhead = min(_pull_once() for _ in range(6))

        n = 100
        st = {"cur": list(Ws)}

        def m_dt():
            cur = st["cur"]
            t0 = time.perf_counter()
            for _ in range(n):
                cur, _ = cp.dt_sweep(V, cur, lam, solver="svd")
            _pull(cur[0])
            st["cur"] = cur
            return max((time.perf_counter() - t0 - pull_overhead) / n, 1e-9)

        dt_sweep_time = _best_of(m_dt) if head_on else None
        sweeps_per_sec = (1.0 / dt_sweep_time) if dt_sweep_time else 0.0

        # native-planner root split (native/planner.cpp
        # plan_tree_split_traffic): HBM-traffic objective — the op is
        # bandwidth-bound, so bytes moved (~3% modeled saving on coil's
        # skewed shape) predicts sweep time where the old FLOP model
        # over-promised 20% (VERDICT r3 weak #7)
        from pairwise_perturbation_tpu import native as ppnative
        split, _t, _tm = ppnative.plan_tree_split_traffic(shape, R)
        stp2 = {"cur": list(Ws)}

        def m_dt_planner():
            cur = stp2["cur"]
            t0 = time.perf_counter()
            for _ in range(n):
                cur, _ = cp.dt_sweep(V, cur, lam, solver="svd",
                                     root_split=split)
            _pull(cur[0])
            stp2["cur"] = cur
            return max((time.perf_counter() - t0 - pull_overhead) / n, 1e-9)

        dt_sweep_planner = None
        if head_on:
            cur0, _ = cp.dt_sweep(V, list(Ws), lam, solver="svd",
                                  root_split=split)
            _pull(cur0[0])
            stp2["cur"] = cur0
            dt_sweep_planner = _best_of(m_dt_planner)

        # PP: cache build time and steady-state sweep time. Chain several
        # builds back-to-back (data-dependent via a factor perturbation,
        # fused into the same jit — tiny separate dispatches cost ~1 ms
        # each through the relay) so host-pull latency amortizes out.
        @jax.jit
        def build_chained(V, Ws):
            single, pair = cp.pp_build_caches.__wrapped__(V, list(Ws))
            Ws2 = [w + 0.0 * single[0][0, 0] for w in Ws]
            return single, pair, Ws2

        need_caches = head_on or _sec("pu")
        if need_caches:
            single, pair, Wsb = build_chained(V, list(Ws))
            _pull(single[0])
        else:
            single = pair = Wsb = None
        nb = 10
        stb = {"Wsb": Wsb, "single": single, "pair": pair}

        def m_build(Vx=V):
            sb, pb, wb = stb["single"], stb["pair"], stb["Wsb"]
            t0 = time.perf_counter()
            for _ in range(nb):
                sb, pb, wb = build_chained(Vx, wb)
            _pull(sb[0])
            stb.update(single=sb, pair=pb, Wsb=wb)
            return max(
                (time.perf_counter() - t0 - pull_overhead) / nb, 1e-9)

        pp_build_time = _best_of(m_build) if head_on else None
        single, pair = stb["single"], stb["pair"]

        W_init = [w for w in Ws]
        dWs = [jnp.zeros_like(w) for w in Ws]
        if head_on:
            out = cp.pp_sweep(single, pair, list(Ws), W_init, dWs, lam,
                              1.0, solver="svd")
            _pull(out[0][0])
        npp = 50
        stp = {"cur": list(Ws), "dcur": dWs}

        def m_pp():
            cur, dcur = stp["cur"], stp["dcur"]
            t0 = time.perf_counter()
            for _ in range(npp):
                cur, dcur, _ = cp.pp_sweep(single, pair, cur, W_init, dcur,
                                           lam, 1.0, solver="svd")
            _pull(cur[0])
            stp.update(cur=cur, dcur=dcur)
            return max(
                (time.perf_counter() - t0 - pull_overhead) / npp, 1e-9)

        pp_sweep_time = _best_of(m_pp) if head_on else None

        # MSDT (multi-sweep dimension tree, arXiv:2010.12056): one full
        # device-resident rotation = order-1 sweeps per dispatch
        from pairwise_perturbation_tpu.models import optimizers as ppopt
        order = len(shape)
        msdt_sweep_time = msdt_skip_sweep_time = None
        if head_on:
            cur0, _ = ppopt.msdt_cycle(V, list(Ws), lam,
                                       start_left=order - 1)
            _pull(cur0[0])
        ncyc = 30
        stm = {"cur": cur0 if head_on else None}

        def m_msdt():
            cur = stm["cur"]
            t0 = time.perf_counter()
            for _ in range(ncyc):
                cur, _ = ppopt.msdt_cycle(V, cur, lam,
                                          start_left=order - 1)
            _pull(cur[0])
            stm["cur"] = cur
            return max((time.perf_counter() - t0 - pull_overhead)
                       / ncyc / (order - 1), 1e-9)

        if head_on:
            msdt_sweep_time = _best_of(m_msdt)

        # MSDT with the restricted hold-out rotation (-msdt_min_holdout):
        # the size-3 mode is never held out, so no cycle step pays the
        # |V|*R/3 first-level intermediate.
        lefts_skip = tuple(m for m in range(order - 1, -1, -1)
                           if shape[m] >= 8)
        if head_on:
            cur0s, _ = ppopt.msdt_cycle(V, list(Ws), lam, lefts=lefts_skip)
            _pull(cur0s[0])
        stms = {"cur": cur0s if head_on else None}

        def m_msdt_skip():
            cur = stms["cur"]
            t0 = time.perf_counter()
            for _ in range(ncyc):
                cur, _ = ppopt.msdt_cycle(V, cur, lam, lefts=lefts_skip)
            _pull(cur[0])
            stms["cur"] = cur
            sweeps_per_cycle = len(lefts_skip) * (order - 1) / order
            return max((time.perf_counter() - t0 - pull_overhead)
                       / ncyc / sweeps_per_cycle, 1e-9)

        if head_on:
            msdt_skip_sweep_time = _best_of(m_msdt_skip)

        # BASELINE config 1: order-3 200^3 rank-10 exact ALS sweep, with and
        # without the fused Pallas MTTKRP kernel
        import pairwise_perturbation_tpu.config as ppcfg
        V3 = jax.random.uniform(jax.random.PRNGKey(3), (200, 200, 200),
                                dtype=dtype)
        Ws3 = [jax.random.uniform(jax.random.PRNGKey(40 + i), (200, R),
                                  dtype=dtype) for i in range(3)]

        from functools import partial as _partial

        from pairwise_perturbation_tpu.ops import contract, solve as ppsolve

        @_partial(jax.jit, static_argnames=("use_pallas",))
        def o3_sweep(V, Ws, *, use_pallas):
            Ws = list(Ws)
            for i in range(3):
                M = contract.mttkrp(V, Ws, i, use_pallas=use_pallas)
                S = contract.hadamard_gram(Ws, skip_mode=i)
                Ws[i] = ppsolve.svd_solve(M, S)
            return contract.normalize_factors(Ws)

        def time_o3_generic(Vx, Wsx, use_pallas, n=50):
            cur = o3_sweep(Vx, list(Wsx), use_pallas=use_pallas)
            _pull(cur[0])
            t0 = time.perf_counter()
            for _ in range(n):
                cur = o3_sweep(Vx, cur, use_pallas=use_pallas)
            _pull(cur[0])
            return max((time.perf_counter() - t0 - pull_overhead) / n, 1e-9)

        t_o3_xla = _best_of(lambda: time_o3_generic(V3, Ws3, False)) \
            if head_on else None
        t_o3_pallas = _best_of(lambda: time_o3_generic(V3, Ws3, True)) \
            if head_on else None

        # order-3 512^3 (larger single-mode scale; Pallas auto-tiles)
        o3_512_xla = o3_512_pallas = None
        if _sec("o3512"):
            V5 = jax.random.uniform(jax.random.PRNGKey(5), (512, 512, 512),
                                    dtype=dtype)
            Ws5 = [jax.random.uniform(jax.random.PRNGKey(50 + i), (512, R),
                                      dtype=dtype) for i in range(3)]

            def time_o3_512(use_pallas, n=30):
                cur = o3_sweep(V5, list(Ws5), use_pallas=use_pallas)
                _pull(cur[0])
                t0 = time.perf_counter()
                for _ in range(n):
                    cur = o3_sweep(V5, cur, use_pallas=use_pallas)
                _pull(cur[0])
                return max(
                    (time.perf_counter() - t0 - pull_overhead) / n, 1e-9)

            o3_512_xla = _best_of(lambda: time_o3_512(False))
            o3_512_pallas = _best_of(lambda: time_o3_512(True))
            del V5, Ws5  # 512^3 f32 = 0.5 GB HBM

        # Extended suite (order-6 synthetic + Tucker): ~7 extra XLA
        # compiles, which can push a cold-cache run past the driver's
        # timeout — opt-in via PP_BENCH_FULL=1 (results are recorded in
        # results/BENCH_full_manual.json).
        o6_dt = o6_build = o6_pp = o6_msdt = None
        tucker_dt = tucker_pp = None
        tucker_dt_sub = None

        # order-6 synthetic (the reference's strong-scaling family,
        # script_strongscaling.py: dim 6 rank 6; size shrunk to one chip)
        if _sec("dense6"):
            s6, R6 = 24, 6
            V6 = jax.random.uniform(jax.random.PRNGKey(6), (s6,) * 6,
                                    dtype=dtype)
            Ws6 = [jax.random.uniform(jax.random.PRNGKey(60 + i), (s6, R6),
                                      dtype=dtype) for i in range(6)]
            lam6 = jnp.asarray(0.0, dtype=dtype)
            cur6, _ = cp.dt_sweep(V6, list(Ws6), lam6, solver="svd")
            _pull(cur6[0])
            n6 = 30
            t0 = time.perf_counter()
            for _ in range(n6):
                cur6, _ = cp.dt_sweep(V6, cur6, lam6, solver="svd")
            _pull(cur6[0])
            o6_dt = max((time.perf_counter() - t0 - pull_overhead) / n6, 1e-9)

            s6c, p6c, Wsb6 = build_chained(V6, list(Ws6))
            _pull(s6c[0])
            t0 = time.perf_counter()
            for _ in range(nb):
                s6c, p6c, Wsb6 = build_chained(V6, Wsb6)
            _pull(s6c[0])
            o6_build = max(
                (time.perf_counter() - t0 - pull_overhead) / nb, 1e-9)

            W_init6 = [w for w in Ws6]
            dWs6 = [jnp.zeros_like(w) for w in Ws6]
            cur6, dcur6, _ = cp.pp_sweep(s6c, p6c, list(Ws6), W_init6, dWs6,
                                         lam6, 1.0, solver="svd")
            _pull(cur6[0])
            t0 = time.perf_counter()
            for _ in range(n6):
                cur6, dcur6, _ = cp.pp_sweep(s6c, p6c, cur6, W_init6, dcur6,
                                             lam6, 1.0, solver="svd")
            _pull(cur6[0])
            o6_pp = max((time.perf_counter() - t0 - pull_overhead) / n6, 1e-9)

            # MSDT on its NATURAL family: the rotating hold-out is
            # structurally disadvantaged on coil's skew (a tiny hold-out
            # mode leaves a 3.3x|V| first-level intermediate), which is
            # why msdt_sweep_seconds on coil reads 3x DT. On the uniform
            # order-6 tensors the reference actually runs MSDT on
            # (arXiv:2010.12056), every hold-out intermediate is
            # |V|*R/s — measure it there too for a fair per-family view.
            from pairwise_perturbation_tpu.models import (optimizers as
                                                          _ppopt)
            cur6m, _ = _ppopt.msdt_cycle(V6, list(Ws6), lam6,
                                         start_left=5, solver="chol")
            _pull(cur6m[0])
            nm = 10
            t0 = time.perf_counter()
            for _ in range(nm):
                cur6m, _ = _ppopt.msdt_cycle(V6, cur6m, lam6,
                                             start_left=5, solver="chol")
            _pull(cur6m[0])
            # one cycle = order steps = (order-1) sweeps of updates
            o6_msdt = max((time.perf_counter() - t0 - pull_overhead)
                          / (nm * 5), 1e-9)
            del cur6m
            # 24^6 pads ~5x on the minor dim (~4 GB HBM) — free it before
            # the later full-suite sections stack more live tensors
            del V6, cur6, dcur6, s6c, p6c, Wsb6, W_init6, dWs6

            # Tucker on the coil-100 config with the reference's rank vector
            # (3, 10, 10, 70) (test_ALS.cxx:366-372, script_real.py:50-54)
            from pairwise_perturbation_tpu.models import tucker as ppt
            tranks = (3, 10, 10, 70)
            core0, Wst = ppt.hosvd(V, tranks)
            Wst, _ = ppt.tucker_dt_sweep(V, list(Wst), list(Wst), ranks=tranks,
                                         use_sign=True)
            _pull(Wst[0])
            nt = 20
            t0 = time.perf_counter()
            for _ in range(nt):
                Wst, core_t = ppt.tucker_dt_sweep(V, list(Wst), list(Wst),
                                                  ranks=tranks, use_sign=True)
            _pull(Wst[0])
            tucker_dt = max(
                (time.perf_counter() - t0 - pull_overhead) / nt, 1e-9)

            Wss = list(Wst)
            Wss, _ = ppt.tucker_dt_sweep(V, list(Wss), list(Wss),
                                         ranks=tranks, use_sign=True,
                                         subspace_iters=2)
            _pull(Wss[0])
            t0 = time.perf_counter()
            for _ in range(nt):
                Wss, _ = ppt.tucker_dt_sweep(V, list(Wss), list(Wss),
                                             ranks=tranks, use_sign=True,
                                             subspace_iters=2)
            _pull(Wss[0])
            tucker_dt_sub = max(
                (time.perf_counter() - t0 - pull_overhead) / nt, 1e-9)

            st, pt = ppt.tucker_build_caches(V, list(Wst))
            W_initt = [w for w in Wst]
            dWst = [jnp.zeros_like(w) for w in Wst]
            curt, dct, _, _ = ppt.tucker_pp_sweep(st, pt, list(Wst),
                                                  W_initt, dWst,
                                                  ranks=tranks)
            _pull(curt[0])
            t0 = time.perf_counter()
            for _ in range(nt):
                curt, dct, _, _ = ppt.tucker_pp_sweep(st, pt, curt,
                                                      W_initt, dct,
                                                      ranks=tranks)
            _pull(curt[0])
            tucker_pp = max(
                (time.perf_counter() - t0 - pull_overhead) / nt, 1e-9)
            # free the Tucker TTMc caches (~0.5 GB) and iterates before
            # the LR-optimizer benches — their two cached first-level
            # tops (up to ~1.1 GB each on coil) + sweep transients need
            # the headroom on top of everything this suite keeps live
            del st, pt, curt, dct, W_initt, dWst, Wst, Wss, core0

        # PP partial-update sweep (pp=2, als_CP.cxx:852-1073) and the
        # low-rank second-gen optimizers (run pp=2/3) — measured so their
        # cost model is data, not assumption (VERDICT r2 next #6)
        partupdate_sweep = dtlr_step = msdtlr_step = None
        if _sec("pu"):
            import jax.numpy as _jnp
            W_initp = [w for w in Ws]
            dWsp = [_jnp.zeros_like(w) for w in Ws]
            dMs = [_jnp.zeros_like(w) for w in Ws]
            Msp = [_jnp.zeros_like(w) for w in Ws]
            ms_set = _jnp.zeros(len(shape), dtype=bool)
            relp = _jnp.zeros(len(shape), dtype=dtype)
            grads0 = [_jnp.zeros_like(w) for w in Ws]
            upd = max(len(shape) // 2, 1)
            state_pu = (list(Ws), dWsp, dMs, Msp, ms_set, relp, grads0)

            def one_pu(state):
                Wsx, dWx, dMx, Mx, msx, rex, grx = state
                out = cp.pp_partupdate_sweep(
                    single, pair, Wsx, W_initp, dWx, dMx, Mx, msx, rex,
                    grx, lam, 1.0, update_size=upd, solver="svd")
                return out

            state_pu = one_pu(state_pu)
            _pull(state_pu[0][0])
            t0 = time.perf_counter()
            for _ in range(30):
                state_pu = one_pu(state_pu)
            _pull(state_pu[0][0])
            partupdate_sweep = max(
                (time.perf_counter() - t0 - pull_overhead) / 30, 1e-9)
        # DT-LR / MSDT-LR steps (cp_dt_lr_optimizer.cxx:128-232).
        # Own section: their chain programs' scratch reservations only
        # fit when this process loaded almost nothing else (the "lr"
        # part runs with the bare minimum — no dt_sweep, no PP caches)
        if _sec("lr") or _sec("lrdt") or _sec("lrmsdt"):
            from pairwise_perturbation_tpu.models import optimizers as _opt

            def time_opt(make, n_steps=20):
                o = make()
                o.configure(V, [jnp.array(w) for w in Ws], 0.0)
                # Rotating optimizers compile lazily per hold-out
                # position, per cache-refresh path AND (DT-LR) per
                # special_index rotation — a fixed 2-rotation warm left
                # late compiles inside the timed window (round-3
                # lr_timing_note admitted this). Warm until one full
                # signature cycle runs compile-free: a step whose
                # synchronous host time exceeds 0.25 s is a compile
                # strike and resets the quiet counter.
                # Sync EVERY step: each LR step queues a ~GB first-level
                # top, so back-to-back dispatch holds many steps' buffers
                # live at once and OOMs the chip (found the hard way).
                cycle = 2 * len(shape)
                quiet = 0
                for _ in range(16 * cycle):
                    ts = time.perf_counter()
                    o.step()
                    _pull(o.W[0])
                    if time.perf_counter() - ts > 0.25:
                        quiet = 0
                    else:
                        quiet += 1
                    if quiet >= cycle:
                        break
                t0 = time.perf_counter()
                for _ in range(n_steps):
                    o.step()
                    _pull(o.W[0])
                return max(
                    (time.perf_counter() - t0
                     - pull_overhead * n_steps) / n_steps,
                    1e-9)

            # each optimizer in its own part when requested: the
            # compile-free-cycle warmup loads every (position x refresh x
            # fused) signature as a resident executable, and BOTH
            # optimizers' programs no longer fit one process's scratch
            # budget through the relay
            if _sec("lr") or _sec("lrdt"):
                # num_subiteration=100: time the WITHIN-ROTATION steady
                # state. Every special_index rotation changes the
                # (positions,) jit signatures, and through this relay
                # each loaded executable's multi-GB scratch reservation
                # stays resident for the process lifetime — warming all
                # ~24 rotation signatures OOMs the chip. Production pays
                # one plain first-level contraction extra per rotation
                # (every 2*num_subiteration steps), reported separately
                # as the dt_sweep/chain_top cost.
                dtlr_step = time_opt(
                    lambda: _opt.CPDTLROptimizer(len(shape), R, 1, False,
                                                 num_subiteration=100))
            if _sec("lr") or _sec("lrmsdt"):
                msdtlr_step = time_opt(
                    lambda: _opt.CPMSDTLROptimizer(
                        len(shape), R, 1, False, min_holdout_size=8))

        sparse_sweep = sparse_cache_build = None  # measured at suite end

        # time-lapse config (order-4 33x1344x1024x9, canonicalized to
        # (33, 9, 1344, 1024) for TPU tiling — script_real.py:46-48) and
        # bf16 order-3 Pallas MTTKRP, both first-class in the full suite
        tl_dt = tl_dt_bf16 = tl_build = tl_tucker_dt = None
        o3_bf16_pallas = o3_bf16_xla = None
        if _sec("tl"):
            tl_shape = (33, 9, 1344, 1024)
            Vt = jax.random.uniform(jax.random.PRNGKey(7), tl_shape,
                                    dtype=dtype) * 255.0
            Wst_ = [jax.random.uniform(jax.random.PRNGKey(70 + i), (s, R),
                                       dtype=dtype)
                    for i, s in enumerate(tl_shape)]
            lamt = jnp.asarray(0.0, dtype=dtype)
            ntl = 30

            def time_sweep(Vx, Ws0, n=ntl):
                cur, _ = cp.dt_sweep(Vx, list(Ws0), lamt, solver="svd")
                _pull(cur[0])
                t0 = time.perf_counter()
                for _ in range(n):
                    cur, _ = cp.dt_sweep(Vx, cur, lamt, solver="svd")
                _pull(cur[0])
                return max(
                    (time.perf_counter() - t0 - pull_overhead) / n, 1e-9)

            tl_dt = _best_of(lambda: time_sweep(Vt, Wst_))
            tl_dt_bf16 = _best_of(
                lambda: time_sweep(Vt.astype(jnp.bfloat16), Wst_))

            stl, ptl, Wsb_t = build_chained(Vt, list(Wst_))
            _pull(stl[0])
            t0 = time.perf_counter()
            for _ in range(nb):
                stl, ptl, Wsb_t = build_chained(Vt, Wsb_t)
            _pull(stl[0])
            tl_build = max(
                (time.perf_counter() - t0 - pull_overhead) / nb, 1e-9)

            from pairwise_perturbation_tpu.models import tucker as ppt2
            tl_ranks = (10, 5, 100, 100)  # (10,100,100,5) canonicalized
            core_t, Wtt = ppt2.hosvd(Vt, tl_ranks)
            Wtt, _ = ppt2.tucker_dt_sweep(Vt, list(Wtt), list(Wtt),
                                          ranks=tl_ranks, use_sign=True,
                                          subspace_iters=-1)
            _pull(Wtt[0])
            t0 = time.perf_counter()
            for _ in range(10):
                Wtt, _ = ppt2.tucker_dt_sweep(Vt, list(Wtt), list(Wtt),
                                              ranks=tl_ranks, use_sign=True,
                                              subspace_iters=-1)
            _pull(Wtt[0])
            tl_tucker_dt = max(
                (time.perf_counter() - t0 - pull_overhead) / 10, 1e-9)
            del Vt, stl, ptl, Wsb_t

            # bf16 order-3 MTTKRP sweep (Pallas native-bf16 blocks halve
            # the kernel's DMA; NOTES_ROUND1 candidate 9)
            V3b = V3.astype(jnp.bfloat16)
            o3_bf16_xla = _best_of(
                lambda: time_o3_generic(V3b, Ws3, False))
            o3_bf16_pallas = _best_of(
                lambda: time_o3_generic(V3b, Ws3, True))
            del V3b

            # sparse CP engine (-issparse 1): COO gather + segment-sum
            # MTTKRP (ops/sparse.py; reference threads -issparse into
            # CTF, test_ALS.cxx:126-131) — order-4 200^4, density 1e-3.
            # Runs last in the full suite: HBM headroom (~60 MB live).
            from pairwise_perturbation_tpu.ops import sparse as _sp
            from pairwise_perturbation_tpu.models import sparse_cp as _spm
            sshape, snnz = (200, 200, 200, 200), 1_600_000
            kidx = jax.random.PRNGKey(11)
            sidx = jnp.stack(
                [jax.random.randint(jax.random.fold_in(kidx, i), (snnz,),
                                    0, s) for i, s in enumerate(sshape)],
                axis=1).astype(jnp.int32)
            svals = jax.random.uniform(jax.random.PRNGKey(12), (snnz,),
                                       dtype=dtype)
            st_sp = _sp.SparseTensor(sidx, svals, sshape)
            Wsp = [jax.random.uniform(jax.random.PRNGKey(80 + i), (s, R),
                                      dtype=dtype)
                   for i, s in enumerate(sshape)]
            lam_sp = jnp.asarray(0.0, dtype=dtype)
            sweep_sp = jax.jit(
                lambda st, Ws: _spm.sparse_simple_sweep(st, Ws, lam_sp,
                                                        solver="svd"))
            cur_sp = sweep_sp(st_sp, list(Wsp))
            _pull(cur_sp[0])
            t0 = time.perf_counter()
            for _ in range(20):
                cur_sp = sweep_sp(st_sp, cur_sp)
            _pull(cur_sp[0])
            sparse_sweep = max(
                (time.perf_counter() - t0 - pull_overhead) / 20, 1e-9)

            sb_sp = _spm.sparse_pp_build_caches(st_sp, list(Wsp))
            _pull(sb_sp[0][0])
            t0 = time.perf_counter()
            for _ in range(10):
                sb_sp = _spm.sparse_pp_build_caches(st_sp, cur_sp)
            _pull(sb_sp[0][0])
            sparse_cache_build = max(
                (time.perf_counter() - t0 - pull_overhead) / 10, 1e-9)
            del st_sp, sidx, svals, Wsp, cur_sp, sb_sp

        # mixed-precision mode: V stored bf16, factors/solves f32
        # (contract._einsum casts contraction operands to bf16 with f32
        # accumulation). MTTKRP rel err ~1.5e-3 — far below the
        # reference benchmarks' restol of 0.05-0.1 (script_real.py:42-58).
        dt_sweep_bf16 = pp_build_bf16 = None
        V16 = V.astype(jnp.bfloat16) if head_on else None
        if head_on:
            cur16, _ = cp.dt_sweep(V16, list(Ws), lam, solver="svd")
            _pull(cur16[0])
        st16 = {"cur": cur16 if head_on else None}

        def m_dt16():
            cur = st16["cur"]
            t0 = time.perf_counter()
            for _ in range(n):
                cur, _ = cp.dt_sweep(V16, cur, lam, solver="svd")
            _pull(cur[0])
            st16["cur"] = cur
            return max((time.perf_counter() - t0 - pull_overhead) / n, 1e-9)

        if head_on:
            dt_sweep_bf16 = _best_of(m_dt16)

            single16, pair16, Wsb16 = build_chained(V16, list(Ws))
            _pull(single16[0])
            stb["single"], stb["pair"], stb["Wsb"] = (single16, pair16,
                                                      Wsb16)
            pp_build_bf16 = _best_of(lambda: m_build(V16))

        nnz = 1
        for s in shape:
            nnz *= s
        flops_per_sweep = 2 * 2 * nnz * R  # two first-level chains dominate
        extra = {
            "device": str(jax.devices()[0]),
            "planner_root_split": split,
            "host_pull_overhead_seconds": round(pull_overhead, 6),
            "bf16v_note": "V stored bf16, factors/solves f32; MTTKRP rel "
                          "err ~1.5e-3 (<< benchmark restol 0.05)",
            "config": "coil-100-shaped random, order-4 3x128x128x7200, rank 10, f32",
        }
        if dt_sweep_time:
            extra["dt_sweep_seconds"] = round(dt_sweep_time, 6)
            extra["dt_tflops_effective"] = round(
                flops_per_sweep / dt_sweep_time / 1e12, 3)
        # head sub-bench metrics are None in lean PP_BENCH_SECTIONS parts
        extra.update({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in {
            "dt_sweep_seconds_planner_split": dt_sweep_planner,
            "pp_sweep_seconds": pp_sweep_time,
            "pp_cache_build_seconds": pp_build_time,
            "order3_200_sweep_seconds_xla": t_o3_xla,
            "order3_200_sweep_seconds_pallas": t_o3_pallas,
            "dt_sweep_seconds_bf16v": dt_sweep_bf16,
            "pp_cache_build_seconds_bf16v": pp_build_bf16,
            "msdt_sweep_seconds": msdt_sweep_time,
            "msdt_sweep_seconds_min_holdout8": msdt_skip_sweep_time,
            # steady-state PP cost per sweep amortizing one cache build
            # over the 15-sweep cap (als_CP.cxx:667)
            "pp_effective_sweep_seconds": (
                pp_build_time / 15 + pp_sweep_time
                if pp_build_time and pp_sweep_time else None),
            "pp_effective_sweep_seconds_bf16v": (
                pp_build_bf16 / 15 + pp_sweep_time
                if pp_build_bf16 and pp_sweep_time else None),
        }.items() if v is not None})
        if full:
            # sections skipped via PP_BENCH_SECTIONS leave their metrics
            # as None — omit those keys (run_full_bench.sh merges parts)
            extra.update({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in {
                "timelapse_dt_sweep_seconds": tl_dt,
                "timelapse_dt_sweep_seconds_bf16v": tl_dt_bf16,
                "timelapse_pp_cache_build_seconds": tl_build,
                "timelapse_tucker_dt_sweep_seconds_auto": tl_tucker_dt,
                "order3_200_sweep_seconds_xla_bf16v": o3_bf16_xla,
                "order3_200_sweep_seconds_pallas_bf16v": o3_bf16_pallas,
                "order3_512_sweep_seconds_xla": o3_512_xla,
                "order3_512_sweep_seconds_pallas": o3_512_pallas,
                "order6_s24_dt_sweep_seconds": o6_dt,
                "order6_s24_msdt_sweep_seconds": o6_msdt,
                "order6_s24_pp_cache_build_seconds": o6_build,
                "order6_s24_pp_sweep_seconds": o6_pp,
                "tucker_coil_dt_sweep_seconds": tucker_dt,
                "tucker_coil_dt_sweep_seconds_subspace2": tucker_dt_sub,
                "tucker_coil_pp_sweep_seconds": tucker_pp,
                "pp_partupdate_sweep_seconds": partupdate_sweep,
                "cpdtlr_step_seconds": dtlr_step,
                "cpmsdtlr_step_seconds": msdtlr_step,
                "lr_timing_note": (
                    "steady-state: warmed until a full signature cycle "
                    "(all hold-out positions x refresh paths x "
                    "special-index rotations) ran compile-free; tall "
                    "update SVDs via Gram-eigh; cache refresh fused "
                    "into the LR chain step"
                ) if (dtlr_step or msdtlr_step) else None,
                "sparse200_4_nnz1.6M_sweep_seconds": sparse_sweep,
                "sparse200_4_nnz1.6M_pp_cache_build_seconds":
                    sparse_cache_build,
                # measured context from the dedicated sparse study
                # (scripts/bench_sparse_perf.py; separate processes for
                # the 6.4 GB dense comparison) — merged by key so the
                # sparse section carries its vs_dense / roofline story
                **_sparse_perf_fields(),
            }.items() if v is not None})
        value = sweeps_per_sec
    except Exception as e:  # pragma: no cover
        import traceback
        traceback.print_exc(file=sys.stderr)  # JSON contract: stdout only
        print(json.dumps({"metric": "cp_dt_sweeps_per_sec_coil100",
                          "value": 0.0, "unit": "sweeps/s",
                          "vs_baseline": 0.0, "error": repr(e)[:400]}))
        return 1

    # PP-vs-DT end-to-end time-to-equal-fitness wins, recorded by
    # scripts/bench_pp_e2e.py on this chip (results/PP_WINS.md)
    try:
        e2e = json.load(open(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "results",
            "pp_e2e.json")))
        # unsuffixed entries = per-config best over the restol grid
        # (the _rtX grid points live in results/pp_e2e.json)
        extra["pp_e2e_speedup"] = {
            k: round(v["speedup"], 3) for k, v in e2e.items()
            if v.get("speedup") and "_rt" not in k}
    except Exception:
        pass

    base_sps, base_src, measured_sps, measured_src = _measured_baseline()
    out = {
        "metric": "cp_dt_sweeps_per_sec_coil100",
        "value": round(value, 4),
        "unit": "sweeps/s",
        "vs_baseline": round(value / base_sps, 4),
        "baseline_sweeps_per_sec": round(base_sps, 6),
        "baseline_source": base_src,
        **extra,
    }
    if measured_sps:
        out["vs_measured_host"] = round(value / measured_sps, 4)
        out["measured_host_source"] = measured_src
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
