"""Measured single-process CPU baseline for the real-data benchmarks.

A timed, pure-numpy (f64, BLAS-threaded) transcription of the reference
ALS semantics — the independently-written oracle of
tests/test_reference_parity.py, promoted to a runnable baseline
(VERDICT round 1: "the numpy oracle ... is a ready-made timeable
baseline"). It implements:

- DT ALS sweeps: sequential Gauss-Seidel per-mode exact MTTKRP + SVD
  pseudo-inverse solve + geometric-mean normalization (alsCP_DT,
  als_CP.cxx:127-320; the binary-tree cache gives the same iterates);
  the MTTKRP reuses the dimension-tree FLOP structure (two first-level
  chains per sweep) so the baseline is NOT handicapped by per-mode
  full recontraction.
- PP: cache build over all pairs/singles + corrected sweeps with
  restart tolerance and the 15-sweep cache cap (alsCP_PP_sub,
  als_CP.cxx:621-833).
- Tucker HOOI/DT sweeps with Gram + truncated eigh factor extraction
  and core update (alsTucker_DT, als_Tucker.cxx:240-424).

Outputs one JSON with per-config {sweep_seconds, time_to_fitness,
fitness} plus the reference CSV schema per run, into results/.

Usage:
  python scripts/baseline_cpu.py --data-dir /root/data --out results/baseline_cpu.json \
      [--configs coil_cp,coil_tucker,timelapse_cp,timelapse_tucker] \
      [--maxiter 250] [--target-fitness-file results/real_targets.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pairwise_perturbation_tpu.utils import io as ppio  # noqa: E402
from pairwise_perturbation_tpu.utils.metrics import PlotFile  # noqa: E402


# ---------------------------------------------------------------------------
# numpy CP ALS (reference semantics)
# ---------------------------------------------------------------------------


def np_mttkrp_chain(V, Ws, mode, priority):
    """Exact MTTKRP via chain contraction in largest-first order (the same
    FLOP structure as the framework; the reference's KhatriRao_contract is
    the same chain in ascending order)."""
    order = V.ndim
    letters = "abcdefgh"[:order]
    T = V
    rem = list(range(order))
    has_rank = False
    for m in [m for m in priority if m != mode]:
        pos = rem.index(m)
        k = len(rem)
        t_spec = letters[:k] + ("z" if has_rank else "")
        f_spec = letters[pos] + "z"
        out = letters[:pos] + letters[pos + 1:k] + "z"
        T = np.einsum(f"{t_spec},{f_spec}->{out}", T, Ws[m], optimize=True)
        rem.pop(pos)
        has_rank = True
    return T


def np_S(Ws, skip, lam=0.0):
    S = None
    for j, W in enumerate(Ws):
        if j == skip:
            continue
        G = W.T @ W
        S = G if S is None else S * G
    if lam:
        S = S + lam * np.eye(S.shape[0])
    return S


def np_normalize(Ws):
    norms = [np.linalg.norm(W) for W in Ws]
    target = np.prod(norms) ** (1.0 / len(Ws))
    return [W * (target / n) for W, n in zip(Ws, norms)]


def _binary_parent_map(order):
    parent = {}

    def rec(lo, hi):
        if lo == hi:
            return
        mid = (lo + hi) // 2
        parent[(lo, mid)] = (lo, hi)
        parent[(mid + 1, hi)] = (lo, hi)
        rec(lo, mid)
        rec(mid + 1, hi)
    rec(0, order - 1)
    return parent


class NpBinaryTreeSweep:
    """numpy mirror of the framework's lazy binary dimension tree — the
    baseline gets the SAME per-sweep FLOP structure (two first-level
    chains per sweep, prefix reuse) so the comparison is algorithmically
    fair (mttkrp_map_DT, common.cxx:20-133)."""

    def __init__(self, V, Ws, priority):
        self.V, self.Ws, self.priority = V, list(Ws), priority
        self.order = V.ndim
        self.parent = _binary_parent_map(self.order)
        self.memo = {}
        self.letters = "abcdefgh"[:self.order]

    def _contract_one(self, T, rem, has_rank, m):
        pos = rem.index(m)
        k = len(rem)
        t_spec = self.letters[:k] + ("z" if has_rank else "")
        out = self.letters[:pos] + self.letters[pos + 1:k] + "z"
        T2 = np.einsum(f"{t_spec},{self.letters[pos]}z->{out}", T,
                       self.Ws[m], optimize=True)
        return T2, rem[:pos] + rem[pos + 1:]

    def node(self, lo, hi):
        key = (lo, hi)
        if key in self.memo:
            return self.memo[key]
        plo, phi = self.parent[key]
        if (plo, phi) == (0, self.order - 1):
            T, rem, has_rank = self.V, list(range(self.order)), False
        else:
            T = self.node(plo, phi)
            rem, has_rank = list(range(plo, phi + 1)), True
        to_contract = [m for m in self.priority
                       if plo <= m <= phi and not lo <= m <= hi]
        for m in to_contract:
            T, rem = self._contract_one(T, rem, has_rank, m)
            has_rank = True
        self.memo[key] = T
        return T

    def mttkrp(self, i):
        return self.node(i, i)


def np_dt_sweep(V, Ws, priority, lam=0.0):
    sweep = NpBinaryTreeSweep(V, Ws, priority)
    grads = [None] * V.ndim
    for i in range(V.ndim):
        M = sweep.mttkrp(i)
        S = np_S(sweep.Ws, i, lam)
        grads[i] = -M + sweep.Ws[i] @ S
        sweep.Ws[i] = M @ np.linalg.pinv(S)
    return np_normalize(sweep.Ws), grads


def np_build_pp_caches(V, Ws, priority):
    order = V.ndim
    letters = "abcdefgh"[:order]
    memo = {(): (V, tuple(range(order)), False)}

    def get(key):
        if key not in memo:
            T, rem, has_rank = get(key[:-1])
            m = key[-1]
            pos = rem.index(m)
            k = len(rem)
            t_spec = letters[:k] + ("z" if has_rank else "")
            out = letters[:pos] + letters[pos + 1:k] + "z"
            T2 = np.einsum(f"{t_spec},{letters[pos]}z->{out}", T, Ws[m],
                           optimize=True)
            memo[key] = (T2, rem[:pos] + rem[pos + 1:], True)
        return memo[key]

    def keyfor(keep):
        return tuple(m for m in priority if m not in keep)

    pair = {(i, j): get(keyfor({i, j}))[0]
            for i in range(order) for j in range(i + 1, order)}
    single = {i: get(keyfor({i}))[0] for i in range(order)}
    return single, pair


def np_pp_sweep(single, pair, Ws, W_init, dWs, lam=0.0, ratio=1.0):
    order = len(Ws)
    Ws = [W.copy() for W in Ws]
    dWs = [d.copy() for d in dWs]
    grads = [None] * order
    for i in range(order):
        M = single[i].copy()
        for j in range(order):
            if j == i:
                continue
            if j < i:
                M += np.einsum("abz,az->bz", pair[(j, i)], dWs[j],
                               optimize=True)
            else:
                M += np.einsum("abz,bz->az", pair[(i, j)], dWs[j],
                               optimize=True)
        S = np_S(Ws, i, lam)
        grads[i] = -M + Ws[i] @ S
        W_solved = M @ np.linalg.pinv(S)
        dWs[i] = ratio * (W_solved - W_init[i])
        Ws[i] = W_init[i] + dWs[i]
    return np_normalize(Ws), dWs, grads


def np_cp_fitness(V_norm_sq, V, Ws, priority):
    M_last = np_mttkrp_chain(V, Ws, len(Ws) - 1, priority)
    inner = float(np.sum(M_last * Ws[-1]))
    S_all = np_S(Ws, -1)
    return float(np.sqrt(max(V_norm_sq - 2 * inner + np.sum(S_all), 0.0)))


def run_cp(V, R, pp, maxiter, restol, plot, target=None, timelimit=1e9,
           seed=0, resprint=5):
    """Returns dict with trajectory + time_to_target. ``pp``: 0 DT, 1 PP."""
    rng = np.random.default_rng(seed)
    priority = tuple(sorted(range(V.ndim), key=lambda m: (-V.shape[m], m)))
    Ws = [rng.random((s, R)) for s in V.shape]
    V_norm_sq = float(np.vdot(V, V))
    t_work = 0.0
    time_to_target = None
    hist = []
    it = 0
    phase = "dt"
    W_prev = [np.zeros_like(W) for W in Ws]
    dWs = [np.zeros_like(W) for W in Ws]
    W_init = single = pair = None
    pp_start = 0
    fit = None
    while it <= maxiter:
        if it % resprint == 0 or it == maxiter:
            # diagnostics excluded from t_work, like the reference
            # (als_CP.cxx:480-482)
            fit = np_cp_fitness(V_norm_sq, V, Ws, priority)
            gn = float(np.sqrt(sum(np.vdot(g, g).real for g in
                                   ([np.zeros(1)] if it == 0 else grads))))
            hist.append(dict(iter=it, diffV=fit, dtime=t_work,
                             pp=int(phase == "pp")))
            if plot:
                plot.row(V.shape[0], it, gn if it else float("inf"), 0.0,
                         int(phase == "pp"), fit, t_work)
            if target is not None and time_to_target is None \
                    and fit <= target:
                time_to_target = t_work
        if t_work > timelimit:
            break
        t0 = time.perf_counter()
        if pp == 0 or phase == "dt":
            Ws_new, grads = np_dt_sweep(V, Ws, priority)
            dWs = [a - b for a, b in zip(Ws_new, W_prev)]
            W_prev = [w for w in Ws_new]
            Ws = Ws_new
            if pp == 1:
                ratios = [np.linalg.norm(d) / np.linalg.norm(w)
                          for d, w in zip(dWs, Ws)]
                if all(r < restol for r in ratios):
                    phase = "pp"
                    W_init = single = None
        else:
            if W_init is None or (it - pp_start) % 15 == 0:
                W_init = [w.copy() for w in Ws]
                dWs = [np.zeros_like(w) for w in Ws]
                single, pair = np_build_pp_caches(V, Ws, priority)
                pp_start = it
            Ws, dWs, grads = np_pp_sweep(single, pair, Ws, W_init, dWs)
            ratios = [np.linalg.norm(d) / np.linalg.norm(w)
                      for d, w in zip(dWs, Ws)]
            if any(r > restol for r in ratios):
                phase = "dt"
                W_prev = [w for w in Ws]
        t_work += time.perf_counter() - t0
        it += 1
    return dict(hist=hist, final_fitness=hist[-1]["diffV"],
                total_work_seconds=t_work, iters=it,
                sweep_seconds=t_work / max(it, 1),
                time_to_target=time_to_target)


# ---------------------------------------------------------------------------
# numpy Tucker (HOOI with Gram-eigh extraction)
# ---------------------------------------------------------------------------


def np_ttmc(V, Ws, skip):
    order = V.ndim
    letters = "abcdefgh"[:order]
    ranks = "mnopqrst"
    terms, ops, out = [letters], [V], list(letters)
    for j in range(order):
        if j == skip:
            continue
        terms.append(letters[j] + ranks[j])
        ops.append(Ws[j])
        out[j] = ranks[j]
    return np.einsum(",".join(terms) + "->" + "".join(out), *ops,
                     optimize=True)


def np_factor_from_Y(Y, i, r):
    s_i = Y.shape[i]
    m = Y.size // s_i
    if r <= m < s_i:
        perm = (i,) + tuple(ax for ax in range(Y.ndim) if ax != i)
        A = np.transpose(Y, perm).reshape(s_i, m)
        G = A.T @ A
        lam, Q = np.linalg.eigh(G)
        W = Q[:, ::-1][:, :r]
        lamr = lam[::-1][:r]
        inv = np.where(lamr > 1e-12 * max(lamr[0], 1e-30),
                       1.0 / np.sqrt(np.maximum(lamr, 1e-30)), 0.0)
        U = (A @ W) * inv[None, :]
    else:
        perm = (i,) + tuple(ax for ax in range(Y.ndim) if ax != i)
        A = np.transpose(Y, perm).reshape(s_i, m)
        G = A @ A.T
        lam, Q = np.linalg.eigh(G)
        U = Q[:, ::-1][:, :r]
    return U


class NpTuckerTree:
    """numpy mirror of the Tucker binary TTMc tree (ttmc_map_DT,
    als_Tucker.cxx:178-230): node (lo, hi) = V with every mode outside
    [lo, hi] contracted with its factor, axis positions preserved."""

    def __init__(self, V, Ws, priority):
        self.V, self.Ws, self.priority = V, list(Ws), priority
        self.order = V.ndim
        self.parent = _binary_parent_map(self.order)
        self.memo = {}

    def _contract_one(self, T, m):
        letters = "abcdefgh"[:T.ndim]
        spec = f"{letters},{letters[m]}z->" \
               f"{letters[:m]}z{letters[m + 1:]}"
        return np.einsum(spec, T, self.Ws[m], optimize=True)

    def node(self, lo, hi):
        key = (lo, hi)
        if key in self.memo:
            return self.memo[key]
        plo, phi = self.parent[key]
        T = self.V if (plo, phi) == (0, self.order - 1) \
            else self.node(plo, phi)
        for m in [m for m in self.priority
                  if plo <= m <= phi and not lo <= m <= hi]:
            T = self._contract_one(T, m)
        self.memo[key] = T
        return T


def run_tucker(V, ranks, maxiter, plot, target=None, timelimit=1e9):
    V_norm_sq = float(np.vdot(V, V))
    priority = tuple(sorted(range(V.ndim), key=lambda m: (-V.shape[m], m)))
    # HOSVD init
    t_work = 0.0
    t0 = time.perf_counter()
    Ws = [np_factor_from_Y(V, i, ranks[i]) for i in range(V.ndim)]
    t_work += time.perf_counter() - t0
    time_to_target = None
    hist = []
    it = 0
    resprint = 5
    while it <= maxiter:
        if it % resprint == 0 or it == maxiter:
            core = np_ttmc(V, Ws, -1)
            cn = np.linalg.norm(core)
            fit = float(np.sqrt(max(V_norm_sq - cn * cn, 0.0)))
            hist.append(dict(iter=it, diffV=fit, dtime=t_work))
            if plot:
                plot.row(V.shape[0], it, 0.0, 0.0, 0, fit, t_work)
            if target is not None and time_to_target is None \
                    and fit <= target:
                time_to_target = t_work
        if t_work > timelimit:
            break
        t0 = time.perf_counter()
        tree = NpTuckerTree(V, Ws, priority)
        for i in range(V.ndim):
            Y = tree.node(i, i)
            tree.Ws[i] = np_factor_from_Y(Y, i, ranks[i])
        Ws = tree.Ws
        t_work += time.perf_counter() - t0
        it += 1
    return dict(hist=hist, final_fitness=hist[-1]["diffV"],
                total_work_seconds=t_work, iters=it,
                sweep_seconds=t_work / max(it, 1),
                time_to_target=time_to_target)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/root/data")
    ap.add_argument("--out", default="results/baseline_cpu.json")
    ap.add_argument("--configs",
                    default="coil_cp_dt,coil_cp_pp,coil_tucker,"
                            "timelapse_cp_dt,timelapse_tucker")
    ap.add_argument("--maxiter", type=int, default=250)
    ap.add_argument("--timelimit", type=float, default=3600.0)
    ap.add_argument("--restol", type=float, default=0.1)
    ap.add_argument("--targets", default="",
                    help="JSON file {config: target_fitness} for "
                         "time-to-fitness stops")
    args = ap.parse_args()

    targets = {}
    if args.targets and os.path.exists(args.targets):
        targets = json.load(open(args.targets))

    results = {"note": "single-process numpy f64 baseline "
                       "(reference ALS semantics), "
                       f"{os.cpu_count()} CPU cores",
               "configs": {}}
    want = set(args.configs.split(","))
    os.makedirs("results", exist_ok=True)

    datasets = {}

    def get_data(name):
        if name not in datasets:
            if name == "coil":
                datasets[name] = ppio.load_coil100(
                    os.path.join(args.data_dir, "coil-100.bin"),
                    out_dtype=np.float64)
            else:
                datasets[name] = ppio.load_time_lapse(
                    os.path.join(args.data_dir, "time-lapse.bin"),
                    out_dtype=np.float64)
        return datasets[name]

    jobs = {
        "coil_cp_dt": ("coil", "cp", 0, 10),
        "coil_cp_pp": ("coil", "cp", 1, 10),
        "coil_tucker": ("coil", "tucker", 0, (3, 10, 10, 70)),
        "timelapse_cp_dt": ("timelapse", "cp", 0, 10),
        "timelapse_cp_pp": ("timelapse", "cp", 1, 10),
        "timelapse_tucker": ("timelapse", "tucker", 0, (10, 100, 100, 5)),
    }
    for cfg_name, (dname, model, pp, rank) in jobs.items():
        if cfg_name not in want:
            continue
        V = get_data(dname)
        print(f"[{cfg_name}] V shape {V.shape} "
              f"norm {np.linalg.norm(V):.4e}", flush=True)
        csv_path = f"results/baseline_{cfg_name}.csv"
        plot = PlotFile(csv_path, PlotFile.CP_HEADER, echo=False)
        t0 = time.perf_counter()
        if model == "cp":
            r = run_cp(V, rank, pp, args.maxiter, args.restol, plot,
                       target=targets.get(cfg_name),
                       timelimit=args.timelimit)
        else:
            r = run_tucker(V, rank, args.maxiter, plot,
                           target=targets.get(cfg_name),
                           timelimit=args.timelimit)
        plot.close()
        r.pop("hist")
        r["wall_seconds"] = time.perf_counter() - t0
        r["csv"] = csv_path
        results["configs"][cfg_name] = r
        print(f"[{cfg_name}] sweep {r['sweep_seconds']:.3f}s "
              f"fitness {r['final_fitness']:.6e} "
              f"({r['iters']} iters, work {r['total_work_seconds']:.1f}s)",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
