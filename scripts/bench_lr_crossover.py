"""DT-LR / MSDT-LR crossover sweep vs DT (VERDICT r4 weak #1 / next #2).

The low-rank optimizer line (arXiv:2010.12056;
cp_dt_lr_optimizer.cxx:128-158) claims speedup from replacing the
first-level contraction's R-wide GEMM with a rank-k update
(O(s^N k) FLOPs instead of O(s^N R)). On an HBM-bound TPU the refresh
still READS ALL OF V and read-modify-writes the (s, s, R) cache, so the
FLOP saving only matters once the GEMM is MXU-bound — this sweep
measures where (or whether) that crossover exists.

Grid: order-3 (s, s, s), R in {10, 50, 100, 200} x update_rank in
{1, R/8, R/4}; per (R, k) we time the within-rotation steady-state
DT-LR step (frozen special_index, num_subiteration=100 — the rotating
signatures cannot all stay resident through the relay, see bench.py)
and the DT optimizer step on the same problem, both as sweep-equivalent
time (a step advances 0.5 sweeps).

One (R, k) config per process (executables stay resident server-side):
    python scripts/bench_lr_crossover.py <R> <k>      # one config
    python scripts/bench_lr_crossover.py <R> dt       # DT baseline at R
Results merge into results/lr_crossover.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

S = 200          # order-3 (S, S, S): first-level contraction dominates
ORDER = 3
OUT = "results/lr_crossover.json"


def _pull(x):
    jax.block_until_ready(x)


def _steady_step_time(o, order, n_steps=20):
    """Warm until a full signature cycle runs compile-free (see
    bench.py's time_opt), then time n_steps synchronously."""
    cycle = 2 * order
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
    return max((time.perf_counter() - t0) / n_steps, 1e-9)


def write_md():
    data = json.load(open(OUT))
    lines = [
        "# DT-LR vs DT: the low-rank crossover sweep (one TPU v5e chip)",
        "",
        "Order-3 200^3 f32, within-rotation steady state "
        "(num_subiteration=100; production adds one plain first-level "
        "per special_index rotation). Sweep-equivalent time = 2 x step "
        "(a step advances 0.5 sweeps). Reference claim: "
        "cp_dt_lr_optimizer.cxx:128-158 / arXiv:2010.12056 — the "
        "rank-k refresh costs O(s^N k) FLOPs instead of O(s^N R).", "",
        "| rank R | DT ms/sweep | k=1 | k=R/8 | k=R/4 | best LR vs DT |",
        "|---|---|---|---|---|---|",
    ]
    for R in (10, 50, 100, 200):
        dt = data.get(f"dt_R{R}", {}).get("sweep_equiv_ms")
        if dt is None:
            continue
        ks = sorted({1, max(R // 8, 1), max(R // 4, 1)})
        cells, best = [], None
        for k in ks:
            e = data.get(f"dtlr_R{R}_k{k}")
            v = e and e["sweep_equiv_ms"]
            cells.append(f"{v:.2f}" if v else "-")
            if v and (best is None or v < best):
                best = v
        while len(cells) < 3:
            cells.append("-")
        ratio = f"{dt / best:.2f}x" if best else "-"
        lines.append(f"| {R} | {dt:.2f} | " + " | ".join(cells)
                     + f" | {ratio} |")
    lines += [
        "",
        "**Measured verdict: the crossover does not exist on this "
        "hardware.** The best LR configuration (R=200, k=25) reaches "
        "PARITY with DT; every other grid point is slower, some by 3x. "
        "This is exactly what the traffic model predicts "
        "(docs/DESIGN.md, round-5 section): the rank-k refresh still "
        "reads ALL of V and read-modify-writes the (s, s, R) cached "
        "first-level top, so its per-step HBM traffic is >= DT's "
        "first-level for every (R, k); the O(s^N (R - k)) FLOP saving "
        "the paper's CPU speedup rides on only matters once the R-wide "
        "GEMM is MXU-bound (R > ~240 in f32 on v5e), and by then the "
        "cache read-modify-write (which also scales with R) has eaten "
        "the margin. The LR optimizer line is implemented, tested and "
        "honest (run -pp 2/3); it is a CPU-era optimization whose "
        "premise — FLOP-bound first-level contractions — does not "
        "transfer to a machine that runs them at the HBM roofline.",
    ]
    with open("results/LR_CROSSOVER.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote results/LR_CROSSOVER.md")


def main():
    if sys.argv[1] == "md":
        write_md()
        return
    R = int(sys.argv[1])
    karg = sys.argv[2]
    from pairwise_perturbation_tpu.models import optimizers as opt

    shape = (S,) * ORDER
    dtype = jnp.float32
    V = jax.random.uniform(jax.random.PRNGKey(5), shape, dtype=dtype)
    Ws = [jax.random.uniform(jax.random.PRNGKey(50 + i), (s, R),
                             dtype=dtype) for i, s in enumerate(shape)]

    entry = dict(shape=list(shape), rank=R)
    if karg == "dt":
        o = opt.CPDTOptimizer(ORDER, R)
        o.configure(V, [jnp.array(w) for w in Ws], 0.0)
        t = _steady_step_time(o, ORDER)
        key = f"dt_R{R}"
        entry.update(step_seconds=t, sweep_equiv_ms=2 * t * 1e3,
                     optimizer="CPDT")
        print(f"DT R={R}: step {t*1e3:.2f} ms "
              f"-> {2*t*1e3:.2f} ms/sweep", flush=True)
    else:
        k = int(karg)
        o = opt.CPDTLROptimizer(ORDER, R, k, False, num_subiteration=100)
        o.configure(V, [jnp.array(w) for w in Ws], 0.0)
        t = _steady_step_time(o, ORDER)
        key = f"dtlr_R{R}_k{k}"
        entry.update(step_seconds=t, sweep_equiv_ms=2 * t * 1e3,
                     update_rank=k, optimizer="CPDTLR",
                     note="within-rotation steady state "
                          "(num_subiteration=100); production adds one "
                          "plain first-level per special_index rotation")
        print(f"DT-LR R={R} k={k}: step {t*1e3:.2f} ms "
              f"-> {2*t*1e3:.2f} ms/sweep-equiv", flush=True)

    data = {}
    if os.path.exists(OUT):
        data = json.load(open(OUT))
    data[key] = entry
    os.makedirs("results", exist_ok=True)
    json.dump(data, open(OUT, "w"), indent=1, sort_keys=True)
    print(f"wrote {key} -> {OUT}")


if __name__ == "__main__":
    main()
